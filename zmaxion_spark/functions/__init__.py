"""Reusable column-level function families (SURVEY.md §2.8, §2.11).

Everything here returns Catalyst ``Column`` expressions — JVM-side,
whole-stage-codegen-friendly, zero Python in the hot path. These are
the building blocks the graded queries in ``zmaxion_spark.queries``
compose.
"""

from zmaxion_spark.functions import dedup, multimodal, similarity, text  # noqa: F401
