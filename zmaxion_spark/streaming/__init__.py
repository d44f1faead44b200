"""Structured Streaming runtime — the zmaxion core (SURVEY.md §2.9).

The reference declares a "Stream processing framework with ECS"
(/root/reference/README.md:2); this package is its Spark-native
re-expression: topics are unbounded tables (file/kafka/rate sources),
the ECS world tick is the micro-batch, per-entity component state is
the state store (applyInPandasWithState), and systems are the
transformations between source and sink.
"""

from zmaxion_spark.streaming.pipeline import Pipeline, run_available_now  # noqa: F401
from zmaxion_spark.streaming.sources import stream_events  # noqa: F401
