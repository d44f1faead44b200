"""Query registry package — importing this populates REGISTRY."""

from zmaxion_spark.queries.registry import REGISTRY, Query, covered_operators, query  # noqa: F401

# Import all query modules for their registration side effects.
from zmaxion_spark.queries import advanced, llm, relational, scalar  # noqa: F401,E402
