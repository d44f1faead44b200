"""Query registry package — importing this populates REGISTRY."""

from zmaxion_spark.queries.registry import REGISTRY, Query, covered_operators, query  # noqa: F401

# Import all query modules for their registration side effects.
from zmaxion_spark.queries import (  # noqa: F401,E402
    advanced,
    ecs_q,
    llm,
    relational,
    scalar,
    sources_q,
    streaming_q,
    udf,
)
