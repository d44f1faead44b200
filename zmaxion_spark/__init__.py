"""zmaxion_spark — a PySpark-native analytics engine.

Re-expression of the capability surface of ``Stock84-dev/zmaxion``
("Stream processing framework with ECS", /root/reference/README.md:2)
as a thin, composable operator library over stock PySpark, per the
blueprint in SURVEY.md. The reference snapshot contains no source
code (SURVEY.md §0), so the contract implemented here is SURVEY.md §2:
a 76-operator inventory verified query-by-query against a DuckDB SQL
oracle over the fixture tables in /root/testdata.

Layout:
  session.py    tuned SparkSession factory (AQE, Arrow, UTC, ns-ts shim)
  catalog.py    fixture-table loaders + temp-view registration
  ecs.py        Entity–Component–System query layer (World/query/system)
  functions/    scalar & vector function families (text, similarity, dedup)
  streaming/    Structured Streaming pipeline API, sources, stateful ops
  queries/      the graded query registry (spark fn + oracle SQL pairs)
  testing.py    spark-vs-duckdb differential comparator
"""

from zmaxion_spark.session import get_spark, tune  # noqa: F401
from zmaxion_spark.catalog import TABLES, load_table, register_views  # noqa: F401
from zmaxion_spark.ecs import World  # noqa: F401

__version__ = "0.1.0"
