"""Fixture-table catalog (FIXTURES.md schemas).

Load pattern per TESTDATA.md: one parquet file per table under
``{sf_dir}/{name}.parquet``. The only special case is ``events``:
its ``ts`` column is nanosecond-precision in parquet, which Spark
cannot represent (µs timestamps). We read it as a long (nanosAsLong)
and truncate to µs — identical to DuckDB's ``CAST(ts AS TIMESTAMP)``,
so oracle SQL pairs stay bit-exact (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zmaxion_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables we always broadcast in star joins.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes events.ts to µs timestamp."""
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # long ns -> µs timestamp; matches DuckDB CAST(ts AS TIMESTAMP)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register temp views so ``spark.sql`` (entry point EP2) works."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
