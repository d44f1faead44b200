"""CDC merge / upsert (SURVEY §2.12 #90).

The lakehouse MERGE INTO re-expressed as pure DataFrame algebra:
union-all the base with the change-set, keep the highest version per
key. One shuffle on the merge key; with a small change-set AQE leaves
the rank-dedup as the only wide stage. A merge-on-read table format
(Delta/Iceberg) would push this same plan into its commit protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    base: DataFrame, changes: DataFrame, key: str, version: str
) -> DataFrame:
    """Latest-version-wins upsert of ``changes`` onto ``base``.

    Both frames must share a schema including ``key`` and ``version``;
    the (key, version) pair must be unique across the union or the
    winner is undefined.
    """
    merged = base.unionByName(changes)
    w = Window.partitionBy(key).orderBy(F.col(version).desc())
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
