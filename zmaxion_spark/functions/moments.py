"""Exact second-moment (covariance) kernel — the shared core of
#217 ``embedding_covariance`` and #260 ``pca_power``.

Exactness discipline (round 5, replacing per-element DECIMAL(38,18)):
embedding components are float32, so every pairwise product carries
<= 48 mantissa bits and is an EXACT double; scaling by 2^40 is an
exponent shift (also exact); and |p|·2^40 for unit-scale embeddings
sits far below 2^53, so ``q = FLOOR(p·2^40 + 0.5)`` is an
exactly-computed integer on both engines (the +0.5 is exact because
0.5 is a multiple of the value's dyadic granularity at this
magnitude, and FLOOR breaks the half-tie identically everywhere).
Summing q is an order-independent INTEGER sum — Spark DECIMAL(38,0),
DuckDB HUGEINT — so the covariance double derived from the sums is
bit-identical on both engines, exactly like the old per-element
DECIMAL(38,18) cast but without its measured 10× BigDecimal cost
(the decimal cast+sum was 4.7 s of q_embedding_covariance's 5.5 s at
sf0.1; the long quantize+sum is ~1 s).

Plan shape (the other half of the round-5 fix): the old pipeline
posexploded to n·d rows and SELF-JOINED on vec_id to build the n·d²/2
product stream — one full exchange of the exploded table per join
side. The kernel now derives products with a second GENERATOR over
the per-row array slice instead: scan → explode → explode → partial
hash-aggregate, zero joins, and the only exchange left is the final
d(d+1)/2-cell merge. At 100 TB the reduce state is still O(d²)
regardless of corpus size and 1000 executors merge partial integer
matrices additively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q40 = 1 << 40  # dyadic quantization unit (exact power-of-2 scale)
_QF = float(Q40)

# Embedding dimensionality shared by the Spark kernel's contract check
# and the generated DuckDB twin — ONE constant, so the two sides can
# never silently disagree (the old hand-written RANGE(1,65) hardcode).
EMB_D = 64


def _q(col) -> "F.Column":
    """Exact dyadic quantize: FLOOR(x·2^40 + 0.5) as a long."""
    return F.floor(col * F.lit(_QF) + F.lit(0.5))


def cov_cells(e: DataFrame, d: int = EMB_D) -> DataFrame:
    """Upper-triangle covariance cells ``(i, j, n, c)`` (1-based dims)
    of the float32 ``embedding`` array column, hash-exact vs the DuckDB
    twin produced by :func:`cov_cells_sql`.

    ``d`` is a CONTRACT, not a truncation: any row whose array length
    differs raises at scan time (raise_error inside the filter, which
    Catalyst cannot prune) instead of silently producing a wrong-shape
    covariance. The slice length itself is derived from the array, so
    the kernel is dimension-agnostic up to the check."""
    checked = e.filter(
        F.when(F.size("embedding") == d, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"cov_cells: embedding length != d={d} (got "),
                    F.size("embedding").cast("string"),
                    F.lit(")"),
                )
            )
        )
    )
    lvl1 = checked.select(
        "embedding", F.posexplode("embedding").alias("pos0", "xv")
    ).select(
        (F.col("pos0") + 1).alias("i"),
        F.col("xv").cast("double").alias("xi"),
        F.slice(
            F.col("embedding"),
            F.col("pos0") + 1,
            F.size("embedding") - F.col("pos0"),
        ).alias("rest"),
    )
    prods = lvl1.select("i", "xi", F.posexplode("rest").alias("pos1", "yv")).select(
        "i",
        (F.col("i") + F.col("pos1")).alias("j"),
        (F.col("xi") * F.col("yv").cast("double")).alias("p"),
    )
    sums2d = prods.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_q(F.col("p")).cast("decimal(38,0)")).alias("sxyq"),
    )
    oned = (
        checked.select(F.posexplode("embedding").alias("pos0", "xv"))
        .select((F.col("pos0") + 1).alias("i"), F.col("xv").cast("double").alias("x"))
        .groupBy("i")
        .agg(F.sum(_q(F.col("x")).cast("decimal(38,0)")).alias("sxq"))
    )
    qq = F.lit(_QF)
    return (
        sums2d.join(F.broadcast(oned), "i")
        .join(
            F.broadcast(oned.select(F.col("i").alias("j"), F.col("sxq").alias("syq"))),
            "j",
        )
        .select(
            "i",
            "j",
            "n",
            (
                (
                    F.col("sxyq").cast("double") / qq
                    - (F.col("sxq").cast("double") / qq)
                    * (F.col("syq").cast("double") / qq)
                    / F.col("n")
                )
                / F.col("n")
            ).alias("c"),
        )
    )


def cov_cells_sql(d: int = EMB_D) -> str:
    """DuckDB twin of :func:`cov_cells` for dimension ``d``: CTE text
    producing cov(i, j, n, cov_raw). SUM(BIGINT) is HUGEINT (exact
    int128); the double derivation mirrors the Spark expression tree
    operation-for-operation. Generated from the same EMB_D default as
    the Spark kernel so the two sides share one dimension constant."""
    return _COV_CELLS_SQL_TEMPLATE.replace("{D1}", str(d + 1))


_COV_CELLS_SQL_TEMPLATE = """ij AS (
            SELECT a.i AS i, b.i AS j
            FROM (SELECT UNNEST(RANGE(1, {D1})) AS i) a,
                 (SELECT UNNEST(RANGE(1, {D1})) AS i) b
            WHERE b.i >= a.i
        ),
        qsums AS (
            SELECT ij.i, ij.j,
                   COUNT(*) AS n,
                   SUM(CAST(FLOOR(CAST(e.embedding[ij.i] AS DOUBLE)
                                  * CAST(1099511627776 AS DOUBLE)
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS sxq,
                   SUM(CAST(FLOOR(CAST(e.embedding[ij.j] AS DOUBLE)
                                  * CAST(1099511627776 AS DOUBLE)
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS syq,
                   SUM(CAST(FLOOR(CAST(e.embedding[ij.i] AS DOUBLE)
                                  * CAST(e.embedding[ij.j] AS DOUBLE)
                                  * CAST(1099511627776 AS DOUBLE)
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS sxyq
            FROM embeddings e CROSS JOIN ij
            GROUP BY ij.i, ij.j
        ),
        cov AS MATERIALIZED (
            SELECT i, j, n,
                   (CAST(sxyq AS DOUBLE) / CAST(1099511627776 AS DOUBLE)
                    - (CAST(sxq AS DOUBLE) / CAST(1099511627776 AS DOUBLE))
                      * (CAST(syq AS DOUBLE) / CAST(1099511627776 AS DOUBLE))
                      / n)
                   / n AS cov_raw
            FROM qsums
        )"""

# Back-compat alias at the shared default dimension.
COV_CELLS_SQL = cov_cells_sql()
