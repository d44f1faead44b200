"""Distributed exact statistics (SURVEY §2.12 #91-92).

Engine-API form of the graded queries: cross-engine-exact per-key
moments and the two-phase exact-quantile rank. Both avoid the classic
scale traps — ``zscore_stats`` never calls stddev_samp (Welford vs
naive summation differs in the last ulp across engines), and
``bucket_rank`` never materializes a single-partition global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def zscore_stats(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-key (n, mean, sd) with a fixed cross-engine-exact formula.

    Sums value and value² through DECIMAL(38,6) (order-independent,
    exact), then applies ONE fixed IEEE expression:
    ``sd = sqrt((s2 - s1*s1/n) / (n-1))``. Keys with n <= 1 are
    dropped (no sample variance exists).
    """
    v = F.col(value)
    s = df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast("decimal(38,6)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(38,6)")).cast("double").alias("s2"),
    )
    return s.filter(F.col("n") > 1).select(
        key,
        "n",
        (F.col("s1") / F.col("n")).alias("mean_value"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sd_value"),
    )


def bucket_rank(
    df: DataFrame,
    value: str,
    tiebreak: str,
    n_buckets: int,
    aggs: tuple = (),
) -> tuple[DataFrame, DataFrame]:
    """Global rank by (value, tiebreak) without a global sort.

    Two phases: (1) equi-width bucket counts (tiny; cumulated over
    ``n_buckets`` rows), (2) row_number WITHIN each bucket — a window
    partitioned by bucket, parallel across buckets — plus the
    broadcast cumulative offset. Raise ``n_buckets`` until each
    bucket's sort fits one executor; the plan shape is unchanged.

    Returns ``(ranked, buckets)``: ``ranked`` is ``df`` plus
    ``bucket`` and ``grank`` (1-based global rank) and the broadcast
    stats columns ``mn``/``mx``/``n_total``; ``buckets`` is the
    per-bucket aggregate table (``bucket``, ``n_rows``, plus any
    caller ``aggs``). Extra ``aggs`` ride the SAME single aggregation
    pass that feeds the rank offsets — a caller building a histogram
    alongside the rank pays zero additional scans or shuffles.
    """
    v = F.col(value)
    stats = df.agg(
        F.min(value).alias("mn"),
        F.max(value).alias("mx"),
        F.count(F.lit(1)).alias("n_total"),
    )
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((v - F.col("mn")) / (F.col("mx") - F.col("mn")) * n_buckets),
    )
    b = df.crossJoin(F.broadcast(stats)).withColumn("bucket", bucket)
    buckets = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"), *aggs
    )
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = buckets.select(
        "bucket",
        F.coalesce(F.sum("n_rows").over(wcum), F.lit(0)).alias("cum_prev"),
    )
    wb = Window.partitionBy("bucket").orderBy(value, tiebreak)
    ranked = (
        b.join(F.broadcast(cum), "bucket")
        .withColumn("grank", F.col("cum_prev") + F.row_number().over(wb))
        .drop("cum_prev")
    )
    return ranked, buckets
