"""Distributed exact global ranks — the bucket-decompose discipline.

A global ``ROW_NUMBER()/RANK()/NTILE() OVER (ORDER BY ...)`` plans a
single-partition WindowExec: every row funnels through one task, which
is the entity-grain scale anti-pattern VERDICT r5 flagged on
q_model_eval_auc / q_rfm_segmentation / q_time_to_convert. The exact
rank decomposes instead:

    global_rank(x) = (# rows in strictly lower BUCKETS) + local_rank(x)

where a *bucket* is any coarse monotone function of the leading sort
key (a date, a small integer, ``floor(value / width)``). The bucket
census is a map-side-combined groupBy; the cumulative offsets form a
tiny frame (|distinct buckets| rows — bounded by the value domain, not
the corpus) whose window cost is negligible and which broadcasts back;
the per-row work is a window PARTITIONED by bucket. No global sort, no
single-partition stage, identical ranks — at 1000 executors each
bucket's window runs where its rows already live.

NTILE then follows in closed form from (rn, n): SQL-standard NTILE
gives the first ``n % k`` tiles ``n div k + 1`` rows and the rest
``n div k`` — a pure integer function of the row number, identical in
Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucketed_row_number(
    df: DataFrame,
    bucket_col: str,
    order_cols: list,
    out: str = "rn",
    *,
    rank_fn=F.row_number,
) -> DataFrame:
    """Exact global ``rank_fn() OVER (ORDER BY order_cols)`` without a
    single-partition sort.

    ``bucket_col`` must be a coarse MONOTONE NON-DECREASING function of
    the leading sort key (equal keys ⇒ equal buckets), so every tie
    group lives inside one bucket and offset + local rank equals the
    global rank for row_number AND rank alike. Adds ``out`` (long) and
    preserves all input columns."""
    sizes = df.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("_bn"))
    wcum = Window.orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offs = sizes.select(
        bucket_col, (F.sum("_bn").over(wcum) - F.col("_bn")).alias("_off")
    )
    wloc = Window.partitionBy(bucket_col).orderBy(*order_cols)
    return (
        df.join(F.broadcast(offs), bucket_col)
        .withColumn(out, (F.col("_off") + rank_fn().over(wloc)).cast("long"))
        .drop("_off")
    )


def ntile_from_rn(rn: str, n: str, k: int) -> Column:
    """SQL-standard NTILE(k) as a closed-form integer expression of a
    deterministic global row number ``rn`` and the total count ``n``
    (both column names). First ``n % k`` tiles hold ``n div k + 1``
    rows, the rest ``n div k`` — matching Spark and DuckDB NTILE
    exactly, in pure integer arithmetic (``div``, no doubles)."""
    big = f"({n} div {k} + 1)"
    boundary = f"(({n} % {k}) * {big})"
    return F.expr(
        f"CAST(CASE WHEN {rn} <= {boundary} "
        f"THEN ({rn} - 1) div {big} + 1 "
        f"ELSE ({n} % {k}) + ({rn} - {boundary} - 1) div ({n} div {k}) + 1 "
        f"END AS INT)"
    )
