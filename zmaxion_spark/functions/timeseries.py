"""Reusable time-series operators (SURVEY §2.12 #86-88).

The engine-API form of the graded queries in
``queries/timeseries_q.py``: gap-based sessionization, dense-grid
gap-fill, and exact power-of-two decay weights. Each returns plain
DataFrames/Columns so callers can compose them with any aggregation.

Scale contracts (100 TB posture):
- ``sessionize`` costs ONE shuffle on the key; the lag and running-sum
  windows and any downstream per-session groupBy all reuse that
  exchange.
- ``gapfill`` explodes the per-key time grid AFTER aggregation has
  shrunk the data to |keys| x |buckets|; the grid side is tiny and
  broadcastable.
- ``decay_weight`` is a pure column expression: exact 2^-k weights
  (never libm POW, whose last ulp differs across engines/libms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key: str,
    ts_us: str,
    gap_us: int,
    tiebreak: str,
) -> DataFrame:
    """Assign gap-based session ids per key.

    Adds a ``session_id`` column (1-based, per key): a new session
    starts whenever the time since the previous event exceeds
    ``gap_us``. ``ts_us`` must be a µs-epoch BIGINT column;
    ``tiebreak`` makes the within-key order total (deterministic
    across engines and retries).
    """
    w = Window.partitionBy(key).orderBy(ts_us, tiebreak)
    gap = F.col(ts_us) - F.lag(ts_us).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_us), F.lit(1)).otherwise(
        F.lit(0)
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("_new_sess", new_sess).withColumn(
        "session_id", F.sum("_new_sess").over(run)
    ).drop("_new_sess")


def gapfill(
    agg: DataFrame,
    bounds: DataFrame,
    key: str,
    time_col: str,
    step_interval: str,
    fills: dict[str, Column],
) -> DataFrame:
    """Left-join an aggregated frame onto a dense per-key time grid.

    ``bounds`` must carry ``key``, ``h0`` and ``h1`` (first/last grid
    point per key); the grid is ``sequence(h0, h1, step)`` — Spark's
    sequence is stop-INCLUSIVE, matching DuckDB generate_series.
    ``fills`` maps output column -> value for grid points with no data
    (e.g. ``{"n": F.lit(0)}``).
    """
    grid = bounds.select(
        key,
        F.explode(
            F.sequence("h0", "h1", F.expr(f"interval {step_interval}"))
        ).alias(time_col),
    )
    out = grid.join(agg, [key, time_col], "left")
    for name, default in fills.items():
        out = out.withColumn(name, F.coalesce(F.col(name), default))
    return out


def decay_weight(ts_us: str, ref_us: str, half_life_us: int) -> Column:
    """Exact 2^-k recency weight, k = whole half-lives of age.

    Integer floor-division (Spark ``div`` == DuckDB ``//``) and a
    shifted BIGINT keep the weight an exact power of two — bit-equal
    in every engine; ages beyond 63 half-lives weigh 0.
    """
    k = F.expr(f"({ref_us} - {ts_us}) div {half_life_us}")
    return F.when(
        k < 63,
        F.lit(1.0)
        / F.expr(
            f"cast(shiftleft(cast(1 as bigint),"
            f" cast(({ref_us} - {ts_us}) div {half_life_us} as int))"
            f" as double)"
        ),
    ).otherwise(F.lit(0.0))
