"""Round-11 graded twins for the three tests-only side channels.

Verdict r10 #7: operators #4 (rate source), #139 (observe metrics)
and #164 (streaming progress listener) were the last three SURVEY §2
rows verified only by pytest — their output is a side channel (a
stream's schema, an Observation dict, a listener's progress list),
not a DataFrame, so they had no oracle row. These queries materialize
each side channel AS a DataFrame with a closed-form DuckDB oracle, so
the driver's hash gate grades them like everything else.

Design notes (scale story unchanged — these grade the *side channel*,
not a new operator):

- #4: the rate source's value column is a deterministic 0..N-1
  sequence regardless of wall clock; the query drains the stream until
  the first 1000 values exist, then censuses value % 5 — closed form
  on both engines (DuckDB range()). Timestamps are wall-clock and
  deliberately never touched.
- #139: Observation aggregates materialize as a side effect of the
  one action that already runs (zero extra scans at 100 TB); the query
  re-emits obs.get as a 1-row DataFrame. Sums ride DECIMAL(38,6) on
  both engines per the house float discipline.
- #164: the StreamingQueryListener's per-batch progress is summed into
  (input_rows, state_rows) — input rows across batches are exactly the
  replayed row count and the dedup operator's final numRowsTotal is
  exactly the distinct-key count, both closed-form from the fixture.
  Listener callbacks are async on the driver bus, so the query polls
  until the drained totals cover the known input (bounded wait).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.registry import query


# ---------------------------------------------------------------------------
# #4 source_stream_rate — graded census of the deterministic value column
# ---------------------------------------------------------------------------

_RATE_N = 1000


@query(
    "q_rate_source_census",
    oracle=f"""
        SELECT CAST(v % 5 AS INT) AS bucket,
               COUNT(*) AS n,
               CAST(SUM(v) AS BIGINT) AS sum_v,
               CAST(MIN(v) AS BIGINT) AS min_v,
               CAST(MAX(v) AS BIGINT) AS max_v
        FROM range({_RATE_N}) t(v)
        GROUP BY 1
        ORDER BY 1
    """,
    operators=(4, 6, 56),
    doc="Rate-source graded twin (#4): the rate source emits a "
    "deterministic value sequence 0..N-1 (wall-clock timestamps are "
    "never used), so draining the stream until the first 1000 values "
    "exist and censusing value % 5 is closed-form on both engines — "
    "DuckDB grades it from range(1000). Retires the last tests-only "
    "row for the streaming sources (COVERAGE #4). bench=False: the "
    "wall time is a fixed real-time wait on the 2000 rows/sec source, "
    "not data-proportional work.",
    bench=False,
)
def q_rate_source_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zmaxion_spark.streaming.sources import stream_rate

    qname = "rate_census_sink"
    q = (
        stream_rate(spark, rows_per_second=2000)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(qname).filter(F.col("value") < _RATE_N).count() >= _RATE_N:
                break
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination()
    drained = spark.table(qname).filter(F.col("value") < _RATE_N)
    if drained.count() < _RATE_N:
        raise RuntimeError("rate source did not produce 1000 values in 120s")
    return (
        drained.select(F.col("value").alias("v"))
        .groupBy((F.col("v") % 5).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("bigint").alias("sum_v"),
            F.min("v").cast("bigint").alias("min_v"),
            F.max("v").cast("bigint").alias("max_v"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# #139 runtime_metrics_observe — graded re-emission of Observation values
# ---------------------------------------------------------------------------


@query(
    "q_observe_metrics",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS rows_kept,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty_total,
               CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey
        FROM lineitem
        WHERE l_quantity > 25
    """,
    operators=(139, 24),
    doc="Observe-metrics graded twin (#139): audit counters collected "
    "via Spark's Observation API as a side effect of the ONE action "
    "that already runs (a noop sink write — zero extra scans, the "
    "100 TB audit pattern), then re-emitted as a 1-row DataFrame so "
    "the driver hashes the observed values against DuckDB's direct "
    "aggregate. Sum rides DECIMAL(38,6) on both engines.",
)
def q_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zmaxion_spark.metrics import observed

    li = load_table(spark, sf_dir, "lineitem")
    audited, obs = observed(
        li.filter(F.col("l_quantity") > 25),
        "audit",
        F.count(F.lit(1)).cast("bigint").alias("rows_kept"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)"))
        .cast("double")
        .alias("qty_total"),
        # DISTINCT aggregates are rejected inside observed metrics
        # (CollectMetrics), so the third audit counter is a MAX.
        F.max("l_orderkey").cast("bigint").alias("max_orderkey"),
    )
    audited.write.format("noop").mode("overwrite").save()
    got = obs.get
    schema = T.StructType(
        [
            T.StructField("rows_kept", T.LongType()),
            T.StructField("qty_total", T.DoubleType()),
            T.StructField("max_orderkey", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [
            Row(
                rows_kept=got["rows_kept"],
                qty_total=float(got["qty_total"]),
                max_orderkey=got["max_orderkey"],
            )
        ],
        schema,
    )


# ---------------------------------------------------------------------------
# #164 stream_progress_metrics — graded listener totals
# ---------------------------------------------------------------------------


@query(
    "q_stream_progress_audit",
    oracle="""
        SELECT CAST(2 * COUNT(*) AS BIGINT) AS input_rows,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS state_rows
        FROM events
    """,
    operators=(164, 52),
    doc="Progress-listener graded twin (#164): a StreamingQueryListener "
    "accumulates per-batch progress while a doubled events replay runs "
    "through dropDuplicates — total numInputRows across batches is "
    "exactly 2x the fixture rows and the dedup state's final "
    "numRowsTotal is exactly the distinct event_id count, so the "
    "listener side channel grades closed-form. The listener bus is "
    "async; the query polls (bounded) until the drained totals cover "
    "the known input before emitting.",
)
def q_stream_progress_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zmaxion_spark.metrics import ProgressRecorder
    from zmaxion_spark.streaming.pipeline import run_available_now
    from zmaxion_spark.streaming.sources import stream_events

    n_src = 2 * load_table(spark, sf_dir, "events").count()
    rec = ProgressRecorder().attach(spark)
    try:
        s1 = stream_events(spark, sf_dir)
        s2 = stream_events(spark, sf_dir)
        deduped = s1.union(s2).dropDuplicates(["event_id"])
        run_available_now(deduped, "progress_audit", mode="append")
        mine = []
        deadline = time.time() + 60
        while time.time() < deadline:
            mine = [
                p
                for p in rec.progress
                if (p["name"] or "").startswith("progress_audit")
            ]
            if sum(p["num_input_rows"] for p in mine) >= n_src:
                break
            time.sleep(0.2)
    finally:
        rec.detach(spark)
    input_rows = sum(p["num_input_rows"] for p in mine)
    state_rows = max((p["state_rows"] for p in mine), default=0)
    schema = T.StructType(
        [
            T.StructField("input_rows", T.LongType()),
            T.StructField("state_rows", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [Row(input_rows=input_rows, state_rows=state_rows)], schema
    )
