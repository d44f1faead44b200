"""Scale-machinery operators (SURVEY §2.15, #154–#157).

Four patterns that only matter BECAUSE of scale, graded end-to-end:
grid-blocked spatial distance join (the all-pairs spec made linear),
incremental materialized-view maintenance (merge partial aggregate
states instead of recomputing), Z-order clustered layout (2-D range
queries skip row groups on BOTH dimensions), and streaming CDC
changelog application (last-write-wins state machine, order-proof).

Each oracle states the naive/logical spec — quadratic cross join,
full recompute, layout-free scan, batch window dedup — and the Spark
side must reproduce it hash-exactly from the scale-right plan.

Coordinates and any other synthetic attributes derive from md5 id
hashes (engine-portable, proven byte-identical in DuckDB since
round 1), never runtime RNG.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.helpers import DEC, sql_dsum
from zmaxion_spark.queries.registry import query
from zmaxion_spark.queries.sources_q import _roundtrip_dir


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# #154 spatial_grid_join — grid-blocked distance join
# ---------------------------------------------------------------------------

_GRID = 8.0  # cell size == radius: neighbors are always within ±1 cell
_R2 = 64.0


def _coord(prefix: str, key: Column, span_milli: int, offset: int) -> Column:
    """Deterministic synthetic coordinate in [-offset, span/1000-offset):
    md5 hash word of the prefixed id, scaled to milli-degrees. The
    md5-word derivation is the engine-portable hash proven in
    pipeline_q.hash_bucket."""
    word = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(prefix), key.cast("string")).cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (word % span_milli) / F.lit(1000.0) - offset


_SQL_COORD = (
    "CAST(('0x' || SUBSTR(MD5('{p}' || CAST({k} AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % {m} / CAST(1000 AS DOUBLE) - {o}"
)


@query(
    "q_spatial_grid_join",
    oracle=f"""
        WITH c AS (SELECT c_custkey,
                          {_SQL_COORD.format(p='lat:', k='c_custkey', m=120000, o=60)} AS lat,
                          {_SQL_COORD.format(p='lon:', k='c_custkey', m=360000, o=180)} AS lon
                   FROM customer),
        s AS (SELECT s_suppkey,
                     {_SQL_COORD.format(p='lat:', k='s_suppkey', m=120000, o=60)} AS lat,
                     {_SQL_COORD.format(p='lon:', k='s_suppkey', m=360000, o=180)} AS lon
              FROM supplier)
        SELECT s_suppkey, COUNT(*) AS n_within,
               ROUND(SQRT(MIN((c.lat - s.lat) * (c.lat - s.lat)
                              + (c.lon - s.lon) * (c.lon - s.lon))), 9) AS min_dist
        FROM s JOIN c
          ON (c.lat - s.lat) * (c.lat - s.lat)
             + (c.lon - s.lon) * (c.lon - s.lon) <= {_R2}
        GROUP BY s_suppkey
    """,
    operators=(17, 23, 154),
    doc=f"Grid-blocked spatial distance join (#154): customers within "
    f"{_GRID}° of each supplier (synthetic md5-derived coordinates, "
    "planar metric). The oracle is the quadratic cross-join spec; the "
    "Spark plan is the scale rewrite — both sides bucket into "
    f"{_GRID}°×{_GRID}° grid cells, the supplier side probes its 3×3 "
    "neighborhood (cell size == radius ⇒ any in-range pair is ≤1 cell "
    "apart, and each pair meets in EXACTLY one cell so no dedup pass), "
    "and the exact distance test refines candidates. Work scales with "
    "occupied-cell density, not |S|×|C|; skewed cells (urban hubs) are "
    "ordinary AQE skew-join territory since the block key is an "
    "equi-join key.",
)
def q_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        _coord("lat:", F.col("c_custkey"), 120000, 60).alias("lat"),
        _coord("lon:", F.col("c_custkey"), 360000, 180).alias("lon"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _coord("lat:", F.col("s_suppkey"), 120000, 60).alias("lat"),
        _coord("lon:", F.col("s_suppkey"), 360000, 180).alias("lon"),
    )
    cell = lambda c: F.floor(c / _GRID).cast("long")  # noqa: E731
    c = cust.select(
        "c_custkey",
        F.col("lat").alias("clat"),
        F.col("lon").alias("clon"),
        cell(F.col("lat")).alias("cx"),
        cell(F.col("lon")).alias("cy"),
    )
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    s = (
        supp.select(
            "s_suppkey",
            F.col("lat").alias("slat"),
            F.col("lon").alias("slon"),
            cell(F.col("lat")).alias("sx"),
            cell(F.col("lon")).alias("sy"),
        )
        .withColumn("dx", off)
        .withColumn("dy", off)
    )
    d2 = (F.col("clat") - F.col("slat")) * (F.col("clat") - F.col("slat")) + (
        F.col("clon") - F.col("slon")
    ) * (F.col("clon") - F.col("slon"))
    return (
        s.join(
            c,
            (F.col("cx") == F.col("sx") + F.col("dx"))
            & (F.col("cy") == F.col("sy") + F.col("dy")),
        )
        .withColumn("d2", d2)
        .filter(F.col("d2") <= _R2)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.round(F.sqrt(F.min("d2")), 9).alias("min_dist"),
        )
    )


# ---------------------------------------------------------------------------
# #155 incremental_mv — mergeable aggregate-state maintenance
# ---------------------------------------------------------------------------

_MV_CUTOFF = "1998-01-01"


@query(
    "q_incremental_mv",
    oracle=f"""
        SELECT o_custkey, COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice', 'revenue')},
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                   / COUNT(*) AS avg_price
        FROM orders
        GROUP BY o_custkey
    """,
    operators=(23, 90, 155),
    doc="Incremental materialized-view maintenance (#155): the per-"
    f"customer order aggregate is computed as base (< {_MV_CUTOFF}) "
    "partial states MERGED with delta (≥ cutoff) partial states — "
    "count and decimal-sum are algebraic, so merging partials is "
    "exact — and must hash-match the oracle's full recompute over all "
    "rows. This is the maintenance loop of a 100 TB rollup: only the "
    "delta is scanned per refresh, states stay (key, count, decimal "
    "sum), and derived columns (avg) come from merged states, never "
    "from re-aggregating raw history. Sums merge in DECIMAL(38,6) "
    "(associative, order-independent); the double cast happens once, "
    "after the merge.",
)
def q_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit(_MV_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("s"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionAll(delta)
        .groupBy("o_custkey")
        .agg(F.sum("n").alias("n_orders"), F.sum("s").alias("s"))
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        F.col("s").cast("double").alias("revenue"),
        (F.col("s").cast("double") / F.col("n_orders")).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# #156 zorder_layout — Z-order clustering for 2-D range queries
# ---------------------------------------------------------------------------

_Z_PK_LO, _Z_PK_HI = 100, 300
_Z_SK_LO, _Z_SK_HI = 10, 40


def zorder_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low ``bits`` of two integer
    columns — pure JVM bitwise expressions, codegen'd, no UDF."""
    lanes = []
    for i in range(bits):
        lanes.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        lanes.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), lanes)


@query(
    "q_zorder_scan",
    oracle=f"""
        SELECT COUNT(*) AS n,
               {sql_dsum('l_extendedprice', 'revenue')},
               MIN(l_partkey) AS min_pk, MAX(l_suppkey) AS max_sk
        FROM lineitem
        WHERE l_partkey BETWEEN {_Z_PK_LO} AND {_Z_PK_HI}
          AND l_suppkey BETWEEN {_Z_SK_LO} AND {_Z_SK_HI}
    """,
    operators=(1, 94, 156),
    doc="Z-order clustered layout (#156): lineitem is rewritten ONCE "
    "range-partitioned + sorted on the Morton interleave of "
    "(l_partkey, l_suppkey), then a 2-D range query runs over the "
    "rewritten files and must hash-match the same query on the "
    "original layout — the layout is an optimization, never a "
    "semantic. Z-order keeps both dimensions' min/max row-group "
    "bounds tight simultaneously (a single-column sort gives perfect "
    "skipping on one dim and none on the other), which is why "
    "100 TB lakehouse tables cluster their two hottest predicate "
    "columns this way. The interleave is plain bitwise codegen; the "
    "rewrite caches keyed by source-file identity so regenerated "
    "fixtures rewrite fresh.",
    bench=False,  # writes a one-time layout; scan itself is the point
)
def q_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _roundtrip_dir(sf_dir, "zorder", source_table="lineitem")
    if not os.path.isdir(path):
        li = _t(spark, sf_dir, "lineitem")
        z = zorder_value(
            (F.col("l_partkey") % 65536).cast("long"),
            (F.col("l_suppkey") % 65536).cast("long"),
        )
        (
            li.withColumn("_z", z)
            .repartitionByRange(8, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
            .write.mode("overwrite")
            .parquet(path)
        )
    back = spark.read.parquet(path)
    return (
        back.filter(
            F.col("l_partkey").between(_Z_PK_LO, _Z_PK_HI)
            & F.col("l_suppkey").between(_Z_SK_LO, _Z_SK_HI)
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("revenue"),
            F.min("l_partkey").alias("min_pk"),
            F.max("l_suppkey").alias("max_sk"),
        )
    )


# ---------------------------------------------------------------------------
# #157 stream_cdc_apply — changelog application as a state machine
# ---------------------------------------------------------------------------


@query(
    "q_stream_cdc_apply",
    oracle="""
        WITH ch AS (
            SELECT user_id, event_id AS seq,
                   CASE WHEN event_type = 'signup' THEN 'I'
                        WHEN event_type = 'error' THEN 'D'
                        ELSE 'U' END AS op,
                   value
            FROM events
        ),
        w AS (SELECT user_id, seq, op, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq DESC)
                         AS rn
              FROM ch)
        SELECT user_id, seq AS last_seq, value AS last_value
        FROM w WHERE rn = 1 AND op <> 'D'
    """,
    operators=(53, 90, 157),
    doc="Streaming CDC apply (#157): an insert/update/delete changelog "
    "(derived from the event stream, sequenced by event_id) replayed "
    "through a per-key applyInPandasWithState last-write-wins state "
    "machine; the surviving (non-deleted) key versions must hash-match "
    "the batch window spec. The state transition is max-by-sequence — "
    "COMMUTATIVE and idempotent, so arrival order across micro-batches "
    "cannot change the result (the property that makes CDC apply safe "
    "under replay and repartition). State per key is 3 scalars; at "
    "100 TB the state store partitions by key hash exactly like the "
    "shuffle would.",
    bench=False,  # streaming replay with checkpoint; parity demo
)
def q_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zmaxion_spark.streaming.pipeline import run_available_now
    from zmaxion_spark.streaming.sources import stream_events
    from zmaxion_spark.streaming.stateful import cdc_last_write_wins

    ev = stream_events(spark, sf_dir).select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        "value",
    )
    t = run_available_now(cdc_last_write_wins(ev), "cdc_apply", mode="update")
    latest = t.groupBy("user_id").agg(
        F.max(F.struct("last_seq", "op", "last_value")).alias("st")
    )
    return latest.filter(F.col("st.op") != "D").select(
        "user_id",
        F.col("st.last_seq").alias("last_seq"),
        F.col("st.last_value").alias("last_value"),
    )


# ---------------------------------------------------------------------------
# #163 runtime_bloom_filter — runtime filter pushdown on a shuffle join
# ---------------------------------------------------------------------------

_BLOOM_CONFS = {
    # The injection rule's size gates are tuned for real clusters
    # (application side >= 10 GB); the fixture is far smaller, so the
    # graded query lowers them to make the 100 TB plan observable, and
    # restores every conf afterwards.
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@query(
    "q_runtime_bloom_join",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                   AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY l_returnflag
    """,
    operators=(13, 163),
    doc="Runtime bloom-filter join pruning (#163): a selective dimension "
    "predicate (1-URGENT orders) is turned by Catalyst's "
    "InjectRuntimeFilter rule into a bloom filter BUILT from the "
    "filtered creation side and PUSHED into the fact-side scan as "
    "might_contain(xxhash64(l_orderkey)) — so at 100 TB the shuffle "
    "join never shuffles the ~80% of lineitem rows whose orders were "
    "filtered out. This is the semi-join reduction every warehouse "
    "engine performs, obtained declaratively from a config, not code. "
    "The rule's size gates target real clusters (app side >= 10 GB), "
    "so the query pins the confs low while it materializes (eager "
    "localCheckpoint — reliable checkpoint on a cluster) and restores "
    "them after; the plan shape is pinned in tests/test_plans.py.",
    bench=True,
)
def q_runtime_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        li = _t(spark, sf_dir, "lineitem")
        o = _t(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        out = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_extendedprice").cast(DEC))
                .cast("double")
                .alias("revenue"),
            )
        )
        # Materialize while the runtime-filter confs are active — the
        # injection happens at optimization time, so a lazily returned
        # plan would re-optimize AFTER the restore below.
        return out.localCheckpoint(eager=True)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# #205 key-skew diagnostics — the pre-flight check before a big join
# ---------------------------------------------------------------------------


@query(
    "q_skew_diagnose",
    oracle="""
        WITH freq AS (
            SELECT o_custkey, COUNT(*) AS f FROM orders GROUP BY o_custkey
        ),
        s AS (
            SELECT COUNT(*) AS n_keys,
                   CAST(SUM(f) AS BIGINT) AS n_rows,
                   MAX(f) AS max_freq,
                   CAST(SUM(f * f) AS BIGINT) AS sum_f2
            FROM freq
        ),
        hot AS (
            SELECT COUNT(*) AS hot_keys
            FROM freq, s
            WHERE f * s.n_keys > 2 * s.n_rows
        )
        SELECT s.n_rows, s.n_keys, s.max_freq,
               ROUND(CAST(s.max_freq AS DOUBLE) / s.n_rows, 9) AS max_share,
               ROUND(SQRT(CAST(s.sum_f2 AS DOUBLE) / s.n_keys
                          - (CAST(s.n_rows AS DOUBLE) / s.n_keys)
                            * (CAST(s.n_rows AS DOUBLE) / s.n_keys))
                     / (CAST(s.n_rows AS DOUBLE) / s.n_keys), 9) AS freq_cv,
               hot.hot_keys,
               CAST(CEIL(CAST(s.max_freq AS DOUBLE) * 32.0 / s.n_rows) AS BIGINT)
                   AS salt_factor
        FROM s, hot
    """,
    operators=(84, 205),
    doc="Key-skew diagnostics (#205): one pass over the join-key "
    "frequency table yields the numbers that decide a 100 TB shuffle "
    "strategy — max key share, coefficient of variation of key "
    "frequencies, the count of keys hotter than 2x the mean, and the "
    "salt factor that would split the hottest key into ideal-partition-"
    "sized chunks (ceil(max_freq / (rows/32 partitions))). This is the "
    "measured input to join_salted (#84) and AQE skew thresholds: "
    "measure, don't guess. All integer-exact aggregates (counts and "
    "sum of squares are BIGINT-exact) folded into single IEEE "
    "expressions, so the oracle match is bit-exact. Cost: two hash "
    "aggregates over an 8-byte key — negligible next to the join it "
    "de-risks; at 100 TB run it on the same scan that builds runtime "
    "filters.",
)
def q_skew_diagnose(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    freq = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("f"))
    s = freq.groupBy().agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("f").alias("n_rows"),
        F.max("f").alias("max_freq"),
        F.sum(F.col("f") * F.col("f")).alias("sum_f2"),
    )
    hot = (
        freq.crossJoin(F.broadcast(s.select("n_keys", F.col("n_rows").alias("nr"))))
        .filter(F.col("f") * F.col("n_keys") > 2 * F.col("nr"))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("hot_keys"))
    )
    return (
        s.crossJoin(F.broadcast(hot))
        .select(
            "n_rows",
            "n_keys",
            "max_freq",
            F.round(F.col("max_freq").cast("double") / F.col("n_rows"), 9).alias(
                "max_share"
            ),
            F.round(
                F.sqrt(
                    F.col("sum_f2").cast("double") / F.col("n_keys")
                    - (F.col("n_rows").cast("double") / F.col("n_keys"))
                    * (F.col("n_rows").cast("double") / F.col("n_keys"))
                )
                / (F.col("n_rows").cast("double") / F.col("n_keys")),
                9,
            ).alias("freq_cv"),
            "hot_keys",
            F.ceil(F.col("max_freq").cast("double") * 32.0 / F.col("n_rows"))
            .cast("bigint")
            .alias("salt_factor"),
        )
    )


# ---------------------------------------------------------------------------
# #218 bloom pre-filter semi-join with measured false-positive rate
# ---------------------------------------------------------------------------

_BL_M = 4096  # bits
_BL_K = 3  # hash probes


def _bl_bit_sql(j: str, key: str) -> str:
    return (
        f"CAST(('0x' || SUBSTR(MD5('bl' || {j} || ':' || {key}), 1, 8)) "
        f"AS BIGINT) % {_BL_M}"
    )


@query(
    "q_bloom_prefilter",
    oracle=f"""
        WITH good AS (
            SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000
        ),
        js AS (SELECT UNNEST(RANGE({_BL_K})) AS j),
        bits AS (
            SELECT DISTINCT j, {_bl_bit_sql('j', 'CAST(k AS VARCHAR)')} AS b
            FROM good CROSS JOIN js
        ),
        probes AS (
            SELECT o.o_orderkey, o.o_custkey, js.j,
                   {_bl_bit_sql('js.j', 'CAST(o.o_custkey AS VARCHAR)')} AS b
            FROM orders o CROSS JOIN js
        ),
        cand AS (
            SELECT o_orderkey, o_custkey
            FROM probes p
            WHERE EXISTS (SELECT 1 FROM bits WHERE bits.j = p.j AND bits.b = p.b)
            GROUP BY o_orderkey, o_custkey
            HAVING COUNT(*) = {_BL_K}
        ),
        stats AS (
            SELECT COUNT(*) AS n_candidates,
                   CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM good
                                              WHERE good.k = cand.o_custkey)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_true
            FROM cand
        ),
        tot AS (SELECT COUNT(*) AS n_orders FROM orders)
        SELECT n_orders, n_candidates, n_true,
               n_candidates - n_true AS n_false_positive,
               ROUND(CAST(n_candidates - n_true AS DOUBLE)
                     / (n_orders - n_true), 9) AS fp_rate
        FROM stats CROSS JOIN tot
    """,
    operators=(15, 188, 218),
    doc=f"Bloom pre-filter semi-join (#218): a {_BL_M}-bit, "
    f"{_BL_K}-probe bloom set of the qualifying customer keys is built "
    "as a RELATION of set bits (md5-derived, engine-reproducible), the "
    "fact table probes it k times and keeps rows where all probes hit, "
    "and the exact semi-join then grades the filter: candidates, true "
    "members, false positives, measured FP rate — all hash-exact. "
    "This is the shuffle-avoidance pattern behind runtime filters "
    "(#163) made explicit and persistent: at 100 TB the bit relation "
    "(<= m rows) broadcasts everywhere a fact scan runs, drops the "
    "bulk of non-matching rows BEFORE the join shuffle, and never "
    "false-negatives (graded: n_true candidates == every true match). "
    "The FP rate column is the capacity-planning number: it prices "
    "the wasted shuffle the filter failed to prevent.",
)
def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def bit(j_col, key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("bl"),
                            j_col.cast("string"),
                            F.lit(":"),
                            key_col.cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _BL_M
        )

    good = (
        c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k")).distinct()
    )
    js = F.explode(F.sequence(F.lit(0), F.lit(_BL_K - 1))).alias("j")
    bits = (
        good.select("k", js)
        .select("j", bit(F.col("j"), F.col("k")).alias("b"))
        .distinct()
    )
    probes = o.select("o_orderkey", "o_custkey", js).select(
        "o_orderkey", "o_custkey", "j", bit(F.col("j"), F.col("o_custkey")).alias("b")
    )
    cand = (
        probes.join(F.broadcast(bits), ["j", "b"], "left_semi")
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") == _BL_K)
        .select("o_orderkey", "o_custkey")
    )
    stats = cand.join(
        F.broadcast(good), cand.o_custkey == good.k, "left_outer"
    ).groupBy().agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true"),
    )
    tot = o.groupBy().agg(F.count(F.lit(1)).alias("n_orders"))
    return stats.crossJoin(F.broadcast(tot)).select(
        "n_orders",
        "n_candidates",
        "n_true",
        (F.col("n_candidates") - F.col("n_true")).alias("n_false_positive"),
        F.round(
            (F.col("n_candidates") - F.col("n_true")).cast("double")
            / (F.col("n_orders") - F.col("n_true")),
            9,
        ).alias("fp_rate"),
    )


# ---------------------------------------------------------------------------
# #240 bitmap index — set algebra on packed bitmaps
# ---------------------------------------------------------------------------


@query(
    "q_bitmap_index",
    oracle="""
        WITH b AS (
            SELECT c_mktsegment AS seg,
                   c_custkey // 63 AS word_idx,
                   CAST(BIT_OR(CAST(1 AS BIGINT) << CAST(c_custkey % 63 AS INT))
                        AS BIGINT) AS word
            FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
            GROUP BY 1, 2
        ),
        pair AS (
            SELECT COALESCE(x.word_idx, y.word_idx) AS word_idx,
                   COALESCE(x.word, 0) AS wa,
                   COALESCE(y.word, 0) AS wb
            FROM (SELECT word_idx, word FROM b WHERE seg = 'BUILDING') x
            FULL OUTER JOIN (SELECT word_idx, word FROM b
                             WHERE seg = 'MACHINERY') y
              ON x.word_idx = y.word_idx
        )
        SELECT CAST(SUM(BIT_COUNT(wa)) AS BIGINT) AS n_building,
               CAST(SUM(BIT_COUNT(wb)) AS BIGINT) AS n_machinery,
               CAST(SUM(BIT_COUNT(wa & wb)) AS BIGINT) AS n_both,
               CAST(SUM(BIT_COUNT(wa | wb)) AS BIGINT) AS n_either,
               CAST(SUM(BIT_COUNT(wa & ~wb)) AS BIGINT) AS n_building_only
        FROM pair
    """,
    operators=(26, 240),
    doc="Bitmap index (#240): customer membership per segment packed "
    "into 63-bit words (key div 63; bit 63 stays clear so the shift "
    "never touches the sign bit in either engine), "
    "then segment set algebra — intersection, union, difference "
    "cardinalities — as bitwise AND/OR/ANDNOT + popcount over aligned "
    "words, never a key-level join. The OLAP bitmap-index pattern "
    "(Druid/Pinot/roaring): at 100 TB a segment bitmap is ~keys/8 "
    "bytes, words build with ONE bit_or aggregate (mergeable "
    "map-side), and every boolean segment combination costs a linear "
    "word scan. Integer-exact end to end, graded hash-exact.",
)
def q_bitmap_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    b = c.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.expr("c_custkey div 63").alias("word_idx"),
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(c_custkey % 63 AS INT))")
        )
        .cast("bigint")
        .alias("word")
    )
    x = b.filter(F.col("seg") == "BUILDING").select(
        "word_idx", F.col("word").alias("wa")
    )
    y = b.filter(F.col("seg") == "MACHINERY").select(
        F.col("word_idx").alias("wib"), F.col("word").alias("wb")
    )
    pair = (
        x.join(y, x.word_idx == y.wib, "full_outer")
        .select(
            F.coalesce(F.col("wa"), F.lit(0)).alias("wa"),
            F.coalesce(F.col("wb"), F.lit(0)).alias("wb"),
        )
    )
    return pair.groupBy().agg(
        F.sum(F.expr("bit_count(wa)")).cast("bigint").alias("n_building"),
        F.sum(F.expr("bit_count(wb)")).cast("bigint").alias("n_machinery"),
        F.sum(F.expr("bit_count(wa & wb)")).cast("bigint").alias("n_both"),
        F.sum(F.expr("bit_count(wa | wb)")).cast("bigint").alias("n_either"),
        F.sum(F.expr("bit_count(wa & ~wb)")).cast("bigint").alias("n_building_only"),
    )


# ---------------------------------------------------------------------------
# #241 geohash encode + multi-resolution spatial rollup
# ---------------------------------------------------------------------------

_GH_BITS = 15  # per-axis quantization bits -> 30-bit cell -> 6 base32 chars
_GH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _interleave_sql(lat_int: str, lon_int: str, div: str = "//") -> str:
    """30-bit lon/lat bit-interleave as a sum of shifted bit tests —
    ONE generator serves both engines; only the integer-division token
    differs (DuckDB `//`, Spark `div`)."""
    terms = []
    for i in range(_GH_BITS):
        terms.append(f"((({lon_int}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({lat_int}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def _gh_char_sql(cell: str, chunk: int, div: str = "//") -> str:
    shift = 1 << (5 * (6 - chunk))
    return (
        f"SUBSTR('{_GH_B32}', "
        f"CAST((({cell}) {div} {shift}) % 32 AS INT) + 1, 1)"
    )


@query(
    "q_geohash_rollup",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey,
                   {_SQL_COORD.format(p='lat:', k='c_custkey', m=120000, o=60)} AS lat,
                   {_SQL_COORD.format(p='lon:', k='c_custkey', m=360000, o=180)} AS lon
            FROM customer
        ),
        q AS (
            SELECT c_custkey,
                   CAST(FLOOR((lat + 90) / 180 * {1 << _GH_BITS}) AS BIGINT) AS lai,
                   CAST(FLOOR((lon + 180) / 360 * {1 << _GH_BITS}) AS BIGINT) AS loi
            FROM pts
        ),
        cells AS (
            SELECT c_custkey, {_interleave_sql('lai', 'loi')} AS cell FROM q
        ),
        gh AS (
            SELECT c_custkey,
                   {" || ".join(_gh_char_sql("cell", c) for c in range(1, 7))} AS geohash6
            FROM cells
        )
        SELECT SUBSTR(geohash6, 1, 3) AS gh3,
               COUNT(*) AS n_points,
               COUNT(DISTINCT SUBSTR(geohash6, 1, 5)) AS n_subcells5
        FROM gh
        GROUP BY 1
    """,
    operators=(154, 241),
    doc=f"Geohash encode + multi-resolution rollup (#241): synthetic "
    f"md5-derived coordinates quantized to {_GH_BITS} bits per axis, "
    "lon/lat bits interleaved into a 30-bit cell (the interleave "
    "expression is GENERATED once and shared verbatim by both "
    "engines), base32-encoded to 6-char geohashes, then rolled up at "
    "two resolutions (3-char ~ 156 km, 5-char ~ 4.9 km cells). The "
    "spatial drill-down index every geo dashboard uses: PREFIX "
    "aggregation means coarser cells are substring groupBys of the "
    "same column — no re-encode, and the geohash is a pushdown-able "
    "partition/cluster key at 100 TB (Z-order in disguise, #187). "
    "Integer bit arithmetic end-to-end: hash-exact.",
)
def q_geohash_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        _coord("lat:", F.col("c_custkey"), 120000, 60).alias("lat"),
        _coord("lon:", F.col("c_custkey"), 360000, 180).alias("lon"),
    )
    q = cust.select(
        "c_custkey",
        F.floor((F.col("lat") + 90) / 180 * (1 << _GH_BITS)).cast("bigint").alias("lai"),
        F.floor((F.col("lon") + 180) / 360 * (1 << _GH_BITS)).cast("bigint").alias("loi"),
    )
    cells = q.select(
        "c_custkey", F.expr(_interleave_sql("lai", "loi", div="div")).alias("cell")
    )
    gh = cells.select(
        "c_custkey",
        F.concat(
            *[F.expr(_gh_char_sql("cell", c, div="div")) for c in range(1, 7)]
        ).alias("geohash6"),
    )
    return gh.groupBy(F.substring("geohash6", 1, 3).alias("gh3")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.countDistinct(F.substring("geohash6", 1, 5)).alias("n_subcells5"),
    )


# ---------------------------------------------------------------------------
# #291 bucketed range join (interval containment as an equi-join)
# ---------------------------------------------------------------------------

_RB_HALF = 100_000   # interval half-width, cents ($1000)
_RB_W = 200_000      # bucket width = full interval width -> <=2 buckets/anchor
_RB_ANCHORS = 64


@query(
    "q_range_bucket_join",
    oracle=f"""
        WITH o AS (
            SELECT o_orderkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
            FROM orders
        ),
        a AS (
            SELECT o_orderkey AS aid,
                   GREATEST(c - {_RB_HALF}, 0) AS lo,
                   c + {_RB_HALF} AS hi
            FROM (
                SELECT o_orderkey, c,
                       ROW_NUMBER() OVER (
                           ORDER BY CAST(('0x' || SUBSTR(
                               MD5(CAST(o_orderkey AS VARCHAR)), 1, 13))
                               AS BIGINT), o_orderkey) AS rn
                FROM o
            ) WHERE rn <= {_RB_ANCHORS}
        )
        SELECT a.aid AS anchor_id, a.lo AS lo_cents, a.hi AS hi_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(o.c) AS BIGINT) AS sum_cents
        FROM a JOIN o ON o.c BETWEEN a.lo AND a.hi
        GROUP BY 1, 2, 3
    """,
    operators=(17, 23, 30, 291),
    doc=f"Bucketed range join (#291): {_RB_ANCHORS} md5-sampled anchor "
    f"orders each define a ±${_RB_HALF // 100} price interval, and the "
    "query counts/sums every order falling inside each interval. The "
    "ORACLE is the plain theta join (BETWEEN — a nested-loop whose "
    "cost is |probe|×|intervals|); the Spark plan decomposes each "
    f"interval into its <=2 covering width-{_RB_W} integer buckets "
    "(width == interval span bounds the fanout), equi-joins probe "
    "bucket = floor(cents/width) against the exploded interval "
    "buckets, and re-checks BETWEEN as a residual — a hash-exact pass "
    "proves the decomposition lossless. This is THE pattern that "
    "makes tolerance/band joins linear at scale: both sides shuffle "
    "by bucket (co-partitioned equi-join, no broadcast required, no "
    "n×m pair blowup), each probe row lands in exactly one bucket so "
    "no dedup pass is needed, and skewed buckets fall back to the "
    "#84 salting discipline. Everything stays integer cents "
    "(ROUND(×100) is exact on 2-decimal prices; floor-div on "
    "non-negative cents agrees between Spark `div` and DuckDB `//` — "
    "the GREATEST(lo, 0) clamp exists because they disagree on "
    "negatives).",
)
def q_range_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("c"),
    )
    word = (
        F.conv(
            F.substring(
                F.md5(F.col("o_orderkey").cast("string").cast("binary")), 1, 13
            ),
            16,
            10,
        )
        .cast("long")
    )
    # TakeOrdered top-64, not a global-window row_number: the sample
    # must never become a single-partition sort of |orders|.
    anchors = (
        o.select(F.col("o_orderkey").alias("aid"), "c", word.alias("w"))
        .orderBy("w", "aid")
        .limit(_RB_ANCHORS)
        .select(
            "aid",
            F.greatest(F.col("c") - _RB_HALF, F.lit(0)).alias("lo"),
            (F.col("c") + _RB_HALF).alias("hi"),
        )
    )
    abuck = anchors.select(
        "aid",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.expr(f"lo div {_RB_W}"), F.expr(f"hi div {_RB_W}")
            )
        ).alias("bucket"),
    )
    probe = o.select("c", F.expr(f"c div {_RB_W}").alias("bucket"))
    return (
        probe.join(abuck, "bucket")
        .filter(F.col("c").between(F.col("lo"), F.col("hi")))
        .groupBy("aid", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("c").cast("bigint").alias("sum_cents"),
        )
        .select(
            F.col("aid").alias("anchor_id"),
            F.col("lo").alias("lo_cents"),
            F.col("hi").alias("hi_cents"),
            "n_orders",
            "sum_cents",
        )
    )
