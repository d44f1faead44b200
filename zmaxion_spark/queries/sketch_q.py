"""Round-3 sixth wave — SURVEY.md §2.19 (#185–#187): deterministic
Count-Min sketch, declarative data-quality constraints, Z-order
re-clustering of a logged table.

The Count-Min sketch here is the engineered-parity cousin of the
repo's md5 minhash (functions/dedup.py): hash functions are
md5-derived so DuckDB reproduces the ENTIRE sketch — and therefore
the estimates — bit-exactly. The sketch is a tiny (d×w) aggregate
that merges by addition, the property that matters at 100 TB:
executors build partial sketches map-side, one reduce of d·w
counters, never a per-key shuffle of the heavy stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.registry import query

# Count-Min geometry: d hash rows × w buckets. 4×512 counters = 16 KB
# of state for any input cardinality; error ≤ 2N/w with prob 1-2^-d.
_D, _W = 4, 512


def _cms_bucket(j: int, key: Column) -> Column:
    """Row-j bucket for a key: md5-derived (DuckDB-reproducible) —
    first 8 hex chars as an int, mod the sketch width."""
    h = F.md5(F.concat(F.lit(f"cms{j}:"), key.cast("string")).cast("binary"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _W).alias("b")


def _sql_bucket(j: str, key_expr: str) -> str:
    return (
        f"CAST(('0x' || SUBSTR(MD5('cms' || {j} || ':' || {key_expr}), 1, 8)) "
        f"AS BIGINT) % {_W}"
    )


@query(
    "q_countmin_sketch",
    oracle=f"""
        WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
        js AS (SELECT UNNEST(RANGE({_D})) AS j),
        sketch AS (
            SELECT j, {_sql_bucket('j', 'k')} AS b, COUNT(*) AS c
            FROM ev CROSS JOIN js GROUP BY 1, 2
        ),
        probes AS (
            SELECT CAST(user_id AS VARCHAR) AS k, user_id,
                   COUNT(*) AS exact_n
            FROM events WHERE user_id % 7 = 0 GROUP BY 1, 2
        ),
        pb AS (
            SELECT p.user_id, p.exact_n, js.j,
                   {_sql_bucket('js.j', 'p.k')} AS b
            FROM probes p CROSS JOIN js
        )
        SELECT pb.user_id,
               pb.exact_n,
               MIN(s.c) AS est_n,
               MIN(s.c) - pb.exact_n AS overcount
        FROM pb JOIN sketch s ON s.j = pb.j AND s.b = pb.b
        GROUP BY pb.user_id, pb.exact_n
    """,
    operators=(26, 185),
    doc=f"Count-Min sketch (#185): {_D}x{_W} md5-hashed counters over "
    "the event stream keyed by user, then point estimates (min over "
    "rows) for a deterministic probe set, reported against exact "
    "counts. The sketch is hash-exact against DuckDB — both engines "
    "build the identical sketch, so the one-sided overcount column is "
    "graded too (CMS never underestimates). Scale shape: the d bucket "
    "assignments ride ONE scan (posexploded struct array), partial "
    f"sketches merge additively map-side, and the reduce is d·w={_D * _W} "
    "counters regardless of input size — the mergeable-sketch "
    "discipline that lets 1000 executors summarize 100 TB into 16 KB.",
)
def q_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    key = F.col("user_id")
    jb = F.explode(
        F.array(
            *[
                F.struct(F.lit(j).alias("j"), _cms_bucket(j, key))
                for j in range(_D)
            ]
        )
    ).alias("jb")
    sketch = (
        ev.select(jb)
        .groupBy(F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        ev.filter(F.col("user_id") % 7 == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    pb = probes.select("user_id", "exact_n", jb).select(
        "user_id", "exact_n", F.col("jb.j").alias("j"), F.col("jb.b").alias("b")
    )
    return (
        pb.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("est_n"))
        .select(
            "user_id",
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n")).alias("overcount"),
        )
    )


@query(
    "q_constraint_suite",
    oracle="""
        WITH r AS (
            SELECT 'not_null(o_custkey)' AS constraint_name,
                   CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
                        AS BIGINT) AS violations
            UNION ALL
            SELECT 'in_range(o_totalprice)',
                   CAST((SELECT COUNT(*) FROM orders
                         WHERE o_totalprice IS NULL
                            OR o_totalprice NOT BETWEEN 0 AND 1000000)
                        AS BIGINT)
            UNION ALL
            SELECT 'isin(o_orderstatus)',
                   CAST((SELECT COUNT(*) FROM orders
                         WHERE o_orderstatus IS NULL
                            OR o_orderstatus NOT IN ('O', 'F', 'P'))
                        AS BIGINT)
            UNION ALL
            SELECT 'is_unique(o_orderkey)',
                   CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey)
                         FROM orders) AS BIGINT)
            UNION ALL
            SELECT 'fk(o_custkey)',
                   CAST((SELECT COUNT(*) FROM orders o
                         WHERE o.o_custkey IS NOT NULL
                           AND NOT EXISTS (SELECT 1 FROM customer c
                                           WHERE c.c_custkey = o.o_custkey))
                        AS BIGINT)
        )
        SELECT constraint_name, violations, violations = 0 AS passed FROM r
    """,
    operators=(186,),
    doc="Declarative constraint suite (#186, functions/quality.py — "
    "the Deequ pattern): five constraints on orders declared once "
    "(not-null, range, allowed values, key uniqueness, FK to "
    "customer), evaluated as ONE shared aggregation pass for all "
    "row-local rules + one distinct-count + one broadcast anti-join "
    "probe. The report (constraint, violations, passed) is the gate a "
    "txlog publisher (#175) runs before committing a version. At "
    "100 TB the row-local rules cost one scan total — adding a "
    "constraint adds a counter, not a pass.",
)
def q_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zmaxion_spark.functions.quality import Check

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        Check("orders_publish_gate")
        .not_null("o_custkey")
        .in_range("o_totalprice", 0, 1_000_000)
        .isin("o_orderstatus", "O", "F", "P")
        .is_unique("o_orderkey")
        .fk("o_custkey", customer, "c_custkey")
        .run(orders)
    )


# ---------------------------------------------------------------------------
# #204 KMV (k-minimum-values) theta sketch — mergeable distinct counts
# ---------------------------------------------------------------------------

_KMV_K = 64
_TWO52 = 4503599627370496.0  # 2^52 — 13 md5 hex chars normalize to [0,1)


@query(
    "q_kmv_distinct",
    oracle=f"""
        WITH keys AS (
            SELECT DISTINCT c_mktsegment AS seg, c_custkey AS k FROM customer
        ),
        hashed AS (
            SELECT seg, k,
                   CAST(('0x' || SUBSTR(MD5('kmv:' || CAST(k AS VARCHAR)), 1, 13))
                        AS BIGINT) / {int(_TWO52)} AS h
            FROM keys
        ),
        sk AS (
            SELECT seg, h,
                   ROW_NUMBER() OVER (PARTITION BY seg ORDER BY h) AS rn
            FROM hashed QUALIFY rn <= {_KMV_K}
        ),
        per_seg AS (
            SELECT s.seg,
                   (SELECT COUNT(*) FROM keys WHERE keys.seg = s.seg) AS exact_n,
                   ROUND(({_KMV_K} - 1) / MAX(CASE WHEN rn = {_KMV_K} THEN h END), 9)
                       AS est_n
            FROM sk s GROUP BY s.seg
        ),
        merged AS (
            SELECT 'ALL' AS seg,
                   (SELECT COUNT(*) FROM keys) AS exact_n,
                   ROUND(({_KMV_K} - 1) / MAX(CASE WHEN grn = {_KMV_K} THEN h END), 9)
                       AS est_n
            FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS grn FROM sk)
        ),
        unioned AS (SELECT * FROM per_seg UNION ALL SELECT * FROM merged)
        SELECT seg, exact_n, est_n,
               ROUND(ABS(est_n - exact_n) / exact_n, 9) AS rel_err
        FROM unioned
    """,
    operators=(26, 204),
    doc=f"KMV/theta distinct-count sketch (#204): per market segment keep "
    f"the {_KMV_K} smallest md5-normalized hashes of the key domain; the "
    f"distinct estimate is (k-1)/h_k. The md5 hash makes the whole sketch "
    "engine-reproducible, so the oracle grades the exact sketch values, "
    "and the 'ALL' row is computed by MERGING the per-segment sketches "
    "(union of k-min sets re-cut to k) — the property that matters at "
    "100 TB: executors sketch partitions independently, the reduce is "
    f"k={_KMV_K} doubles per group, and union/intersection cardinalities "
    "come from sketch algebra, never a re-scan. Estimates land within "
    "~1/sqrt(k) of exact; both exact_n and est_n are graded columns.",
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    keys = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("seg"), F.col("c_custkey").alias("k"))
        .distinct()
    )
    h = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("kmv:"), F.col("k").cast("string")).cast("binary")), 1, 13),
            16,
            10,
        ).cast("long")
        / F.lit(_TWO52)
    ).alias("h")
    hashed = keys.select("seg", h)
    sk = (
        hashed.withColumn("rn", F.row_number().over(Window.partitionBy("seg").orderBy("h")))
        .filter(F.col("rn") <= _KMV_K)
    )
    exact = keys.groupBy("seg").agg(F.count(F.lit(1)).alias("exact_n"))
    per_seg = (
        sk.groupBy("seg")
        .agg(
            F.round(
                (_KMV_K - 1) / F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))), 9
            ).alias("est_n")
        )
        .join(exact, "seg")
        .select("seg", "exact_n", "est_n")
    )
    merged_kth = (
        sk.withColumn("grn", F.row_number().over(Window.orderBy("h")))
        .groupBy()
        .agg(
            F.round(
                (_KMV_K - 1) / F.max(F.when(F.col("grn") == _KMV_K, F.col("h"))), 9
            ).alias("est_n")
        )
    )
    exact_all = keys.groupBy().agg(F.count(F.lit(1)).alias("exact_n"))
    merged = (
        exact_all.crossJoin(merged_kth)
        .select(F.lit("ALL").alias("seg"), "exact_n", "est_n")
    )
    return per_seg.unionByName(merged).select(
        "seg",
        "exact_n",
        "est_n",
        F.round(F.abs(F.col("est_n") - F.col("exact_n")) / F.col("exact_n"), 9).alias(
            "rel_err"
        ),
    )


# ---------------------------------------------------------------------------
# #210 sketch-based join-cardinality estimation (theta intersection)
# ---------------------------------------------------------------------------

_JC_K = 128


@query(
    "q_join_cardinality",
    oracle=f"""
        WITH da AS (SELECT DISTINCT o_custkey AS k FROM orders),
        db AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 0),
        ha AS (SELECT k, CAST(('0x' || SUBSTR(MD5('jc:' || CAST(k AS VARCHAR)), 1, 13))
                             AS BIGINT) / 4503599627370496 AS h FROM da),
        hb AS (SELECT k, CAST(('0x' || SUBSTR(MD5('jc:' || CAST(k AS VARCHAR)), 1, 13))
                             AS BIGINT) / 4503599627370496 AS h FROM db),
        ka AS (SELECT h FROM ha QUALIFY ROW_NUMBER() OVER (ORDER BY h) <= {_JC_K}),
        kb AS (SELECT h FROM hb QUALIFY ROW_NUMBER() OVER (ORDER BY h) <= {_JC_K}),
        ku AS (
            SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
            FROM (SELECT h FROM ka UNION SELECT h FROM kb)
            QUALIFY rn <= {_JC_K}
        ),
        theta AS (SELECT MAX(CASE WHEN rn = {_JC_K} THEN h END) AS th FROM ku),
        inter AS (
            SELECT COUNT(*) AS n_both
            FROM ku
            WHERE EXISTS (SELECT 1 FROM ka WHERE ka.h = ku.h)
              AND EXISTS (SELECT 1 FROM kb WHERE kb.h = ku.h)
        ),
        mult AS (
            SELECT CAST(COUNT(*) AS DOUBLE)
                   / COUNT(DISTINCT o_custkey) AS avg_mult
            FROM orders
        ),
        exact AS (
            SELECT COUNT(*) AS exact_join_rows,
                   COUNT(DISTINCT o.o_custkey) AS exact_overlap
            FROM orders o JOIN customer c
              ON o.o_custkey = c.c_custkey AND c.c_acctbal > 0
        )
        SELECT exact.exact_overlap,
               ROUND(CAST(n_both AS DOUBLE) / {_JC_K}
                     * (({_JC_K} - 1) / th), 9) AS est_overlap,
               exact.exact_join_rows,
               ROUND(CAST(n_both AS DOUBLE) / {_JC_K}
                     * (({_JC_K} - 1) / th) * avg_mult, 9) AS est_join_rows
        FROM exact, theta, inter, mult
    """,
    operators=(26, 204, 210),
    doc=f"Join-cardinality estimation from theta sketches (#210): the "
    "cost-based-optimizer move at 100 TB — estimate |A join B| WITHOUT "
    "running the join. Both join-key domains are KMV-sketched "
    f"(k={_JC_K} smallest md5 hashes), the union sketch's theta and "
    "the count of union survivors present in BOTH sketches give "
    "Jaccard and union estimates, hence the key-overlap estimate; "
    "multiplying by the fact side's average key multiplicity predicts "
    "the join output size. md5 hashing makes the sketches "
    "engine-reproducible, so est_* columns are graded hash-exact "
    "alongside the exact truth they approximate. Scale shape: two "
    "sketch builds (mergeable, map-side) + O(k) driver-light algebra "
    "vs the full shuffle the estimate avoids; the exact columns exist "
    "only to grade the estimator.",
)
def q_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def _h(k):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("jc:"), k.cast("string")).cast("binary")),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            / F.lit(4503599627370496.0)
        )

    da = orders.select(F.col("o_custkey").alias("k")).distinct()
    db = (
        customer.filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    # NOTE (r12, measured): rewriting these K-smallest sketch builds as
    # orderBy().limit() (one TakeOrderedAndProject per site, plan 103
    # -> 87 nodes) was A/B'd and REJECTED as a wash-to-slightly-negative
    # (old min 0.84s vs new 0.96s, old won 3/5 cycles). The window
    # shape is NOT the single-task straggler it reads as: Spark's
    # LimitPushDownThroughWindow already inserts a TakeOrderedAndProject
    # below the window, so the un-partitioned row_number only ever sees
    # K rows — at any scale.
    ka = (
        da.select(_h(F.col("k")).alias("h"))
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= _JC_K)
        .select("h")
    )
    kb = (
        db.select(_h(F.col("k")).alias("h"))
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= _JC_K)
        .select("h")
    )
    ku = (
        ka.union(kb)
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= _JC_K)
    )
    theta = ku.groupBy().agg(
        F.max(F.when(F.col("rn") == _JC_K, F.col("h"))).alias("th")
    )
    inter = (
        ku.join(ka, "h", "left_semi")
        .join(kb, "h", "left_semi")
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    mult = orders.groupBy().agg(
        (
            F.count(F.lit(1)).cast("double") / F.countDistinct("o_custkey")
        ).alias("avg_mult")
    )
    exact = (
        orders.join(
            customer.filter(F.col("c_acctbal") > 0),
            orders.o_custkey == customer.c_custkey,
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("exact_join_rows"),
            F.countDistinct("o_custkey").alias("exact_overlap"),
        )
    )
    est_overlap = (
        F.col("n_both").cast("double") / _JC_K * ((_JC_K - 1) / F.col("th"))
    )
    return (
        exact.crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(inter))
        .crossJoin(F.broadcast(mult))
        .select(
            "exact_overlap",
            F.round(est_overlap, 9).alias("est_overlap"),
            "exact_join_rows",
            F.round(est_overlap * F.col("avg_mult"), 9).alias("est_join_rows"),
        )
    )


# ---------------------------------------------------------------------------
# #219 hash-sample quantile estimation (BlinkDB-style deterministic sample)
# ---------------------------------------------------------------------------

_QS_RATE = 16  # keep keys where md5-bucket % 16 == 0 (1/16 sample)
_QS_QS = (25, 50, 90, 99)  # percentiles, as integers for exact rank math


@query(
    "q_quantile_sample",
    oracle=f"""
        WITH full_r AS (
            SELECT o_totalprice AS v,
                   ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS r,
                   COUNT(*) OVER () AS n
            FROM orders
        ),
        samp_r AS (
            SELECT o_totalprice AS v,
                   ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS r,
                   COUNT(*) OVER () AS n
            FROM orders
            WHERE CAST(('0x' || SUBSTR(MD5('qs:' || CAST(o_orderkey AS VARCHAR)),
                                       1, 8)) AS BIGINT) % {_QS_RATE} = 0
        ),
        qs AS (SELECT UNNEST(ARRAY{list(_QS_QS)}) AS q),
        -- Two LINEAR probes joined on q. A single
        -- qs x full_r x samp_r cross join is O(n * sample) — measured
        -- as a 5x10^11-row product at sf1 that wedged the oracle for
        -- 20+ minutes while the small-sf gate sailed through it.
        fq AS (
            SELECT qs.q AS q,
                   MAX(CASE WHEN f.r = GREATEST(1, (qs.q * f.n + 99) // 100)
                            THEN f.v END) AS exact_v
            FROM qs CROSS JOIN full_r f GROUP BY qs.q
        ),
        sq AS (
            SELECT qs.q AS q,
                   MAX(CASE WHEN s.r = GREATEST(1, (qs.q * s.n + 99) // 100)
                            THEN s.v END) AS est_v
            FROM qs CROSS JOIN samp_r s GROUP BY qs.q
        )
        SELECT fq.q, fq.exact_v, sq.est_v,
               ROUND(ABS(sq.est_v - fq.exact_v) / fq.exact_v, 9) AS rel_err
        FROM fq JOIN sq ON fq.q = sq.q
    """,
    operators=(26, 219),
    doc=f"Hash-sample quantile estimation (#219): a deterministic "
    f"1/{_QS_RATE} sample (md5 of the row key — same rows in every "
    "engine, every run, every cluster size) is sorted once and its "
    "discrete quantiles (rank ceil(q*n/100), ties by key) estimate the "
    "full-data quantiles; both are graded, plus the realized relative "
    "error. The BlinkDB/approximate-query-processing discipline: at "
    "100 TB the full sort is the thing you cannot afford — the sample "
    f"sort costs 1/{_QS_RATE} the shuffle, the estimate error scales "
    "as O(1/sqrt(sample)), and because the sample is a pure hash "
    "predicate it pushes into the scan and composes with every other "
    "operator. Integer rank arithmetic keeps the whole comparison "
    "hash-exact.",
)
def q_quantile_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")

    def ranked(df):
        w = Window.orderBy("o_totalprice", "o_orderkey")
        return df.select(
            F.col("o_totalprice").alias("v"),
            F.row_number().over(w).alias("r"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )

    samp = o.filter(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("qs:"), F.col("o_orderkey").cast("string")).cast(
                        "binary"
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _QS_RATE
        == 0
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _QS_QS])).alias("q")
    )

    def pick(df, out):
        r = ranked(df)
        return (
            qs.crossJoin(r)
            .filter(
                F.col("r")
                == F.greatest(F.lit(1), F.expr("(q * n + 99) div 100"))
            )
            .select("q", F.col("v").alias(out))
        )

    exact = pick(o, "exact_v")
    est = pick(samp, "est_v")
    return exact.join(est, "q").select(
        "q",
        "exact_v",
        "est_v",
        F.round(
            F.abs(F.col("est_v") - F.col("exact_v")) / F.col("exact_v"), 9
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# #26/#85 approx_top_k — Spark 4.1's built-in top-k sketch, graded
# ---------------------------------------------------------------------------

_ATK_K = 10
_ATK_CAP = 100_000  # maxItemsTracked


@query(
    "q_approx_topk",
    oracle=f"""
        WITH toks AS (
            SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
        ),
        counts AS (
            SELECT token, COUNT(*) AS n FROM toks
            WHERE token <> '' GROUP BY token
        )
        SELECT token, CAST(n AS BIGINT) AS n,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS BIGINT)
                   AS rank
        FROM counts
        ORDER BY n DESC, token
        LIMIT {_ATK_K}
    """,
    operators=(26, 85),
    doc=f"approx_top_k graded against exact truth (#26/#85): Spark "
    "4.1's built-in frequent-items sketch tracks the corpus token "
    f"stream with capacity {_ATK_CAP}; above the distinct-token "
    "cardinality of the fixtures the tracked counts are EXACT, so the "
    f"sketch's top-{_ATK_K} — re-sorted deterministically by (count "
    "desc, token) to neutralize tie order, which the sketch does not "
    "define — must hash-match DuckDB's exact top-k. The production "
    "posture this pins: approx_top_k is a constant-size mergeable "
    "aggregate (partial sketches combine map-side, one reduce of "
    "O(capacity) state), replacing the full token groupBy + global "
    "sort with a single pass at 100 TB; when cardinality exceeds "
    "capacity the counts degrade gracefully to estimates with "
    "documented error instead of failing.",
)
def q_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    # Fetch the sketch's ENTIRE tracked set (k = capacity), not a
    # truncated top-4k: approx_top_k's own tie order at a truncation
    # boundary is undefined, so a tie group straddling the fetch
    # cutoff could retain a lexicographically different member than
    # the oracle's (n DESC, token) order picks. With no boundary there
    # is no straddle; the deterministic re-sort below owns ALL
    # ordering. Still O(capacity) — constant, mergeable state.
    sk = toks.agg(
        F.expr(f"approx_top_k(token, {_ATK_CAP}, {_ATK_CAP})").alias("tk")
    )
    items = sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("token"), F.col("e.count").cast("bigint").alias("n")
    )
    w = Window.orderBy(F.col("n").desc(), "token")
    return (
        items.select(
            "token", "n", F.row_number().over(w).cast("bigint").alias("rank")
        )
        .filter(F.col("rank") <= _ATK_K)
    )


# ---------------------------------------------------------------------------
# #323 Bloom-filter sizing planner (the m/k design table)
# ---------------------------------------------------------------------------

_BP_N = (1_000, 100_000, 10_000_000)        # expected key counts
_BP_P = ("0.01", "0.001", "0.0001")          # target false-positive rates


@query(
    "q_bloom_plan",
    oracle=f"""
        WITH n_grid AS (SELECT UNNEST({list(_BP_N)}) AS n),
        p_grid AS (SELECT UNNEST({list(_BP_P)}) AS p_txt),
        cfg AS (
            SELECT n, CAST(p_txt AS DOUBLE) AS p FROM n_grid CROSS JOIN p_grid
        ),
        sized AS (
            SELECT n, p,
                   CAST(CEIL(-CAST(n AS DOUBLE) * LN(p)
                             / (LN(CAST(2 AS DOUBLE))
                                * LN(CAST(2 AS DOUBLE)))) AS BIGINT) AS m_bits
            FROM cfg
        ),
        keyed AS (
            SELECT n, p, m_bits,
                   CAST(GREATEST(1, ROUND(CAST(m_bits AS DOUBLE) / n
                                          * LN(CAST(2 AS DOUBLE))))
                        AS BIGINT) AS k
            FROM sized
        )
        SELECT n, p, m_bits, k,
               CAST(m_bits // 8 AS BIGINT) AS bytes,
               CAST(CAST(
                   EXP(k * LN(1 - EXP(-CAST(k AS DOUBLE) * n / m_bits)))
                   AS DECIMAL(38,9)) AS DOUBLE) AS actual_fp
        FROM keyed
    """,
    operators=(188, 218, 323),
    doc="Bloom-filter sizing planner (#323): for a grid of expected "
    "key counts × target false-positive rates, the optimal bit count "
    "m = ⌈−n·ln p / ln²2⌉, hash count k = round(m/n·ln 2), byte "
    "budget, and the ACTUAL fp rate (1 − e^(−kn/m))^k the integerized "
    "(m, k) delivers — the design table behind the txlog bloom index "
    "(#188) and the measured-FP prefilter (#218), versioned and "
    "graded beside the operators it sizes (the #319 planner "
    "discipline: evaluated, not folklore'd). Every power rides "
    "EXP(k·LN(x)) so both engines execute one IEEE tree; p enters as "
    "a decimal STRING cast to double (a bare 0.001 literal is "
    "DECIMAL in DuckDB and poisons the division). Plan-time math — "
    "9 rows.",
    bench=False,
)
def q_bloom_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import itertools

    cfg = spark.createDataFrame(
        [(n, float(p)) for n, p in itertools.product(_BP_N, _BP_P)],
        "n bigint, p double",
    )
    ln2 = F.log(F.lit(2.0))
    m_bits = F.ceil(
        -F.col("n").cast("double") * F.log("p") / (ln2 * ln2)
    ).cast("bigint")
    sized = cfg.select("n", "p", m_bits.alias("m_bits"))
    k = F.greatest(
        F.lit(1).cast("bigint"),
        F.round(F.col("m_bits").cast("double") / F.col("n") * ln2).cast(
            "bigint"
        ),
    )
    keyed = sized.select("n", "p", "m_bits", k.alias("k"))
    fp = F.exp(
        F.col("k")
        * F.log(
            1
            - F.exp(
                -F.col("k").cast("double") * F.col("n") / F.col("m_bits")
            )
        )
    )
    return keyed.select(
        "n",
        "p",
        "m_bits",
        "k",
        F.expr("m_bits div 8").alias("bytes"),
        fp.cast("decimal(38,9)").cast("double").alias("actual_fp"),
    )


# ---------------------------------------------------------------------------
# #330 DDSketch: mergeable relative-error quantiles
# ---------------------------------------------------------------------------

_DD_ALPHA = "0.01"   # string-decimal literal (the #323 discipline)
_DD_QS = (50, 95, 99)
_DD_SLACK = "0.0102"  # alpha + integerization headroom


@query(
    "q_ddsketch_quantiles",
    oracle=f"""
        WITH g AS (
            SELECT CAST((1 + {_DD_ALPHA}) / (1 - {_DD_ALPHA}) AS DOUBLE) AS g
        ),
        buckets AS (
            SELECT l_returnflag,
                   CAST(CEIL(CAST(CAST(LN(l_extendedprice) / LN(g.g)
                                       AS DECIMAL(38,9)) AS DOUBLE))
                        AS BIGINT) AS bi,
                   COUNT(*) AS cnt
            FROM lineitem CROSS JOIN g
            WHERE l_extendedprice > 0
            GROUP BY 1, 2
        ),
        cum AS (
            SELECT l_returnflag, bi,
                   SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bi) AS c
            FROM buckets
        ),
        ntot AS (
            SELECT l_returnflag, CAST(SUM(cnt) AS BIGINT) AS n
            FROM buckets GROUP BY 1
        ),
        qs AS (SELECT UNNEST([{", ".join(str(q) for q in _DD_QS)}]) AS q),
        ranks AS (
            SELECT t.l_returnflag, qs.q, t.n,
                   CAST(CEIL(qs.q * t.n / CAST(100 AS DOUBLE)) AS BIGINT) AS r
            FROM ntot t CROSS JOIN qs
        ),
        bq AS (
            SELECT r.l_returnflag, r.q, r.n, r.r,
                   MIN(CASE WHEN c.c >= r.r THEN c.bi END) AS bi
            FROM ranks r JOIN cum c ON c.l_returnflag = r.l_returnflag
            GROUP BY 1, 2, 3, 4
        ),
        vcum AS (
            SELECT l_returnflag, l_extendedprice AS v,
                   SUM(COUNT(*)) OVER (PARTITION BY l_returnflag
                                       ORDER BY l_extendedprice) AS c
            FROM lineitem WHERE l_extendedprice > 0
            GROUP BY l_returnflag, l_extendedprice
        ),
        exactv AS (
            SELECT r.l_returnflag, r.q,
                   MIN(CASE WHEN v.c >= r.r THEN v.v END) AS exact_v
            FROM ranks r JOIN vcum v ON v.l_returnflag = r.l_returnflag
            GROUP BY 1, 2
        ),
        est AS (
            SELECT b.l_returnflag, b.q, b.n, e.exact_v,
                   CAST(CAST(2 * EXP(b.bi * LN(g.g)) / (g.g + 1)
                             AS DECIMAL(38,6)) AS DOUBLE) AS est_v
            FROM bq b
            JOIN exactv e ON e.l_returnflag = b.l_returnflag AND e.q = b.q
            CROSS JOIN g
        )
        SELECT l_returnflag, CAST(q AS INT) AS q, n, exact_v,
               CAST(ABS(est_v - exact_v) / exact_v <= {_DD_SLACK} AS INT)
                   AS est_within_alpha
        FROM est
        ORDER BY l_returnflag, q
    """,
    operators=(26, 330),
    doc="DDSketch relative-error quantiles (#330), the Datadog-paper "
    "mergeable sketch completing the sketch family (HLL #140, KMV "
    "#204, CMS #185, approx-rank #26): values land in logarithmic "
    "buckets i = ceil(ln(x)/ln(gamma)) with gamma = (1+a)/(1-a), "
    "a=1%, so EVERY quantile estimate 2*gamma^i/(gamma+1) is within "
    "a relative error of the true rank value — a guarantee uniform "
    "across the distribution, where percentile_approx's rank-error "
    "bound is not. Bucket counts add, so the sketch merges across "
    "executors/days with zero loss (the groupBy IS the merge). "
    "Graded per (returnflag, p50/p95/p99): exact rank-value "
    "anchors plus the in-contract flag at alpha+integerization slack "
    f"{_DD_SLACK}. Parity: the ln-ratio bucket index quantizes "
    "through DECIMAL(38,9) BEFORE ceil on both engines (absorbing "
    "libm last-ulp drift); the estimate through DECIMAL(38,6) before "
    "the comparison. Scale: |buckets| is ~log-gamma of the value "
    "range (hundreds), so state is tiny and map-side combined; the "
    "exact anchor's value-histogram is the calibration cost, not the "
    "production path.",
)
def q_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice") > 0)
        # Round 12 (guide §2.5, per-query pin the r11 global-floor
        # experiment pointed at): AQE coalesced the (flag, price)
        # census exchange by input bytes, bottlenecking the cumulative
        # histogram build. AQE-exempt user repartition on the census
        # keys keeps the aggregate at full width (the agg reuses this
        # exchange; the 3-partition per-flag window after it is
        # inherent). A/B ×5 min 2.59 -> 2.04 s, new < old in 4/5
        # cycles. The same pin on q_conformance_fitness was measured
        # and REJECTED (wash — OPTIMIZATION_r12.md).
        .repartition(
            spark.sparkContext.defaultParallelism, "l_returnflag", "l_extendedprice"
        )
    )
    g = float((1 + 0.01) / (1 - 0.01))  # matches the SQL double exactly
    g_lit = (F.lit(1.0) + F.lit(0.01)) / (F.lit(1.0) - F.lit(0.01))
    bi = F.ceil(
        (F.ln("l_extendedprice") / F.ln(g_lit))
        .cast("decimal(38,9)")
        .cast("double")
    ).cast("long")
    buckets = li.groupBy("l_returnflag", bi.alias("bi")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wc = Window.partitionBy("l_returnflag").orderBy("bi").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = buckets.select(
        "l_returnflag", "bi", F.sum("cnt").over(wc).alias("c")
    )
    ntot = buckets.groupBy("l_returnflag").agg(
        F.sum("cnt").cast("bigint").alias("n")
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _DD_QS])).alias("q")
    )
    ranks = ntot.crossJoin(F.broadcast(qs)).select(
        "l_returnflag",
        "q",
        "n",
        F.ceil(F.col("q") * F.col("n") / F.lit(100.0)).cast("long").alias("r"),
    )
    bq = (
        ranks.join(cum, "l_returnflag")
        .groupBy("l_returnflag", "q", "n", "r")
        .agg(F.min(F.when(F.col("c") >= F.col("r"), F.col("bi"))).alias("bi"))
    )
    vcum = (
        li.groupBy("l_returnflag", F.col("l_extendedprice").alias("v"))
        .agg(F.count(F.lit(1)).alias("vc"))
        .select("l_returnflag", "v", F.sum("vc").over(
            Window.partitionBy("l_returnflag").orderBy("v").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("c"))
    )
    exactv = (
        ranks.join(vcum, "l_returnflag")
        .groupBy("l_returnflag", "q")
        .agg(F.min(F.when(F.col("c") >= F.col("r"), F.col("v"))).alias("exact_v"))
    )
    est_v = (
        (F.lit(2.0) * F.exp(F.col("bi") * F.ln(g_lit)) / (g_lit + F.lit(1.0)))
        .cast("decimal(38,6)")
        .cast("double")
    )
    est = bq.join(exactv, ["l_returnflag", "q"]).select(
        "l_returnflag", "q", "n", "exact_v", est_v.alias("est_v")
    )
    return est.select(
        "l_returnflag",
        F.col("q").cast("int").alias("q"),
        "n",
        "exact_v",
        (
            F.abs(F.col("est_v") - F.col("exact_v")) / F.col("exact_v")
            <= F.lit(float(_DD_SLACK))
        )
        .cast("int")
        .alias("est_within_alpha"),
    ).orderBy("l_returnflag", "q")


# ---------------------------------------------------------------------------
# #345 ams_f2 — AMS second-moment (self-join size) sketch
# ---------------------------------------------------------------------------

_AMS_S = 32  # estimators (md5 nibble high bits)
_AMS_G = 8   # median-of-means groups (4 estimators each)


@query(
    "q_ams_f2",
    oracle=f"""
        WITH freq AS (
            SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS f
            FROM lineitem GROUP BY l_partkey
        ),
        exact AS (SELECT CAST(SUM(f * f) AS BIGINT) AS f2 FROM freq),
        sgn AS (
            SELECT s.s, fr.f,
                   CASE WHEN SUBSTR(MD5('ams:' || CAST(fr.k AS VARCHAR)),
                                    CAST(s.s AS INT), 1)
                             IN ('8', '9', 'a', 'b', 'c', 'd', 'e', 'f')
                        THEN 1 ELSE -1 END AS sg
            FROM freq fr
            CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, {_AMS_S})) AS s) s
        ),
        est AS (
            SELECT s, CAST(SUM(sg * f) AS BIGINT) AS z
            FROM sgn GROUP BY s
        ),
        grp AS (
            SELECT (s - 1) // {_AMS_S // _AMS_G} AS g,
                   CAST(SUM(z * z) AS DOUBLE) / {_AMS_S // _AMS_G} AS mean_est
            FROM est GROUP BY g
        ),
        rk AS (
            SELECT mean_est,
                   ROW_NUMBER() OVER (ORDER BY mean_est) AS rn
            FROM grp
        ),
        med AS (
            SELECT CAST(SUM(CAST(mean_est AS DECIMAL(38,9))) AS DOUBLE)
                       / COUNT(*) AS est_f2
            FROM rk WHERE rn IN ({_AMS_G // 2}, {_AMS_G // 2 + 1})
        )
        SELECT e.f2 AS exact_f2,
               ROUND(m.est_f2, 9) AS est_f2,
               ROUND(ABS(m.est_f2 - e.f2) / e.f2, 9) AS rel_err,
               CAST(ABS(m.est_f2 - e.f2) / e.f2 <= 1.0 AS INT) AS in_contract
        FROM exact e CROSS JOIN med m
    """,
    operators=(24, 26, 47, 345),
    doc=f"AMS second-moment sketch (#345, Alon–Matias–Szegedy, STOC "
    "1996 — public): F2 = Σ freq(k)² — the SELF-JOIN SIZE of lineitem "
    "on partkey, the quantity a cost-based optimizer needs to price "
    "every equi-join and the repo's join-cardinality sketch (#210) "
    f"approximates from samples. {_AMS_S} ±1-sign estimators (sign = "
    "high bit of md5 nibble s, engine-reproducible like every sketch "
    f"in this module), z_s = Σ sign_s(k)·freq(k), mean of {_AMS_S // _AMS_G} "
    f"squared estimators per group, median of the {_AMS_G} group means "
    "(ranks 4+5 averaged through one decimal sum). The classic "
    "factor-bound contract |est−F2|/F2 <= 1 is a GRADED column. "
    "Everything to the group means is exact BIGINT algebra — "
    "estimator sums commute, so executors sketch partitions "
    "independently and the merge is 32 integers; the exact F2 twin "
    "costs one groupBy that the sketch exists to avoid at 100 TB.",
    bench=False,
)
def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    freq = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    exact = freq.agg(
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("exact_f2")
    )
    s_ids = spark.range(1, _AMS_S + 1).select(F.col("id").cast("int").alias("s"))
    sgn = (
        freq.withColumn(
            "h", F.md5(F.concat(F.lit("ams:"), F.col("l_partkey").cast("string")))
        )
        .crossJoin(F.broadcast(s_ids))
        .select(
            "s",
            "f",
            F.when(
                F.expr("substring(h, s, 1)").isin(
                    "8", "9", "a", "b", "c", "d", "e", "f"
                ),
                1,
            )
            .otherwise(-1)
            .alias("sg"),
        )
    )
    est = sgn.groupBy("s").agg(
        F.sum(F.col("sg") * F.col("f")).cast("bigint").alias("z")
    )
    per_g = _AMS_S // _AMS_G
    grp = (
        est.groupBy(F.expr(f"(s - 1) div {per_g}").alias("g"))
        .agg(
            (F.sum(F.col("z") * F.col("z")).cast("double") / per_g).alias(
                "mean_est"
            )
        )
    )
    from pyspark.sql import Window as W

    rk = grp.select(
        "mean_est", F.row_number().over(W.orderBy("mean_est")).alias("rn")
    )
    med = rk.filter(F.col("rn").isin(_AMS_G // 2, _AMS_G // 2 + 1)).agg(
        (
            F.sum(F.col("mean_est").cast("decimal(38,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("est_f2")
    )
    rel = F.abs(F.col("est_f2") - F.col("exact_f2")) / F.col("exact_f2")
    return exact.crossJoin(med).select(
        "exact_f2",
        F.round("est_f2", 9).alias("est_f2"),
        F.round(rel, 9).alias("rel_err"),
        (rel <= 1.0).cast("int").alias("in_contract"),
    )
