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
