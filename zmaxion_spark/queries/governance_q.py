"""Round-4 wave — SURVEY.md §2.20 (#202, #203, #208): data-governance
passes a 100 TB corpus pipeline runs before publishing a dataset:
k-anonymity auditing, differentially-private release counts, and
canonical-URL deduplication.

Parity discipline (same as the md5 minhash in functions/dedup.py):
every "random" quantity is md5-derived at plan level, so DuckDB
reproduces the exact noise draw / hash and the oracle comparison is
hash-exact, not statistical. Transcendentals (LN) ride the repo's
ROUND(..., 9) rule (queries/scalar.py precedent) to absorb last-ulp
libm drift between JVM and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.registry import query

# ---------------------------------------------------------------------------
# #202 k-anonymity audit
# ---------------------------------------------------------------------------

_K = 5


@query(
    "q_k_anonymity",
    oracle=f"""
        SELECT c_nationkey,
               c_mktsegment,
               CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_bucket,
               COUNT(*) AS n,
               COUNT(DISTINCT CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END)
                   AS l_distinct,
               CAST(COUNT(*) >= {_K} AS INT) AS k_anon,
               ROUND(CAST(1.0 AS DOUBLE) / COUNT(*), 9) AS reident_risk
        FROM customer
        GROUP BY 1, 2, 3
    """,
    operators=(202,),
    doc=f"k-anonymity audit (#202): every quasi-identifier class "
    "(nation, market segment, account-balance band) is scored for "
    "re-identification risk — class size n, l-diversity of the "
    "sensitive high-balance flag, a k>={_K} pass flag and the 1/n "
    "linkage risk. The release gate (suppress classes with k_anon=0) "
    "is then one filter. Scale shape: a single hash aggregate over "
    "the QI columns — the audit costs exactly one groupBy shuffle of "
    "narrow keys no matter how wide the table is, and composes with "
    "the constraint suite (#186) as a pre-publish gate.",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    sensitive = F.when(F.col("c_acctbal") > 5000, F.lit(1)).otherwise(F.lit(0))
    return (
        c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 2000).cast("bigint").alias("bal_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(sensitive).alias("l_distinct"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_bucket",
            "n",
            "l_distinct",
            (F.col("n") >= _K).cast("int").alias("k_anon"),
            F.round(F.lit(1.0) / F.col("n"), 9).alias("reident_risk"),
        )
    )


# ---------------------------------------------------------------------------
# #203 differentially-private noisy counts
# ---------------------------------------------------------------------------

_EPS = 1.0
_TWO52 = 4503599627370496.0  # 2^52 — 13 hex chars of md5 normalize to [0,1)


def _sql_unit(expr: str) -> str:
    """md5-derived uniform in [0,1) from a string expression (DuckDB)."""
    # NB: integer divisor — DuckDB '/' on integers is float division and
    # yields DOUBLE; a 4503599627370496.0 literal would be DECIMAL and
    # poison downstream arithmetic with decimal division.
    return (
        f"CAST(('0x' || SUBSTR(MD5({expr}), 1, 13)) AS BIGINT) / {int(_TWO52)}"
    )


def _unit(col: F.Column) -> F.Column:
    """md5-derived uniform in [0,1) from a string column (Spark)."""
    return (
        F.conv(F.substring(F.md5(col.cast("binary")), 1, 13), 16, 10).cast("long")
        / F.lit(_TWO52)
    )


@query(
    "q_dp_noisy_count",
    oracle=f"""
        WITH g AS (
            SELECT o_orderpriority, o_orderstatus, COUNT(*) AS true_n
            FROM orders GROUP BY 1, 2
        ),
        u AS (
            SELECT *,
                   {_sql_unit("'dp:' || o_orderpriority || '|' || o_orderstatus")}
                       - 0.5 AS us
            FROM g
        )
        SELECT o_orderpriority, o_orderstatus, true_n,
               ROUND(-(1.0 / {_EPS!r}) * SIGN(us) * LN(1 - 2 * ABS(us)), 9)
                   AS noise,
               ROUND(true_n
                     - (1.0 / {_EPS!r}) * SIGN(us) * LN(1 - 2 * ABS(us)), 9)
                   AS noisy_n,
               CAST({_EPS!r} AS DOUBLE) AS epsilon
        FROM u
    """,
    operators=(203,),
    doc="Differentially-private release counts (#203): per-group "
    "Laplace(1/eps) noise via the inverse CDF over an md5-seeded "
    "uniform — the draw is a pure function of the group key, so the "
    "release is reproducible (and the oracle reproduces the exact "
    "noise, grading the mechanism itself rather than a tolerance "
    "band). Deterministic seeding is also what a real pipeline wants: "
    "re-running the publish job must not spend fresh privacy budget. "
    "Scale shape: noise is a per-group scalar expression on top of "
    "one hash aggregate; zero extra shuffles.",
)
def q_dp_noisy_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("true_n")
    )
    us = (
        _unit(
            F.concat(
                F.lit("dp:"), F.col("o_orderpriority"), F.lit("|"), F.col("o_orderstatus")
            )
        )
        - 0.5
    )
    noise = -(1.0 / _EPS) * F.signum(us) * F.log(1 - 2 * F.abs(us))
    return g.select(
        "o_orderpriority",
        "o_orderstatus",
        "true_n",
        F.round(noise, 9).alias("noise"),
        F.round(F.col("true_n") + noise, 9).alias("noisy_n"),
        F.lit(_EPS).alias("epsilon"),
    )


# ---------------------------------------------------------------------------
# #208 canonical-URL deduplication
# ---------------------------------------------------------------------------

# Fixtures carry no URL column, so both engines derive the same messy
# URL per document (deterministic in doc_id/source) and the graded
# operator is the canonicalizer + dedup, not the synthesis.


@query(
    "q_url_canonical_dedup",
    oracle="""
        WITH raw AS (
            SELECT doc_id,
                   (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
                   || '://'
                   || (CASE WHEN doc_id % 3 = 0
                            THEN 'WWW.' || UPPER(source) || '.EXAMPLE.COM'
                            ELSE 'www.' || source || '.example.com' END)
                   || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
                   || '/docs/' || CAST(doc_id % 40 AS VARCHAR)
                   || (CASE WHEN doc_id % 2 = 0
                            THEN '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR) || '&b=2'
                            ELSE '?id=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_medium=x&a=1' END)
                   || '#sec' || CAST(doc_id % 5 AS VARCHAR) AS url
            FROM documents
        ),
        parts AS (
            SELECT doc_id,
                   LOWER(REGEXP_REPLACE(REGEXP_REPLACE(
                       STRING_SPLIT(STRING_SPLIT(url, '#')[1], '?')[1],
                       '://www\\.', '://'), ':443/', '/')) AS base,
                   LIST_SORT(LIST_FILTER(
                       STRING_SPLIT(STRING_SPLIT(STRING_SPLIT(url, '#')[1], '?')[2], '&'),
                       x -> SUBSTR(x, 1, 4) <> 'utm_')) AS params
            FROM raw
        ),
        canon AS (
            SELECT doc_id,
                   base || CASE WHEN LEN(params) > 0
                                THEN '?' || ARRAY_TO_STRING(params, '&')
                                ELSE '' END AS canonical_url
            FROM parts
        )
        SELECT canonical_url,
               COUNT(*) AS n_variants,
               MIN(doc_id) AS keeper_doc_id
        FROM canon
        GROUP BY canonical_url
    """,
    operators=(208,),
    doc="Canonical-URL dedup (#208): scheme/host lowercasing, "
    "default-port and fragment stripping, www-prefix removal, "
    "utm_* tracking-parameter removal and query-parameter sorting — "
    "then keep-lowest-id per canonical URL. The CommonCrawl-shaped "
    "first pass of corpus dedup: at 100 TB it removes the bulk of "
    "trivial duplicates for the price of one string expression and "
    "one groupBy on an 8-byte-hashable canonical key, before any "
    "content hashing (#69) or MinHash (#70) runs. All string surgery "
    "is built-in JVM functions — no Python in the path.",
)
def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    url = F.concat(
        F.when(doc_id % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(
            doc_id % 3 == 0,
            F.concat(F.lit("WWW."), F.upper("source"), F.lit(".EXAMPLE.COM")),
        ).otherwise(F.concat(F.lit("www."), F.col("source"), F.lit(".example.com"))),
        F.when(doc_id % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/docs/"),
        (doc_id % 40).cast("string"),
        F.when(
            doc_id % 2 == 0,
            F.concat(F.lit("?utm_source=feed&id="), (doc_id % 7).cast("string"), F.lit("&b=2")),
        ).otherwise(
            F.concat(F.lit("?id="), (doc_id % 7).cast("string"), F.lit("&utm_medium=x&a=1"))
        ),
        F.lit("#sec"),
        (doc_id % 5).cast("string"),
    )
    no_frag = F.split(url, "#").getItem(0)
    base = F.lower(
        F.regexp_replace(
            F.regexp_replace(F.split(no_frag, "\\?").getItem(0), "://www\\.", "://"),
            ":443/",
            "/",
        )
    )
    params = F.array_sort(
        F.filter(
            F.split(F.split(no_frag, "\\?").getItem(1), "&"),
            lambda x: F.substring(x, 1, 4) != "utm_",
        )
    )
    canonical = F.concat(
        base,
        F.when(
            F.size(params) > 0, F.concat(F.lit("?"), F.concat_ws("&", params))
        ).otherwise(F.lit("")),
    )
    return (
        d.select(doc_id, canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )
