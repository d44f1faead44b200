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
    f"sensitive high-balance flag, a k>={_K} pass flag and the 1/n "
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
    doc="Laplace noise-injection mechanics demo (#203). NOT a "
    "differential-privacy mechanism: the noise is a deterministic "
    "function of the PUBLIC group key (so anyone can recompute and "
    "subtract it), and true_n/noise are emitted alongside noisy_n so "
    "the oracle can grade the inverse-CDF transform hash-exactly. A "
    "real epsilon-DP release needs cryptographically random draws "
    "seeded per-release with budget accounting, and must publish ONLY "
    "noisy_n — swap _unit() for a secret-keyed PRF and drop the "
    "true_n/noise columns to get there; the distributed shape (per-"
    "group scalar expression over one hash aggregate, zero extra "
    "shuffles) is exactly what that production mechanism would use.",
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


# ---------------------------------------------------------------------------
# #222 quality-classifier scoring (fixed-weight logistic model)
# ---------------------------------------------------------------------------

import hashlib as _hashlib


def _clf_weights() -> list[float]:
    """Fixed md5-derived weights in [-1, 1) — the stand-in for a
    trained quality classifier's parameters; deterministic plan-time
    constants, identical in the oracle."""
    ws = []
    for j in range(4):
        h = int(_hashlib.md5(f"qclf:{j}".encode()).hexdigest()[:13], 16)
        ws.append(round(h / 4503599627370496.0 * 2 - 1, 6))
    return ws


_W = _clf_weights()


@query(
    "q_quality_classifier",
    oracle=f"""
        WITH feat AS (
            SELECT doc_id,
                   LN(1 + LENGTH(text)) - 5.5 AS x1,
                   CAST(LENGTH(text) AS DOUBLE)
                       / LEN(STRING_SPLIT(text, ' ')) - 6.0 AS x2,
                   CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))
                        AS DOUBLE) / LENGTH(text) - 0.16 AS x3
            FROM documents WHERE LENGTH(text) > 0
        ),
        z AS (
            SELECT doc_id,
                   {_W[0]!r} + {_W[1]!r} * x1 + {_W[2]!r} * x2 + {_W[3]!r} * x3 AS z
            FROM feat
        )
        SELECT doc_id,
               ROUND(1 / (1 + EXP(-z)), 9) AS quality_score,
               CAST(1 / (1 + EXP(-z)) > 0.5 AS INT) AS keep
        FROM z
    """,
    operators=(64, 222),
    doc="Quality-classifier scoring (#222): a fixed-weight logistic "
    "model (weights are md5-derived plan-time constants standing in "
    "for trained parameters — swap in real weights and nothing else "
    "changes) scores every document from cheap row-local features "
    "(log-length, mean word length, whitespace ratio) through a "
    "sigmoid; keep = score > 0.5. This is the fasttext-style quality "
    "filter shape of every corpus pipeline: model application is a "
    "SCALAR EXPRESSION, not a service call — one scan, zero shuffles, "
    "fully inside whole-stage codegen, and the filter composes with "
    "dedup/gates in the same pass. Graded hash-exact (EXP rides "
    "ROUND(9)).",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    x1 = F.log(1 + F.length("text")) - 5.5
    x2 = F.length("text").cast("double") / F.size(F.split("text", " ")) - 6.0
    x3 = (
        F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    ).cast("double") / F.length("text") - 0.16
    z = F.lit(_W[0]) + F.lit(_W[1]) * x1 + F.lit(_W[2]) * x2 + F.lit(_W[3]) * x3
    score = 1 / (1 + F.exp(-z))
    return d.select(
        "doc_id",
        F.round(score, 9).alias("quality_score"),
        (score > 0.5).cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# #223 subject-access report (GDPR Article 15 export)
# ---------------------------------------------------------------------------

_SAR_KEYS = (7, 42, 99)


@query(
    "q_subject_access",
    oracle=f"""
        SELECT 'customer' AS record_type, c_custkey AS subject_id,
               COUNT(*) AS n_records,
               CAST(NULL AS TIMESTAMP) AS first_seen,
               CAST(NULL AS TIMESTAMP) AS last_seen
        FROM customer WHERE c_custkey IN {_SAR_KEYS!r}
        GROUP BY c_custkey
        UNION ALL
        SELECT 'orders', o_custkey, COUNT(*),
               MIN(o_orderdate), MAX(o_orderdate)
        FROM orders WHERE o_custkey IN {_SAR_KEYS!r}
        GROUP BY o_custkey
        UNION ALL
        SELECT 'events', user_id, COUNT(*),
               MIN(CAST(ts AS TIMESTAMP)), MAX(CAST(ts AS TIMESTAMP))
        FROM events WHERE user_id IN {_SAR_KEYS!r}
        GROUP BY user_id
    """,
    operators=(37, 223),
    doc="Subject-access report (#223): everything the warehouse holds "
    "about a set of data subjects, one row per (table, subject) with "
    "record counts and first/last activity — the GDPR Article-15 "
    "export and the read-side complement of erasure (#194 "
    "ecs_despawn / deletion vectors). Scale shape: each branch is an "
    "ID-filtered scan (the IN predicate pushes into parquet row-group "
    "skipping; at 100 TB these become bloom/point-index lookups, "
    "#188) + a tiny aggregate, unioned — cost scales with the "
    "subject's data, not the warehouse.",
)
def q_subject_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = list(_SAR_KEYS)
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey").isin(keys))
        .groupBy(F.col("c_custkey").alias("subject_id"))
        .agg(F.count(F.lit(1)).alias("n_records"))
        .select(
            F.lit("customer").alias("record_type"),
            "subject_id",
            "n_records",
            F.lit(None).cast("timestamp").alias("first_seen"),
            F.lit(None).cast("timestamp").alias("last_seen"),
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isin(keys))
        .groupBy(F.col("o_custkey").alias("subject_id"))
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.min("o_orderdate").alias("first_seen"),
            F.max("o_orderdate").alias("last_seen"),
        )
        .select(
            F.lit("orders").alias("record_type"),
            "subject_id",
            "n_records",
            "first_seen",
            "last_seen",
        )
    )
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isin(keys))
        .groupBy(F.col("user_id").alias("subject_id"))
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .select(
            F.lit("events").alias("record_type"),
            "subject_id",
            "n_records",
            "first_seen",
            "last_seen",
        )
    )
    return c.unionByName(o).unionByName(e)


# ---------------------------------------------------------------------------
# #228 entity resolution (MDM): block -> match -> canonicalize
# ---------------------------------------------------------------------------

_ER_LEV = 20


@query(
    "q_entity_resolution",
    oracle=f"""
        WITH recs AS (
            SELECT c_custkey * 10 AS rid, c_name AS name,
                   c_nationkey AS nat, c_custkey AS digits
            FROM customer
            UNION ALL
            SELECT c_custkey * 10 + 1, 'Customer #' || CAST(c_custkey AS VARCHAR),
                   c_nationkey, c_custkey
            FROM customer WHERE c_custkey % 5 = 0
            UNION ALL
            SELECT c_custkey * 10 + 2, 'CUSTOMER #' || CAST(c_custkey AS VARCHAR),
                   c_nationkey, c_custkey
            FROM customer WHERE c_custkey % 10 = 0
        ),
        edges AS (
            SELECT a.rid AS ra, b.rid AS rb
            FROM recs a JOIN recs b
              ON a.nat = b.nat AND a.digits = b.digits AND a.rid < b.rid
            WHERE LEVENSHTEIN(a.name, b.name) <= {_ER_LEV}
        ),
        adj AS (
            SELECT ra AS rid, rb AS nb FROM edges
            UNION ALL SELECT rb, ra FROM edges
            UNION ALL SELECT rid, rid FROM recs
        )
        SELECT rid, MIN(nb) AS entity_id,
               CAST(MIN(nb) <> rid AS INT) AS merged
        FROM adj GROUP BY rid
    """,
    operators=(93, 70, 228),
    doc="Entity resolution (#228), the MDM pipeline end-to-end: dirty "
    "duplicate records (two deterministic name variants per selected "
    "customer — spacing/zero-padding/case corruptions) are blocked on "
    "(nation, normalized numeric key), matched inside blocks by "
    f"Levenshtein <= {_ER_LEV} on the name, and canonicalized to the "
    "minimum record id over each match component (variants link "
    "star-wise to their base, so ONE min-over-neighbors pass is exact "
    "— the general case iterates exactly like dup-clustering #70). "
    "Scale shape: the quadratic matcher runs only INSIDE blocks "
    "(classic ER blocking), edges shuffle as id pairs, and the "
    "canonical map is one aggregate — ready to feed MERGE (#182) for "
    "golden-record upserts. Every record is graded: rid -> entity_id "
    "+ merged flag.",
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        (F.col("c_custkey") * 10).alias("rid"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_custkey").alias("digits"),
    )
    v1 = c.filter(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") * 10 + 1).alias("rid"),
        F.concat(F.lit("Customer #"), F.col("c_custkey").cast("string")).alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_custkey").alias("digits"),
    )
    v2 = c.filter(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") * 10 + 2).alias("rid"),
        F.concat(F.lit("CUSTOMER #"), F.col("c_custkey").cast("string")).alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_custkey").alias("digits"),
    )
    # Three downstream consumers (both edge sides + the adj self rows)
    # would each re-derive the 3-scan dirty-variant union — 15 scans in
    # the audited plan. Materialize the variant frame once.
    recs = base.unionByName(v1).unionByName(v2).localCheckpoint(eager=True)
    a = recs.select(
        F.col("rid").alias("ra"), F.col("name").alias("na"), "nat", "digits"
    )
    b = recs.select(
        F.col("rid").alias("rb"), F.col("name").alias("nb_name"), F.col("nat").alias("natb"), F.col("digits").alias("digitsb")
    )
    edges = (
        a.join(
            b,
            (F.col("nat") == F.col("natb"))
            & (F.col("digits") == F.col("digitsb"))
            & (F.col("ra") < F.col("rb")),
        )
        .filter(F.levenshtein(F.col("na"), F.col("nb_name")) <= _ER_LEV)
        .select("ra", "rb")
    )
    adj = (
        edges.select(F.col("ra").alias("rid"), F.col("rb").alias("nb"))
        .unionByName(edges.select(F.col("rb").alias("rid"), F.col("ra").alias("nb")))
        .unionByName(recs.select("rid", F.col("rid").alias("nb")))
    )
    return adj.groupBy("rid").agg(F.min("nb").alias("entity_id")).select(
        "rid",
        "entity_id",
        (F.col("entity_id") != F.col("rid")).cast("int").alias("merged"),
    )


# ---------------------------------------------------------------------------
# #242 fairness audit — subgroup rates + disparate impact
# ---------------------------------------------------------------------------


def _fairness_oracle() -> str:
    from zmaxion_spark.queries.registry import REGISTRY

    return """
        WITH scored AS ({CLF}),
        g AS (
            SELECT d.lang,
                   COUNT(*) AS n,
                   CAST(SUM(s.keep) AS BIGINT) AS n_kept,
                   CAST(SUM(s.keep) AS DOUBLE) / COUNT(*) AS keep_rate
            FROM documents d JOIN scored s ON s.doc_id = d.doc_id
            GROUP BY d.lang
        ),
        mx AS (SELECT MAX(keep_rate) AS max_rate FROM g)
        SELECT lang, n, n_kept,
               ROUND(keep_rate, 9) AS keep_rate,
               ROUND(keep_rate / max_rate, 9) AS impact_ratio,
               CAST(keep_rate / max_rate >= 0.8 AS INT) AS passes_80pct_rule
        FROM g CROSS JOIN mx
    """


@query(
    "q_fairness_audit",
    oracle=None,  # assembled below from the classifier oracle
    operators=(202, 242),
    doc="Fairness audit (#242): the #222 quality filter's keep rate "
    "per language subgroup, each group's impact ratio against the "
    "most-favored group, and the four-fifths (80%) disparate-impact "
    "rule as a graded flag — the bias gate a corpus pipeline must run "
    "before a filter silently skews the training mix against a "
    "language. Composes with the release gate (#239) and k-anonymity "
    "(#202) as the governance tier. One broadcast join + one hash "
    "aggregate; rates are single divisions of exact integers, "
    "hash-exact.",
)
def q_fairness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    scored = q_quality_classifier(spark, sf_dir).select("doc_id", "keep")
    g = (
        d.select("doc_id", "lang")
        .join(scored, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("keep").cast("bigint").alias("n_kept"),
        )
        .withColumn("keep_rate", F.col("n_kept").cast("double") / F.col("n"))
    )
    g = g.withColumn("max_rate", F.max("keep_rate").over(Window.partitionBy()))
    return g.select(
        "lang",
        "n",
        "n_kept",
        F.round("keep_rate", 9).alias("keep_rate"),
        F.round(F.col("keep_rate") / F.col("max_rate"), 9).alias("impact_ratio"),
        (F.col("keep_rate") / F.col("max_rate") >= 0.8)
        .cast("int")
        .alias("passes_80pct_rule"),
    )


def _wire_fairness_oracle() -> None:
    from zmaxion_spark.queries.registry import REGISTRY, Query

    clf = REGISTRY["q_quality_classifier"].oracle
    q = REGISTRY["q_fairness_audit"]
    REGISTRY["q_fairness_audit"] = Query(
        q.name,
        q.fn,
        _fairness_oracle().replace("{CLF}", clf),
        q.operators,
        q.doc,
        q.bench,
    )


_wire_fairness_oracle()


# ---------------------------------------------------------------------------
# #316 golden-record survivorship (the merge AFTER entity resolution)
# ---------------------------------------------------------------------------


@query(
    "q_golden_record",
    oracle=f"""
        WITH recs AS (
            SELECT c_custkey * 10 AS rid, c_name AS name,
                   c_nationkey AS nat, c_custkey AS digits,
                   c_acctbal AS bal, 'retail' AS segment
            FROM customer
            UNION ALL
            SELECT c_custkey * 10 + 1, 'Customer #' || CAST(c_custkey AS VARCHAR),
                   c_nationkey, c_custkey, NULL, 'retail'
            FROM customer WHERE c_custkey % 5 = 0
            UNION ALL
            SELECT c_custkey * 10 + 2, 'CUSTOMER #' || CAST(c_custkey AS VARCHAR),
                   c_nationkey, c_custkey, c_acctbal, 'RETAIL'
            FROM customer WHERE c_custkey % 10 = 0
        ),
        edges AS (
            SELECT a.rid AS ra, b.rid AS rb
            FROM recs a JOIN recs b
              ON a.nat = b.nat AND a.digits = b.digits AND a.rid < b.rid
            WHERE LEVENSHTEIN(a.name, b.name) <= {_ER_LEV}
        ),
        adj AS (
            SELECT ra AS rid, rb AS nb FROM edges
            UNION ALL SELECT rb, ra FROM edges
            UNION ALL SELECT rid, rid FROM recs
        ),
        canon AS (SELECT rid, MIN(nb) AS entity_id FROM adj GROUP BY rid),
        full_recs AS (
            SELECT canon.entity_id, recs.* FROM recs
            JOIN canon ON canon.rid = recs.rid
        ),
        gname AS (
            SELECT entity_id, name FROM (
                SELECT entity_id, name,
                       ROW_NUMBER() OVER (PARTITION BY entity_id
                           ORDER BY LEN(name) DESC, name, rid) AS rn
                FROM full_recs
            ) WHERE rn = 1
        ),
        gbal AS (
            SELECT entity_id, bal FROM (
                SELECT entity_id, bal,
                       ROW_NUMBER() OVER (PARTITION BY entity_id
                           ORDER BY rid) AS rn
                FROM full_recs WHERE bal IS NOT NULL
            ) WHERE rn = 1
        ),
        gseg AS (
            SELECT entity_id, segment FROM (
                SELECT entity_id, segment,
                       ROW_NUMBER() OVER (PARTITION BY entity_id
                           ORDER BY COUNT(*) DESC, segment) AS rn
                FROM full_recs GROUP BY entity_id, segment
            ) WHERE rn = 1
        ),
        census AS (
            SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_records
            FROM full_recs GROUP BY entity_id
        )
        SELECT c.entity_id, c.n_records, gname.name, gbal.bal, gseg.segment
        FROM census c
        JOIN gname ON gname.entity_id = c.entity_id
        JOIN gbal ON gbal.entity_id = c.entity_id
        JOIN gseg ON gseg.entity_id = c.entity_id
    """,
    operators=(90, 228, 316),
    doc="Golden-record survivorship (#316), the merge step AFTER "
    "entity resolution (#228): each matched entity's attributes are "
    "reconciled by per-attribute RULES — longest-name-wins (ties "
    "lexicographic then by id), first-non-null balance by source "
    "priority (record id order — variants deliberately carry a NULL "
    "to exercise the fallback), majority-vote segment (mode, ties "
    "alphabetical) — the MDM step that turns a match decision into "
    "ONE publishable row, which canonical-id mapping alone does not "
    "(#228 says WHICH records merge; this says what the merged row "
    "SAYS). Every rule is a deterministic rank window per entity; no "
    "arithmetic touches the attribute values, so parity is "
    "structural. Scale: blocking bounds the matcher; each rule is "
    "one entity-partitioned window over |records|.",
    bench=False,
)
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        (F.col("c_custkey") * 10).alias("rid"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_custkey").alias("digits"),
        F.col("c_acctbal").alias("bal"),
        F.lit("retail").alias("segment"),
    )
    v1 = c.filter(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") * 10 + 1).alias("rid"),
        F.concat(F.lit("Customer #"), F.col("c_custkey").cast("string")).alias(
            "name"
        ),
        F.col("c_nationkey").alias("nat"),
        F.col("c_custkey").alias("digits"),
        F.lit(None).cast("double").alias("bal"),
        F.lit("retail").alias("segment"),
    )
    v2 = c.filter(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") * 10 + 2).alias("rid"),
        F.concat(F.lit("CUSTOMER #"), F.col("c_custkey").cast("string")).alias(
            "name"
        ),
        F.col("c_nationkey").alias("nat"),
        F.col("c_custkey").alias("digits"),
        F.col("c_acctbal").alias("bal"),
        F.lit("RETAIL").alias("segment"),
    )
    recs = base.unionAll(v1).unionAll(v2).localCheckpoint(eager=True)
    a, b = recs.alias("a"), recs.alias("b")
    edges = a.join(
        b,
        (F.col("a.nat") == F.col("b.nat"))
        & (F.col("a.digits") == F.col("b.digits"))
        & (F.col("a.rid") < F.col("b.rid")),
    ).filter(
        F.levenshtein(F.col("a.name"), F.col("b.name")) <= _ER_LEV
    ).select(F.col("a.rid").alias("ra"), F.col("b.rid").alias("rb"))
    adj = (
        edges.select(F.col("ra").alias("rid"), F.col("rb").alias("nb"))
        .unionAll(edges.select(F.col("rb").alias("rid"), F.col("ra").alias("nb")))
        .unionAll(recs.select("rid", F.col("rid").alias("nb")))
    )
    canon = adj.groupBy("rid").agg(F.min("nb").alias("entity_id"))
    fr = recs.join(canon, "rid").localCheckpoint(eager=True)  # 4 consumers
    w_name = Window.partitionBy("entity_id").orderBy(
        F.length("name").desc(), "name", "rid"
    )
    gname = (
        fr.withColumn("rn", F.row_number().over(w_name))
        .filter(F.col("rn") == 1)
        .select("entity_id", "name")
    )
    w_bal = Window.partitionBy("entity_id").orderBy("rid")
    gbal = (
        fr.filter(F.col("bal").isNotNull())
        .withColumn("rn", F.row_number().over(w_bal))
        .filter(F.col("rn") == 1)
        .select("entity_id", "bal")
    )
    segc = fr.groupBy("entity_id", "segment").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_seg = Window.partitionBy("entity_id").orderBy(
        F.desc("cnt"), "segment"
    )
    gseg = (
        segc.withColumn("rn", F.row_number().over(w_seg))
        .filter(F.col("rn") == 1)
        .select("entity_id", "segment")
    )
    census = fr.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records")
    )
    return (
        census.join(gname, "entity_id")
        .join(gbal, "entity_id")
        .join(gseg, "entity_id")
        .select("entity_id", "n_records", "name", "bal", "segment")
    )


# ---------------------------------------------------------------------------
# #324 ER matcher quality sweep (precision/recall vs planted truth)
# ---------------------------------------------------------------------------

_ERQ_THRESHOLDS = (1, 2, 4, 8)


@query(
    "q_er_quality",
    oracle=f"""
        WITH recs AS (
            SELECT c_custkey * 10 AS rid, c_name AS name,
                   c_nationkey AS nat, c_custkey AS digits
            FROM customer
            UNION ALL
            SELECT c_custkey * 10 + 1, 'Customer #' || CAST(c_custkey AS VARCHAR),
                   c_nationkey, c_custkey
            FROM customer WHERE c_custkey % 5 = 0
        ),
        blocked AS (
            SELECT a.rid AS ra, b.rid AS rb,
                   LEVENSHTEIN(a.name, b.name) AS lev,
                   CAST(a.digits = b.digits AS INT) AS is_true
            FROM recs a JOIN recs b
              ON a.nat = b.nat AND a.digits // 100 = b.digits // 100
             AND a.rid < b.rid
        ),
        truth AS (
            SELECT CAST(SUM(is_true) AS BIGINT) AS n_truth FROM blocked
        ),
        sweep AS (
            SELECT t.thr,
                   CAST(COUNT(*) FILTER (WHERE b.lev <= t.thr) AS BIGINT)
                       AS n_pred,
                   CAST(SUM(CASE WHEN b.lev <= t.thr THEN b.is_true
                                 ELSE 0 END) AS BIGINT) AS tp
            FROM blocked b
            CROSS JOIN (SELECT UNNEST({list(_ERQ_THRESHOLDS)}) AS thr) t
            GROUP BY t.thr
        )
        SELECT CAST(s.thr AS BIGINT) AS threshold, s.n_pred, s.tp,
               truth.n_truth,
               CAST(CAST(CAST(s.tp AS DOUBLE) / s.n_pred
                         AS DECIMAL(38,9)) AS DOUBLE) AS precision_,
               CAST(CAST(CAST(s.tp AS DOUBLE) / truth.n_truth
                         AS DECIMAL(38,9)) AS DOUBLE) AS recall_
        FROM sweep s CROSS JOIN truth
    """,
    operators=(93, 228, 256, 324),
    doc="ER matcher quality sweep (#324): precision/recall of the "
    "Levenshtein matcher at four thresholds against PLANTED ground "
    "truth (the dirty variants derive from their base record, so "
    "same-digits within a block IS truth) — the #256 dedup-threshold "
    "calibration for entity resolution. The block here is coarser "
    "than #228's (nation × custkey-century, so ~dozens of DIFFERENT "
    "entities share a block): zero-padded names of neighboring keys "
    "sit at Levenshtein 1 of each other, so loose thresholds buy "
    "recall with real false positives — the sweep MEASURES that "
    "trade instead of assuming lev≤N is safe. Counts exact; two "
    "quantized ratios per threshold. Scale: the quadratic matcher "
    "runs only inside bounded blocks (century blocks hold ≤100 base "
    "keys at any SF); the sweep reuses one scored pair set.",
    bench=False,
)
def q_er_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        (F.col("c_custkey") * 10).alias("rid"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_custkey").alias("digits"),
    )
    v1 = c.filter(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") * 10 + 1).alias("rid"),
        F.concat(F.lit("Customer #"), F.col("c_custkey").cast("string")).alias(
            "name"
        ),
        F.col("c_nationkey").alias("nat"),
        F.col("c_custkey").alias("digits"),
    )
    recs = base.unionAll(v1)
    a, b = recs.alias("a"), recs.alias("b")
    blocked = (
        a.join(
            b,
            (F.col("a.nat") == F.col("b.nat"))
            & (F.expr("a.digits div 100") == F.expr("b.digits div 100"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .select(
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("lev"),
            (F.col("a.digits") == F.col("b.digits")).cast("int").alias(
                "is_true"
            ),
        )
        .localCheckpoint(eager=True)  # truth census + sweep reuse it
    )
    truth = blocked.agg(F.sum("is_true").cast("bigint").alias("n_truth"))
    thr = spark.createDataFrame(
        [(t,) for t in _ERQ_THRESHOLDS], "thr int"
    )
    sweep = (
        blocked.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            F.sum(F.when(F.col("lev") <= F.col("thr"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pred"),
            F.sum(
                F.when(F.col("lev") <= F.col("thr"), F.col("is_true")).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("tp"),
        )
    )
    return sweep.crossJoin(F.broadcast(truth)).select(
        F.col("thr").cast("bigint").alias("threshold"),
        "n_pred",
        "tp",
        "n_truth",
        (F.col("tp").cast("double") / F.col("n_pred"))
        .cast("decimal(38,9)")
        .cast("double")
        .alias("precision_"),
        (F.col("tp").cast("double") / F.col("n_truth"))
        .cast("decimal(38,9)")
        .cast("double")
        .alias("recall_"),
    )


# ---------------------------------------------------------------------------
# #336 Fellegi–Sunter probabilistic record-linkage weights
# ---------------------------------------------------------------------------


@query(
    "q_fellegi_sunter",
    oracle="""
        WITH recs AS (
            SELECT c_custkey * 10 AS rid, c_name AS name,
                   c_nationkey AS nat, c_custkey AS digits
            FROM customer
            UNION ALL
            SELECT c_custkey * 10 + 1, 'Customer #' || CAST(c_custkey AS VARCHAR),
                   c_nationkey, c_custkey
            FROM customer WHERE c_custkey % 5 = 0
            UNION ALL
            SELECT c_custkey * 10 + 2, 'CUSTOMER #' || CAST(c_custkey AS VARCHAR),
                   c_nationkey, c_custkey
            FROM customer WHERE c_custkey % 10 = 0
        ),
        pairs AS (
            SELECT CAST(LEVENSHTEIN(a.name, b.name) <= 2 AS INT) AS f_name,
                   CAST(ABS(LENGTH(a.name) - LENGTH(b.name)) <= 1 AS INT)
                       AS f_len,
                   CAST(SUBSTR(a.name, 1, 1) = SUBSTR(b.name, 1, 1) AS INT)
                       AS f_first,
                   CAST(a.digits = b.digits AS INT) AS is_match
            FROM recs a JOIN recs b
              ON a.nat = b.nat AND a.digits % 97 = b.digits % 97
                 AND a.rid < b.rid
        ),
        mu AS (
            SELECT
                CAST(SUM(is_match) AS BIGINT) AS nm,
                CAST(SUM(1 - is_match) AS BIGINT) AS nu,
                CAST(SUM(CASE WHEN is_match = 1 THEN f_name END) AS BIGINT) AS m1,
                CAST(SUM(CASE WHEN is_match = 0 THEN f_name END) AS BIGINT) AS u1,
                CAST(SUM(CASE WHEN is_match = 1 THEN f_len END) AS BIGINT) AS m2,
                CAST(SUM(CASE WHEN is_match = 0 THEN f_len END) AS BIGINT) AS u2,
                CAST(SUM(CASE WHEN is_match = 1 THEN f_first END) AS BIGINT) AS m3,
                CAST(SUM(CASE WHEN is_match = 0 THEN f_first END) AS BIGINT) AS u3
            FROM pairs
        ),
        w AS (
            SELECT *,
                   (m1 + 0.5) / (nm + 1.0) AS pm1, (u1 + 0.5) / (nu + 1.0) AS pu1,
                   (m2 + 0.5) / (nm + 1.0) AS pm2, (u2 + 0.5) / (nu + 1.0) AS pu2,
                   (m3 + 0.5) / (nm + 1.0) AS pm3, (u3 + 0.5) / (nu + 1.0) AS pu3
            FROM mu
        )
        SELECT p.f_name, p.f_len, p.f_first,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(p.is_match) AS BIGINT) AS n_true_matches,
               ROUND((CASE WHEN p.f_name = 1 THEN LN(pm1 / pu1)
                           ELSE LN((1 - pm1) / (1 - pu1)) END)
                   + (CASE WHEN p.f_len = 1 THEN LN(pm2 / pu2)
                           ELSE LN((1 - pm2) / (1 - pu2)) END)
                   + (CASE WHEN p.f_first = 1 THEN LN(pm3 / pu3)
                           ELSE LN((1 - pm3) / (1 - pu3)) END), 9)
                   AS fs_weight
        FROM pairs p CROSS JOIN w
        GROUP BY p.f_name, p.f_len, p.f_first, pm1, pu1, pm2, pu2, pm3, pu3
        ORDER BY p.f_name, p.f_len, p.f_first
    """,
    operators=(93, 228, 336),
    doc="Fellegi-Sunter probabilistic record linkage (#336), the "
    "statistical foundation under the rule-based ER matcher (#228) "
    "and its threshold sweep (#324): candidate pairs from a "
    "deliberately coarse block (nation, digits mod 97) compare three "
    "fields (name Levenshtein <= 2, length gap <= 1, first-char "
    "equality); m_k = P(agree|match) and u_k = P(agree|non-match) "
    "estimate from the PLANTED truth (variants share their base's "
    "digits) with add-half smoothing, and every agreement PATTERN "
    "gets its log-likelihood match weight sum(ln(m/u) or "
    "ln((1-m)/(1-u))) — the number a production linker thresholds "
    "on. Graded per pattern with pair and true-match counts "
    "anchored. Parity: m/u are exact-integer ratios (smoothed by "
    "half), the LN sum rides ROUND(9). Scale: the quadratic compare "
    "runs only inside blocks; the m/u table is ONE 1-row aggregate "
    "broadcast back; patterns aggregate to at most 2^3 rows.",
)
def q_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        (F.col("c_custkey") * 10).alias("rid"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_custkey").alias("digits"),
    )
    v1 = c.filter(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") * 10 + 1).alias("rid"),
        F.concat(F.lit("Customer #"), F.col("c_custkey").cast("string")).alias(
            "name"
        ),
        F.col("c_nationkey").alias("nat"),
        F.col("c_custkey").alias("digits"),
    )
    v2 = c.filter(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") * 10 + 2).alias("rid"),
        F.concat(F.lit("CUSTOMER #"), F.col("c_custkey").cast("string")).alias(
            "name"
        ),
        F.col("c_nationkey").alias("nat"),
        F.col("c_custkey").alias("digits"),
    )
    recs = base.unionByName(v1).unionByName(v2).withColumn(
        "blk", F.col("digits") % 97
    )
    a = recs.select(
        F.col("rid").alias("ra"), F.col("name").alias("na"),
        F.col("digits").alias("da"), "nat", "blk",
    )
    b = recs.select(
        F.col("rid").alias("rb"), F.col("name").alias("nb"),
        F.col("digits").alias("db"), "nat", "blk",
    )
    pairs = (
        a.join(b, ["nat", "blk"])
        .filter(F.col("ra") < F.col("rb"))
        .select(
            (F.levenshtein("na", "nb") <= 2).cast("int").alias("f_name"),
            (
                F.abs(F.length("na") - F.length("nb")) <= 1
            ).cast("int").alias("f_len"),
            (
                F.substring("na", 1, 1) == F.substring("nb", 1, 1)
            ).cast("int").alias("f_first"),
            (F.col("da") == F.col("db")).cast("int").alias("is_match"),
        )
        .localCheckpoint(eager=True)  # two consumers: mu census + patterns
    )
    mu = pairs.agg(
        F.sum("is_match").cast("bigint").alias("nm"),
        F.sum(1 - F.col("is_match")).cast("bigint").alias("nu"),
        *[
            F.sum(F.when(F.col("is_match") == m, F.col(f)))
            .cast("bigint")
            .alias(n)
            for f, m, n in [
                ("f_name", 1, "m1"), ("f_name", 0, "u1"),
                ("f_len", 1, "m2"), ("f_len", 0, "u2"),
                ("f_first", 1, "m3"), ("f_first", 0, "u3"),
            ]
        ],
    )

    def p(cnt, tot):
        return (F.col(cnt) + F.lit(0.5)) / (F.col(tot) + F.lit(1.0))

    w = mu.select(
        p("m1", "nm").alias("pm1"), p("u1", "nu").alias("pu1"),
        p("m2", "nm").alias("pm2"), p("u2", "nu").alias("pu2"),
        p("m3", "nm").alias("pm3"), p("u3", "nu").alias("pu3"),
    )

    def wt(flag, pm, pu):
        return F.when(
            F.col(flag) == 1, F.log(F.col(pm) / F.col(pu))
        ).otherwise(F.log((1 - F.col(pm)) / (1 - F.col(pu))))

    return (
        pairs.crossJoin(F.broadcast(w))
        .groupBy(
            "f_name", "f_len", "f_first",
            "pm1", "pu1", "pm2", "pu2", "pm3", "pu3",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("is_match").cast("bigint").alias("n_true_matches"),
        )
        .select(
            "f_name", "f_len", "f_first", "n_pairs", "n_true_matches",
            F.round(
                wt("f_name", "pm1", "pu1")
                + wt("f_len", "pm2", "pu2")
                + wt("f_first", "pm3", "pu3"),
                9,
            ).alias("fs_weight"),
        )
        .orderBy("f_name", "f_len", "f_first")
    )


# ---------------------------------------------------------------------------
# #346 luhn_screen — checksum-validated identifier detection
# ---------------------------------------------------------------------------


@query(
    "q_luhn_screen",
    oracle="""
        WITH cand AS (
            SELECT c_custkey, c_mktsegment,
                   TRANSLATE(SUBSTR(MD5('card:' || CAST(c_custkey AS VARCHAR)),
                                    1, 16),
                             'abcdef', '012345') AS num
            FROM customer
        ),
        digits AS (
            SELECT c_custkey, c_mktsegment, num, i,
                   CAST(SUBSTR(num, CAST(i AS INT), 1) AS INT) AS d
            FROM cand,
                 (SELECT UNNEST(GENERATE_SERIES(1, 16)) AS i)
        ),
        luhn AS (
            SELECT c_custkey, c_mktsegment, ANY_VALUE(num) AS num,
                   CAST(SUM(CASE WHEN i % 2 = 1
                                 THEN CASE WHEN 2 * d > 9 THEN 2 * d - 9
                                           ELSE 2 * d END
                                 ELSE d END) AS BIGINT) AS checksum
            FROM digits GROUP BY c_custkey, c_mktsegment
        ),
        flags AS (
            SELECT c_mktsegment, num,
                   CAST(checksum % 10 = 0 AS INT) AS valid
            FROM luhn
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(SUM(valid) AS BIGINT) AS n_luhn_valid,
               ROUND(CAST(SUM(valid) AS DOUBLE) / COUNT(*), 9) AS valid_share,
               'XXXX-XXXX-XXXX-'
                   || SUBSTR(MIN(CASE WHEN valid = 1 THEN num END), 13, 4)
                   AS masked_sample
        FROM flags
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    operators=(23, 41, 346),
    doc="Luhn checksum screen (#346): validate candidate 16-digit "
    "identifiers with the public ISO/IEC 7812 mod-10 algorithm "
    "(double every second digit from the right, subtract 9 above 9, "
    "valid iff the sum is 0 mod 10) — the step a production PII "
    "scanner runs AFTER regex extraction to separate real payment-"
    "card numbers from random digit runs (~10% of random strings "
    "pass, so skipping it means 10x false positives for the redaction "
    "pipeline #79); census per segment plus a masked last-4 sample "
    "(the only form that may leave the pipeline). Candidates are "
    "md5-derived digit strings (the fixture's deterministic stand-in "
    "for regex hits — both engines derive the identical string). "
    "Parity: pure integer algebra; one ROUND(9) share. Scale: "
    "row-local digit explode (16x, bounded), one groupBy; the "
    "checksum needs no shuffle at all in the real pipeline because "
    "it is a per-row expression.",
    bench=False,
)
def q_luhn_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.translate(
            F.substring(
                F.md5(F.concat(F.lit("card:"), F.col("c_custkey").cast("string"))),
                1,
                16,
            ),
            "abcdef",
            "012345",
        ).alias("num"),
    )
    digits = cand.select(
        "c_custkey",
        "c_mktsegment",
        "num",
        F.explode(F.sequence(F.lit(1), F.lit(16))).alias("i"),
    ).withColumn("d", F.expr("CAST(substring(num, i, 1) AS INT)"))
    contrib = F.when(
        F.col("i") % 2 == 1,
        F.when(2 * F.col("d") > 9, 2 * F.col("d") - 9).otherwise(2 * F.col("d")),
    ).otherwise(F.col("d"))
    luhn = digits.groupBy("c_custkey", "c_mktsegment").agg(
        F.first("num").alias("num"),
        F.sum(contrib).cast("bigint").alias("checksum"),
    )
    flags = luhn.select(
        "c_mktsegment",
        "num",
        (F.col("checksum") % 10 == 0).cast("int").alias("valid"),
    )
    return (
        flags.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.sum("valid").cast("bigint").alias("n_luhn_valid"),
            F.round(
                F.sum("valid").cast("double") / F.count(F.lit(1)), 9
            ).alias("valid_share"),
            F.concat(
                F.lit("XXXX-XXXX-XXXX-"),
                F.substring(
                    F.min(F.when(F.col("valid") == 1, F.col("num"))), 13, 4
                ),
            ).alias("masked_sample"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# #353 jaro_winkler_linkage — edit-free string similarity for ER
# ---------------------------------------------------------------------------

_JW_THRESHOLDS = ("0.75", "0.85", "0.95")


import pandas as _pd


def _jw_pandas():
    """Vectorized textbook Jaro-Winkler (boost threshold 0.7, p=0.1,
    max prefix 4) — verified equal to DuckDB's built-in on 8000
    random non-empty pairs, so the oracle can use
    jaro_winkler_similarity() directly."""
    from pyspark.sql.functions import pandas_udf

    def _jaro(s1: str, s2: str) -> float:
        l1, l2 = len(s1), len(s2)
        if l1 == 0 or l2 == 0:
            return 0.0
        if s1 == s2:
            return 1.0
        md = max(l1, l2) // 2 - 1
        m1 = [False] * l1
        m2 = [False] * l2
        m = 0
        for i, c in enumerate(s1):
            for j in range(max(0, i - md), min(l2, i + md + 1)):
                if not m2[j] and s2[j] == c:
                    m1[i] = m2[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        t = 0
        k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        t //= 2
        return (m / l1 + m / l2 + (m - t) / m) / 3

    def _jw(s1: str, s2: str) -> float:
        j = _jaro(s1, s2)
        if j <= 0.7:
            return j
        p = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            p += 1
        return j + p * 0.1 * (1 - j)

    @pandas_udf("double")
    def jw(a: _pd.Series, b: _pd.Series) -> _pd.Series:
        return _pd.Series([_jw(x, y) for x, y in zip(a, b)])

    return jw


@query(
    "q_jaro_winkler_linkage",
    oracle=f"""
        WITH recs AS (
            SELECT c_custkey * 10 AS rid, c_name AS name,
                   c_custkey AS digits, c_custkey // 50 AS blk
            FROM customer
            UNION ALL
            SELECT c_custkey * 10 + 1,
                   'Customer #' || CAST(c_custkey AS VARCHAR),
                   c_custkey, c_custkey // 50
            FROM customer WHERE c_custkey % 5 = 0
            UNION ALL
            SELECT c_custkey * 10 + 2,
                   'CUSTOMER #' || CAST(c_custkey AS VARCHAR),
                   c_custkey, c_custkey // 50
            FROM customer WHERE c_custkey % 10 = 0
        ),
        pairs AS (
            SELECT a.rid AS ra, b.rid AS rb,
                   ROUND(jaro_winkler_similarity(a.name, b.name), 9) AS jw,
                   CAST(a.digits = b.digits AS INT) AS is_true
            FROM recs a JOIN recs b
              ON a.blk = b.blk AND a.rid < b.rid
        ),
        truth AS (SELECT CAST(SUM(is_true) AS BIGINT) AS n_true FROM pairs),
        sweep AS (
            SELECT CAST(t.thr AS DOUBLE) AS threshold,
                   CAST(COUNT(*) FILTER (WHERE p.jw >= CAST(t.thr AS DOUBLE))
                        AS BIGINT) AS n_pred,
                   CAST(SUM(CASE WHEN p.jw >= CAST(t.thr AS DOUBLE)
                                 THEN p.is_true ELSE 0 END) AS BIGINT) AS tp
            FROM pairs p
            CROSS JOIN (SELECT UNNEST([{", ".join(_JW_THRESHOLDS)}]) AS thr) t
            GROUP BY t.thr
        )
        SELECT s.threshold, s.n_pred, s.tp,
               ROUND(CASE WHEN s.n_pred = 0 THEN 0
                          ELSE CAST(s.tp AS DOUBLE) / s.n_pred END, 9)
                   AS precision_,
               ROUND(CAST(s.tp AS DOUBLE) / t.n_true, 9) AS recall
        FROM sweep s CROSS JOIN truth t
        ORDER BY s.threshold
    """,
    operators=(58, 93, 228, 353),
    doc="Jaro-Winkler record linkage (#353): the edit-free string "
    "similarity built for short names (common-character windows + "
    "transposition halves + common-prefix boost, the census-linkage "
    "standard since Winkler 1990) swept at three thresholds over the "
    "blocked ER fixture (#228), graded as precision/recall against "
    "planted truth — the string-metric alternative to Levenshtein "
    "blocking (#93), catching transposed and case-mangled variants "
    "at distance Levenshtein scores far apart. The Spark side is a "
    "vectorized Arrow-batched pandas UDF implementing the textbook "
    "algorithm (boost threshold 0.7); DuckDB's built-in "
    "jaro_winkler_similarity was verified EQUAL on 8k random pairs, "
    "so the oracle grades the exact similarity, quantized at 1e-9. "
    "Scale: pairs form inside bounded blocks only (mod-100 digit "
    "blocks — the #228 blocking discipline); the UDF sees (pair) "
    "rows, never a cross join, and at 100 TB the same sweep rides "
    "the capped-block machinery of #263.",
    bench=False,
)
def q_jaro_winkler_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        (F.col("c_custkey") * 10).alias("rid"),
        F.col("c_name").alias("name"),
        F.col("c_custkey").alias("digits"),
        F.floor(F.col("c_custkey") / 50).alias("blk"),
    )
    v1 = c.filter(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") * 10 + 1).alias("rid"),
        F.concat(F.lit("Customer #"), F.col("c_custkey").cast("string")).alias(
            "name"
        ),
        F.col("c_custkey").alias("digits"),
        F.floor(F.col("c_custkey") / 50).alias("blk"),
    )
    v2 = c.filter(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") * 10 + 2).alias("rid"),
        F.concat(F.lit("CUSTOMER #"), F.col("c_custkey").cast("string")).alias(
            "name"
        ),
        F.col("c_custkey").alias("digits"),
        F.floor(F.col("c_custkey") / 50).alias("blk"),
    )
    recs = base.unionByName(v1).unionByName(v2).localCheckpoint(eager=True)
    a = recs.select(
        F.col("rid").alias("ra"), F.col("name").alias("na"),
        F.col("digits").alias("da"), F.col("blk").alias("blk"),
    )
    b = recs.select(
        F.col("rid").alias("rb"), F.col("name").alias("nb"),
        F.col("digits").alias("db"), F.col("blk").alias("blkb"),
    )
    jw = _jw_pandas()
    pairs = (
        a.join(b, (F.col("blk") == F.col("blkb")) & (F.col("ra") < F.col("rb")))
        .select(
            F.round(jw(F.col("na"), F.col("nb")), 9).alias("jw"),
            (F.col("da") == F.col("db")).cast("int").alias("is_true"),
        )
        .localCheckpoint(eager=True)  # truth total + sweep reuse it
    )
    truth = pairs.agg(F.sum("is_true").cast("bigint").alias("n_true"))
    thr = spark.createDataFrame(
        [(float(t),) for t in _JW_THRESHOLDS], "threshold DOUBLE"
    )
    sweep = (
        pairs.crossJoin(F.broadcast(thr))
        .groupBy("threshold")
        .agg(
            F.sum((F.col("jw") >= F.col("threshold")).cast("int"))
            .cast("bigint")
            .alias("n_pred"),
            F.sum(
                F.when(F.col("jw") >= F.col("threshold"), F.col("is_true"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("tp"),
        )
    )
    return (
        sweep.crossJoin(F.broadcast(truth))
        .select(
            "threshold",
            "n_pred",
            "tp",
            F.round(
                F.when(F.col("n_pred") == 0, F.lit(0.0)).otherwise(
                    F.col("tp").cast("double") / F.col("n_pred")
                ),
                9,
            ).alias("precision_"),
            F.round(F.col("tp").cast("double") / F.col("n_true"), 9).alias(
                "recall"
            ),
        )
        .orderBy("threshold")
    )


# ---------------------------------------------------------------------------
# #354 soundex_blocking — phonetic blocking keys for ER candidates
# ---------------------------------------------------------------------------

_SDX_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_SDX_CODES = "01230120022455012623010202"


@query(
    "q_soundex_blocking",
    oracle=f"""
        WITH words AS (
            SELECT p_partkey,
                   UPPER(STRING_SPLIT(p_name, ' ')[1]) AS w
            FROM part
        ),
        coded AS (
            SELECT p_partkey, w,
                   TRANSLATE(w, '{_SDX_ALPHA}', '{_SDX_CODES}') AS codes
            FROM words
        ),
        sdx AS (
            SELECT p_partkey, w,
                   SUBSTR(w, 1, 1)
                   || RPAD(SUBSTR(COALESCE(array_to_string(list_filter(
                          list_transform(range(2, LEN(w) + 1),
                              i -> CASE WHEN codes[i] <> codes[i - 1]
                                         AND codes[i] <> '0'
                                        THEN codes[i] END),
                          x -> x IS NOT NULL), ''), ''), 1, 3), 3, '0')
                      AS soundex
            FROM coded
        )
        SELECT soundex,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct_words,
               MIN(w) AS sample_word
        FROM sdx
        GROUP BY soundex
        ORDER BY n_parts DESC, soundex
        LIMIT 20
    """,
    operators=(23, 41, 354),
    doc="Soundex phonetic blocking (#354): the classical "
    "letter+3-digit phonetic key (American Soundex coding table; "
    "simplified variant documented — H/W treated as vowels rather "
    "than skipped) over part-name head words, censused as blocking "
    "quality: parts per key and DISTINCT WORDS per key, the "
    "collision rate that tells an ER pipeline (#228, #353) how much "
    "candidate fan-in phonetic blocking adds over exact-prefix "
    "blocking for misspelling-tolerant matching. Adjacent same-code "
    "letters collapse by comparing each code to its predecessor IN "
    "THE UNCOMPRESSED code string (vowels separate, per the real "
    "algorithm), zeros then drop, pad to 3 — all ROW-LOCAL "
    "higher-order array lambdas on both engines, identical by "
    "construction, no float anywhere. Scale: one projection + one "
    "groupBy(soundex); the key is computed beside the scan exactly "
    "like a hash — zero extra shuffles over any blocking key.",
    bench=False,
)
def q_soundex_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper(F.element_at(F.split("p_name", " "), 1)).alias("w"),
    )
    coded = words.withColumn(
        "codes", F.translate(F.col("w"), _SDX_ALPHA, _SDX_CODES)
    )
    tail = F.expr(
        "substring(concat_ws('', filter(transform(sequence(2, length(w)), "
        "i -> CASE WHEN substring(codes, i, 1) <> substring(codes, i - 1, 1) "
        "AND substring(codes, i, 1) <> '0' THEN substring(codes, i, 1) END), "
        "x -> x IS NOT NULL)), 1, 3)"
    )
    sdx = coded.select(
        "p_partkey",
        "w",
        F.concat(F.substring("w", 1, 1), F.rpad(tail, 3, "0")).alias("soundex"),
    )
    return (
        sdx.groupBy("soundex")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.countDistinct("w").cast("bigint").alias("n_distinct_words"),
            F.min("w").alias("sample_word"),
        )
        .orderBy(F.desc("n_parts"), "soundex")
        .limit(20)
    )
