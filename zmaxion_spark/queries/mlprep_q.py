"""Round-4 wave — SURVEY.md §2.20 (#212–#214): feature-engineering
passes of an ML training pipeline: weight-of-evidence binning, smoothed
target encoding, and deterministic k-fold cross-validation statistics.

Parity discipline: bin edges and fold assignments are pure functions
of the data (min/max) or of md5 (fold hash), double sums ride
DECIMAL(38,6) for order independence (queries/helpers.py), and ln()
gets ROUND(..., 9) — so every encoded value is graded hash-exact, not
approximately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.governance_q import _W as _QW, q_quality_classifier
from zmaxion_spark.queries.registry import query

# ---------------------------------------------------------------------------
# #212 weight-of-evidence binning
# ---------------------------------------------------------------------------

_WOE_BINS = 10


@query(
    "q_woe_binning",
    oracle=f"""
        WITH mm AS (
            SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
        ),
        b AS (
            SELECT LEAST(CAST(FLOOR((o_totalprice - lo) / (hi - lo) * {_WOE_BINS})
                              AS BIGINT), {_WOE_BINS - 1}) AS bin,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders CROSS JOIN mm
        ),
        per_bin AS (
            SELECT bin, COUNT(*) AS n,
                   CAST(SUM(y) AS BIGINT) AS n_event,
                   CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_nonevent
            FROM b GROUP BY bin
        ),
        tot AS (
            SELECT CAST(SUM(n_event) AS BIGINT) AS e_tot,
                   CAST(SUM(n_nonevent) AS BIGINT) AS ne_tot
            FROM per_bin
        )
        SELECT bin, n, n_event,
               ROUND(CAST(n_event AS DOUBLE) / n, 9) AS event_rate,
               ROUND(LN(((n_event + 0.5) / e_tot)
                        / ((n_nonevent + 0.5) / ne_tot)), 9) AS woe,
               ROUND(((n_event + 0.5) / e_tot - (n_nonevent + 0.5) / ne_tot)
                     * LN(((n_event + 0.5) / e_tot)
                          / ((n_nonevent + 0.5) / ne_tot)), 9) AS iv_part
        FROM per_bin CROSS JOIN tot
    """,
    operators=(212,),
    doc=f"Weight-of-evidence binning (#212): order price equal-width "
    f"binned into {_WOE_BINS} bins (edges from one global min/max — "
    "shuffle-free to compute, unlike quantile bins), per-bin event "
    "rate of the binary target (order fully shipped), WOE = "
    "ln(eventshare/noneventshare) with +0.5 Laplace smoothing so empty "
    "cells stay finite, and the per-bin information-value term. The "
    "classic credit-scoring / feature-screening transform. Scale "
    "shape: one min/max aggregate broadcast back + ONE hash aggregate "
    "over bin ids; integer counts exact, ln absorbed by ROUND(9).",
)
def q_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    mm = o.groupBy().agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    b = o.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * _WOE_BINS
            ).cast("bigint"),
            F.lit(_WOE_BINS - 1).cast("bigint"),
        ).alias("bin"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    per_bin = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("bigint").alias("n_event"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("n_nonevent"),
    )
    tot = per_bin.groupBy().agg(
        F.sum("n_event").cast("bigint").alias("e_tot"),
        F.sum("n_nonevent").cast("bigint").alias("ne_tot"),
    )
    e_share = (F.col("n_event") + 0.5) / F.col("e_tot")
    ne_share = (F.col("n_nonevent") + 0.5) / F.col("ne_tot")
    return per_bin.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "n_event",
        F.round(F.col("n_event").cast("double") / F.col("n"), 9).alias("event_rate"),
        F.round(F.log(e_share / ne_share), 9).alias("woe"),
        F.round((e_share - ne_share) * F.log(e_share / ne_share), 9).alias("iv_part"),
    )


# ---------------------------------------------------------------------------
# #213 smoothed target encoding
# ---------------------------------------------------------------------------

_TE_M = 10


@query(
    "q_target_encoding",
    oracle=f"""
        WITH joined AS (
            SELECT c.c_mktsegment AS seg,
                   CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS t
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
                   CAST(CAST(SUM(t) AS BIGINT) AS DOUBLE) / 100.0 AS sum_all
            FROM joined
        ),
        per AS (
            SELECT seg, COUNT(*) AS n,
                   CAST(CAST(SUM(t) AS BIGINT) AS DOUBLE) / 100.0 AS sum_t
            FROM joined GROUP BY seg
        )
        SELECT seg, n,
               FLOOR(sum_t / n * 1e9 + 0.5) / 1e9 AS mean_target,
               FLOOR((sum_t + {_TE_M} * (sum_all / n_all)) / (n + {_TE_M})
                     * 1e9 + 0.5) / 1e9 AS encoded,
               FLOOR(sum_all / n_all * 1e9 + 0.5) / 1e9 AS global_mean
        FROM per CROSS JOIN g
    """,
    operators=(213,),
    doc=f"Smoothed target encoding (#213): each category (market "
    "segment) is encoded as (sum_target + m*global_mean)/(n + m) with "
    f"m={_TE_M} — the prior-blended category mean that protects rare "
    "categories from overfitting, the standard high-cardinality "
    "categorical encoder for gradient-boosted models. Targets enter "
    "as exact integer CENTS (Σ BIGINT, one /100 at the cell stage — "
    "the #307 discipline), and the final 1e-9 quantize is "
    "FLOOR(x*1e9 + 0.5)/1e9 — a pure shared IEEE tree — because the "
    "round-9 strict gate caught the engines' ROUND semantics "
    "diverging on bit-identical doubles: Spark rounds the SHORTEST "
    "DECIMAL REPR half-up while DuckDB rounds the exact binary "
    "value, so a repr ending '…5' exactly at digit 10 (here "
    "269569.4475814815, exact …481479…) goes up on Spark and down "
    "on DuckDB. Scale "
    "shape: one fact-dim broadcast join, one hash aggregate per "
    "category plus one global aggregate broadcast back; the encoder "
    "table (one row per category) then broadcasts onto training "
    "data for application.",
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("t"),
    )
    g = joined.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        (F.sum("t").cast("bigint").cast("double") / F.lit(100.0)).alias(
            "sum_all"
        ),
    )
    per = joined.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("t").cast("bigint").cast("double") / F.lit(100.0)).alias(
            "sum_t"
        ),
    )
    gmean = F.col("sum_all") / F.col("n_all")

    def _q9(col):
        return F.floor(col * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)

    return per.crossJoin(F.broadcast(g)).select(
        "seg",
        "n",
        _q9(F.col("sum_t") / F.col("n")).alias("mean_target"),
        _q9((F.col("sum_t") + _TE_M * gmean) / (F.col("n") + _TE_M)).alias(
            "encoded"
        ),
        _q9(gmean).alias("global_mean"),
    )


# ---------------------------------------------------------------------------
# #214 deterministic k-fold cross-validation statistics
# ---------------------------------------------------------------------------

_CV_K = 5


@query(
    "q_kfold_cv",
    oracle=f"""
        WITH f AS (
            SELECT CAST(('0x' || SUBSTR(MD5('cv:' || CAST(o_orderkey AS VARCHAR)),
                                        1, 13)) AS BIGINT) % {_CV_K} AS fold,
                   o_totalprice AS t
            FROM orders
        ),
        per AS (
            SELECT fold, COUNT(*) AS n,
                   CAST(SUM(CAST(t AS DECIMAL(38,6))) AS DOUBLE) AS sum_t
            FROM f GROUP BY fold
        ),
        wide AS (
            SELECT fold, n, sum_t,
                   CAST(SUM(n) OVER () AS BIGINT) AS n_all,
                   CAST(SUM(CAST(sum_t AS DECIMAL(38,6))) OVER () AS DOUBLE)
                       AS sum_all
            FROM per
        )
        SELECT fold, n,
               ROUND(sum_t / n, 9) AS mean_in_fold,
               ROUND((sum_all - sum_t) / (n_all - n), 9) AS mean_out_of_fold
        FROM wide
    """,
    operators=(47, 214),
    doc=f"Deterministic {_CV_K}-fold cross-validation statistics "
    "(#214): fold = md5(key) mod k — stable across runs, engines and "
    "cluster sizes, so a re-run never reshuffles examples between "
    "folds (the property train_test_split #77 establishes for one "
    "split, extended to k rotations). Per fold: size, in-fold target "
    "mean, and the out-of-fold mean (complement arithmetic from the "
    "global aggregate — computing k leave-one-fold-out statistics "
    "costs ONE aggregate, not k scans). Scale shape: one hash "
    "aggregate over k fold ids, complement math in the driver-sized "
    "result; the fold column itself is a pure projection usable by "
    "any downstream trainer.",
)
def q_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cv:"), F.col("o_orderkey").cast("string")
                    ).cast("binary")
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % _CV_K
    )
    from pyspark.sql.window import Window

    f = o.select(fold.alias("fold"), F.col("o_totalprice").alias("t"))
    per = f.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("t").cast("decimal(38,6)")).cast("double").alias("sum_t"),
    )
    # Global totals via an unpartitioned window over the k-row fold
    # aggregate — ONE scan of orders; a separate global aggregate
    # would make Catalyst recompute the whole fold lineage.
    w = Window.partitionBy()
    per = per.select(
        "fold",
        "n",
        "sum_t",
        F.sum("n").over(w).cast("bigint").alias("n_all"),
        F.sum(F.col("sum_t").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("sum_all"),
    )
    return per.select(
        "fold",
        "n",
        F.round(F.col("sum_t") / F.col("n"), 9).alias("mean_in_fold"),
        F.round(
            (F.col("sum_all") - F.col("sum_t")) / (F.col("n_all") - F.col("n")), 9
        ).alias("mean_out_of_fold"),
    )


# ---------------------------------------------------------------------------
# #225 hard-negative mining for contrastive training
# ---------------------------------------------------------------------------

_HN_K = 5


def _hn_oracle() -> str:
    from zmaxion_spark.queries.llm import _sql_cosine

    return f"""
        WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qv
                   FROM embeddings WHERE vec_id < 3),
        scored AS (
            SELECT q.qid, e.vec_id, e.label,
                   {_sql_cosine('q.qv', 'e.embedding')} AS cos_sim
            FROM q CROSS JOIN embeddings e
            WHERE e.label <> q.qlabel
        )
        SELECT qid, vec_id, label, ROUND(cos_sim, 9) AS cos_sim, rank FROM (
            SELECT qid, vec_id, label, cos_sim,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY cos_sim DESC, vec_id) AS rank
            FROM scored
        ) WHERE rank <= {_HN_K}
    """


@query(
    "q_hard_negatives",
    oracle=_hn_oracle(),
    operators=(33, 72, 225),
    doc=f"Hard-negative mining (#225): for each anchor, the top-"
    f"{_HN_K} most-similar vectors with a DIFFERENT label — the "
    "contrastive-training data generator (easy negatives teach "
    "nothing; the hardest wrong answers shape the margin). Same "
    "broadcast-anchor x corpus-scan shape as exact top-k search "
    "(#72) with the label-mismatch predicate applied BEFORE ranking; "
    "at 100 TB the corpus side prunes via the LSH/IVF variants and "
    "the negative set writes straight into training shards (#132).",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from zmaxion_spark.functions.similarity import cosine

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qv"),
    )
    scored = (
        e.join(F.broadcast(q), F.col("label") != F.col("qlabel"))
        .select(
            "qid",
            "vec_id",
            "label",
            cosine(F.col("qv"), F.col("embedding")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _HN_K)
        .select("qid", "vec_id", "label", F.round("cos_sim", 9).alias("cos_sim"), "rank")
    )


# ---------------------------------------------------------------------------
# #226 exact AUC (Mann-Whitney with midranks)
# ---------------------------------------------------------------------------


@query(
    "q_model_eval_auc",
    oracle="""
        WITH scored AS (
            SELECT d.doc_id,
                   CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
                   q.quality_score AS s
            FROM documents d
            JOIN (
                SELECT doc_id,
                       ROUND(1 / (1 + EXP(-(z))), 9) AS quality_score
                FROM (
                    SELECT doc_id, 0.160745 + 0.904206 * (LN(1 + LENGTH(text)) - 5.5)
                           + 0.461865 * (CAST(LENGTH(text) AS DOUBLE)
                                     / LEN(STRING_SPLIT(text, ' ')) - 6.0)
                           + 0.160662 * (CAST(LENGTH(text)
                                          - LENGTH(REPLACE(text, ' ', ''))
                                          AS DOUBLE) / LENGTH(text) - 0.16) AS z
                    FROM documents WHERE LENGTH(text) > 0
                )
            ) q ON q.doc_id = d.doc_id
        ),
        ranked AS (
            SELECT y,
                   RANK() OVER (ORDER BY s) AS rmin,
                   COUNT(*) OVER (PARTITION BY s) AS tie_n
            FROM scored
        ),
        agg AS (
            SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
                   CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg,
                   CAST(SUM(CASE WHEN y = 1
                                 THEN rmin + (tie_n - 1) / CAST(2 AS DOUBLE)
                                 ELSE 0 END) AS DOUBLE) AS rank_sum_pos
            FROM ranked
        )
        SELECT n_pos, n_neg,
               ROUND((rank_sum_pos - CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2)
                     / (CAST(n_pos AS DOUBLE) * n_neg), 9) AS auc
        FROM agg
    """,
    operators=(31, 226),
    doc="Exact AUC (#226): the Mann-Whitney rank-sum formulation with "
    "midranks for ties — AUC = (R_pos - n_pos(n_pos+1)/2) / "
    "(n_pos*n_neg) — evaluating the #222 quality classifier against "
    "an 'is-English' label. The exact O(n log n) rank computation, not "
    "the O(n^2) pair count, and the midrank sum is half-integer-exact "
    "so the metric is graded hash-exact. At 100 TB (round 6, closing "
    "VERDICT r5 'weak' #2): the global rank runs BUCKET-DECOMPOSED — "
    "scores bucket into floor(s*4096) cells, the 4097-row cell census "
    "carries the cumulative offsets, and the per-row window is "
    "partitioned by cell (functions.ranks.bucketed_row_number). No "
    "single-partition WindowExec anywhere in the plan.",
)
def q_model_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from zmaxion_spark.functions.ranks import bucketed_row_number

    d = load_table(spark, sf_dir, "documents")
    scored = q_quality_classifier(spark, sf_dir).join(
        d.select("doc_id", F.when(F.col("lang") == "en", 1).otherwise(0).alias("y")),
        "doc_id",
    ).select(
        "y",
        F.col("quality_score").alias("s"),
        F.floor(F.col("quality_score") * 4096).cast("long").alias("_bkt"),
    )
    ranked = bucketed_row_number(
        scored, "_bkt", ["s"], out="rmin", rank_fn=F.rank
    ).select(
        "y",
        "rmin",
        F.count(F.lit(1)).over(Window.partitionBy("s")).alias("tie_n"),
    )
    agg = ranked.groupBy().agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("n_neg"),
        F.sum(
            F.when(
                F.col("y") == 1,
                F.col("rmin") + (F.col("tie_n") - 1) / F.lit(2.0),
            ).otherwise(F.lit(0.0))
        )
        .cast("double")
        .alias("rank_sum_pos"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            (
                F.col("rank_sum_pos")
                - F.col("n_pos").cast("double") * (F.col("n_pos") + 1) / 2
            )
            / (F.col("n_pos").cast("double") * F.col("n_neg")),
            9,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# #227 calibration bins + expected calibration error
# ---------------------------------------------------------------------------


@query(
    "q_calibration_ece",
    oracle="""
        WITH scored AS (
            SELECT CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
                   q.quality_score AS s
            FROM documents d
            JOIN (
                SELECT doc_id,
                       ROUND(1 / (1 + EXP(-(z))), 9) AS quality_score
                FROM (
                    SELECT doc_id, 0.160745 + 0.904206 * (LN(1 + LENGTH(text)) - 5.5)
                           + 0.461865 * (CAST(LENGTH(text) AS DOUBLE)
                                     / LEN(STRING_SPLIT(text, ' ')) - 6.0)
                           + 0.160662 * (CAST(LENGTH(text)
                                          - LENGTH(REPLACE(text, ' ', ''))
                                          AS DOUBLE) / LENGTH(text) - 0.16) AS z
                    FROM documents WHERE LENGTH(text) > 0
                )
            ) q ON q.doc_id = d.doc_id
        ),
        bins AS (
            SELECT LEAST(CAST(FLOOR(s * 10) AS BIGINT), 9) AS bin,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE) AS sum_s,
                   CAST(SUM(y) AS BIGINT) AS n_pos
            FROM scored GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM bins)
        SELECT bin, n,
               ROUND(sum_s / n, 9) AS mean_predicted,
               ROUND(CAST(n_pos AS DOUBLE) / n, 9) AS observed_rate,
               ROUND(ABS(sum_s / n - CAST(n_pos AS DOUBLE) / n), 9) AS gap,
               ROUND(CAST(n AS DOUBLE) / n_all
                     * ABS(sum_s / n - CAST(n_pos AS DOUBLE) / n), 9)
                   AS ece_part
        FROM bins CROSS JOIN tot
    """,
    operators=(23, 227),
    doc="Calibration / reliability bins (#227): predictions from the "
    "#222 classifier bucketed into 10 confidence bins; per bin the "
    "mean predicted probability, the observed positive rate, their "
    "gap, and the bin's weighted contribution to Expected Calibration "
    "Error (sum of ece_part = ECE). The model-monitoring companion to "
    "AUC (#226): AUC ranks, calibration trusts. One hash aggregate "
    "over 10 bins, decimal score sums for order independence — "
    "hash-exact, and at 100 TB the bins are a mergeable 10-row state "
    "maintainable per micro-batch like any sketch (#220).",
)
def q_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scored = q_quality_classifier(spark, sf_dir).join(
        d.select("doc_id", F.when(F.col("lang") == "en", 1).otherwise(0).alias("y")),
        "doc_id",
    ).select("y", F.col("quality_score").alias("s"))
    bins = scored.groupBy(
        F.least(F.floor(F.col("s") * 10).cast("bigint"), F.lit(9).cast("bigint")).alias(
            "bin"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("s").cast("decimal(38,6)")).cast("double").alias("sum_s"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    tot = bins.groupBy().agg(F.sum("n").cast("bigint").alias("n_all"))
    mean_p = F.col("sum_s") / F.col("n")
    obs = F.col("n_pos").cast("double") / F.col("n")
    return bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        F.round(mean_p, 9).alias("mean_predicted"),
        F.round(obs, 9).alias("observed_rate"),
        F.round(F.abs(mean_p - obs), 9).alias("gap"),
        F.round(F.col("n").cast("double") / F.col("n_all") * F.abs(mean_p - obs), 9).alias(
            "ece_part"
        ),
    )


# ---------------------------------------------------------------------------
# #235 ROC curve points
# ---------------------------------------------------------------------------

_ROC_STEPS = 10


@query(
    "q_roc_curve",
    oracle=f"""
        WITH scored AS (
            SELECT CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
                   q.quality_score AS s
            FROM documents d
            JOIN (
                SELECT doc_id,
                       ROUND(1 / (1 + EXP(-(z))), 9) AS quality_score
                FROM (
                    SELECT doc_id, 0.160745 + 0.904206 * (LN(1 + LENGTH(text)) - 5.5)
                           + 0.461865 * (CAST(LENGTH(text) AS DOUBLE)
                                     / LEN(STRING_SPLIT(text, ' ')) - 6.0)
                           + 0.160662 * (CAST(LENGTH(text)
                                          - LENGTH(REPLACE(text, ' ', ''))
                                          AS DOUBLE) / LENGTH(text) - 0.16) AS z
                    FROM documents WHERE LENGTH(text) > 0
                )
            ) q ON q.doc_id = d.doc_id
        ),
        th AS (SELECT UNNEST(RANGE(0, {_ROC_STEPS} + 1)) AS k),
        tot AS (
            SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
                   CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
            FROM scored
        )
        SELECT th.k,
               ROUND(CAST(th.k AS DOUBLE) / {_ROC_STEPS}, 9) AS threshold,
               CAST(SUM(CASE WHEN s >= CAST(th.k AS DOUBLE) / {_ROC_STEPS}
                             AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN s >= CAST(th.k AS DOUBLE) / {_ROC_STEPS}
                             AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               ROUND(CAST(SUM(CASE WHEN s >= CAST(th.k AS DOUBLE) / {_ROC_STEPS}
                                   AND y = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / tot.n_pos, 9) AS tpr,
               ROUND(CAST(SUM(CASE WHEN s >= CAST(th.k AS DOUBLE) / {_ROC_STEPS}
                                   AND y = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                     / tot.n_neg, 9) AS fpr
        FROM th CROSS JOIN scored CROSS JOIN tot
        GROUP BY th.k, tot.n_pos, tot.n_neg
    """,
    operators=(24, 235),
    doc=f"ROC curve (#235): TPR/FPR at {_ROC_STEPS + 1} fixed "
    "thresholds for the #222 classifier — the operating-point view "
    "that AUC (#226) integrates away; threshold selection (recall "
    "floor, FPR budget) reads straight off these rows. Computed as "
    "ONE conditional aggregate over the threshold grid x scored rows "
    "(grid is 11 rows — the 'cross join' is a broadcast fan-out, the "
    "scan stays single-pass). Integer confusion counts -> hash-exact.",
)
def q_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scored = q_quality_classifier(spark, sf_dir).join(
        d.select("doc_id", F.when(F.col("lang") == "en", 1).otherwise(0).alias("y")),
        "doc_id",
    ).select("y", F.col("quality_score").alias("s"))
    th = spark.range(0, _ROC_STEPS + 1).select(F.col("id").alias("k"))
    tot = scored.groupBy().agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("n_neg"),
    )
    thr = F.col("k").cast("double") / _ROC_STEPS
    hit = F.col("s") >= thr
    g = (
        scored.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(tot))
        .groupBy("k", "n_pos", "n_neg")
        .agg(
            F.sum(F.when(hit & (F.col("y") == 1), 1).otherwise(0))
            .cast("bigint")
            .alias("tp"),
            F.sum(F.when(hit & (F.col("y") == 0), 1).otherwise(0))
            .cast("bigint")
            .alias("fp"),
        )
    )
    return g.select(
        "k",
        F.round(F.col("k").cast("double") / _ROC_STEPS, 9).alias("threshold"),
        "tp",
        "fp",
        F.round(F.col("tp").cast("double") / F.col("n_pos"), 9).alias("tpr"),
        F.round(F.col("fp").cast("double") / F.col("n_neg"), 9).alias("fpr"),
    )


# ---------------------------------------------------------------------------
# #236 point-in-time feature assembly (leakage-free training set)
# ---------------------------------------------------------------------------


@query(
    "q_feature_store_pit",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id, event_type,
                   CAST(ts AS TIMESTAMP) AS ts, value,
                   COUNT(*) OVER f AS n_prior,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        OVER f AS BIGINT) AS n_prior_clicks,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        OVER f AS BIGINT) AS n_prior_errors,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER f AS DOUBLE)
                       AS prior_value_sum
            FROM events
            WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        SELECT user_id, event_id AS label_event_id,
               n_prior,
               n_prior_clicks,
               n_prior_errors,
               ROUND(prior_value_sum, 9) AS prior_value_sum,
               ROUND(CAST(value AS DOUBLE), 9) AS label_value
        FROM ordered
        WHERE event_type = 'purchase' AND n_prior >= 1
    """,
    operators=(31, 32, 236),
    doc="Point-in-time feature assembly (#236): for every label event "
    "(purchase), the feature vector is computed from STRICTLY PRIOR "
    "events only — activity counts, per-type counts, decimal-exact "
    "prior spend — via an UNBOUNDED..1 PRECEDING frame over "
    "(ts, event_id). This is the feature-store guarantee that kills "
    "label leakage, the bug that silently inflates every offline "
    "metric; the frame boundary IS the guarantee, graded hash-exact. "
    "Scale shape: one window pass per user partition assembles ALL "
    "features (adding a feature adds an aggregate, not a pass or an "
    "as-of join), and the same frame discipline extends to "
    "RANGE-bounded lookback windows (#121 rolling_time_window).",
)
def q_feature_store_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ordered = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.count(F.lit(1)).over(f).alias("n_prior"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .over(f)
        .cast("bigint")
        .alias("n_prior_clicks"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(f)
        .cast("bigint")
        .alias("n_prior_errors"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(f)
        .cast("double")
        .alias("prior_value_sum"),
    )
    return ordered.filter(
        (F.col("event_type") == "purchase") & (F.col("n_prior") >= 1)
    ).select(
        "user_id",
        F.col("event_id").alias("label_event_id"),
        "n_prior",
        "n_prior_clicks",
        "n_prior_errors",
        F.round("prior_value_sum", 9).alias("prior_value_sum"),
        F.round(F.col("value").cast("double"), 9).alias("label_value"),
    )


# ---------------------------------------------------------------------------
# #239 model release gate — the ML-eval capstone
# ---------------------------------------------------------------------------

_GATE_AUC = 0.45
_GATE_PSI = 0.2
_GATE_ECE = 0.35


@query(
    "q_model_release_gate",
    oracle=f"""
        WITH auc AS ({{AUC_SQL}}),
        psi AS (
            SELECT ROUND(SUM(psi_part), 9) AS psi FROM ({{PSI_SQL}})
        ),
        ece AS (
            SELECT ROUND(SUM(ece_part), 9) AS ece FROM ({{ECE_SQL}})
        )
        SELECT auc.auc,
               psi.psi,
               ece.ece,
               CAST(auc.auc >= {_GATE_AUC} AS INT) AS auc_ok,
               CAST(psi.psi < {_GATE_PSI} AS INT) AS psi_ok,
               CAST(ece.ece < {_GATE_ECE} AS INT) AS ece_ok,
               CAST(auc.auc >= {_GATE_AUC}
                    AND psi.psi < {_GATE_PSI}
                    AND ece.ece < {_GATE_ECE} AS INT) AS release_approved
        FROM auc CROSS JOIN psi CROSS JOIN ece
    """,
    operators=(226, 227, 234, 239),
    doc="Model release gate (#239), the ML-eval capstone: AUC (#226), "
    "total PSI drift (#234) and total ECE miscalibration (#227) "
    "evaluated in ONE query, each checked against its release "
    "threshold, and the conjunction emitted as the go/no-go decision "
    "— the automated pre-deployment check a model registry runs, the "
    "exact analog of the data-side quality-gated commit (#193). "
    "Composition is by construction: the three metric pipelines are "
    "the graded operators themselves, cross-joined as 1-row "
    "aggregates; a regression in ANY upstream metric flips a graded "
    "column here.",
)
def q_model_release_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    auc = q_model_eval_auc(spark, sf_dir).select("auc")
    psi = (
        q_psi_drift_ref(spark, sf_dir)
        .groupBy()
        .agg(F.round(F.sum("psi_part"), 9).alias("psi"))
    )
    ece = (
        q_calibration_ece(spark, sf_dir)
        .groupBy()
        .agg(F.round(F.sum("ece_part"), 9).alias("ece"))
    )
    return (
        auc.crossJoin(F.broadcast(psi))
        .crossJoin(F.broadcast(ece))
        .select(
            "auc",
            "psi",
            "ece",
            (F.col("auc") >= _GATE_AUC).cast("int").alias("auc_ok"),
            (F.col("psi") < _GATE_PSI).cast("int").alias("psi_ok"),
            (F.col("ece") < _GATE_ECE).cast("int").alias("ece_ok"),
            (
                (F.col("auc") >= _GATE_AUC)
                & (F.col("psi") < _GATE_PSI)
                & (F.col("ece") < _GATE_ECE)
            )
            .cast("int")
            .alias("release_approved"),
        )
    )


def _wire_release_gate() -> None:
    """Assemble the gate oracle from the graded upstream oracles and
    resolve the PSI query reference (defined in stats_q)."""
    import zmaxion_spark.queries.stats_q  # noqa: F401  (registers #234)

    from zmaxion_spark.queries.registry import REGISTRY, Query

    global q_psi_drift_ref
    q_psi_drift_ref = REGISTRY["q_psi_drift"].fn

    q = REGISTRY["q_model_release_gate"]
    oracle = (
        q.oracle.replace("{AUC_SQL}", REGISTRY["q_model_eval_auc"].oracle)
        .replace("{PSI_SQL}", REGISTRY["q_psi_drift"].oracle)
        .replace("{ECE_SQL}", REGISTRY["q_calibration_ece"].oracle)
    )
    REGISTRY["q_model_release_gate"] = Query(
        q.name, q.fn, oracle, q.operators, q.doc, q.bench
    )


_wire_release_gate()


# ---------------------------------------------------------------------------
# #245 isotonic calibration (minimax closed form, no sequential PAVA)
# ---------------------------------------------------------------------------


def _isotonic_oracle() -> str:
    from zmaxion_spark.queries.registry import REGISTRY

    return """
        WITH cal AS ({ECE}),
        b AS (
            SELECT bin, n, CAST(ROUND(observed_rate * n) AS BIGINT) AS n_pos
            FROM cal
        ),
        iv AS (
            SELECT j.bin AS j, k.bin AS k,
                   CAST(SUM(m.n_pos) AS DOUBLE) / SUM(m.n) AS avg_rate
            FROM b j JOIN b k ON j.bin <= k.bin
            JOIN b m ON m.bin BETWEEN j.bin AND k.bin
            GROUP BY j.bin, k.bin
        ),
        stage1 AS (
            SELECT i.bin AS bin, iv.j,
                   MIN(iv.avg_rate) AS min_k
            FROM b i JOIN iv ON iv.j <= i.bin AND iv.k >= i.bin
            GROUP BY i.bin, iv.j
        ),
        iso AS (
            SELECT bin, MAX(min_k) AS iso_rate FROM stage1 GROUP BY bin
        )
        SELECT b.bin, b.n,
               ROUND(CAST(b.n_pos AS DOUBLE) / b.n, 9) AS observed_rate,
               ROUND(iso.iso_rate, 9) AS isotonic_rate
        FROM b JOIN iso ON iso.bin = b.bin
    """


@query(
    "q_isotonic_calibration",
    oracle=None,  # assembled below from the calibration-bin oracle
    operators=(227, 245),
    doc="Isotonic calibration (#245): the monotone recalibration map "
    "over the #227 confidence bins, computed via the CLOSED-FORM "
    "minimax identity iso(i) = max_{j<=i} min_{k>=i} avg(j..k) "
    "instead of the sequential pool-adjacent-violators loop — minimax "
    "over O(bins^2) intervals is pure join+aggregate algebra, so the "
    "classically 'inherently sequential' fit distributes and grades "
    "hash-exact (interval averages are single divisions of exact "
    "integer pool sums). The standard score-recalibration step when "
    "ECE (#227) fails the release gate (#239). Bins are 10 rows; at "
    "100 TB the binning aggregate is the only data-scale stage.",
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    cal = q_calibration_ece(spark, sf_dir).select("bin", "n", "observed_rate")
    b = cal.select(
        "bin",
        "n",
        F.round(F.col("observed_rate") * F.col("n")).cast("bigint").alias("n_pos"),
    ).localCheckpoint()
    j = b.select(F.col("bin").alias("j"))
    k = b.select(F.col("bin").alias("k"))
    m = b.select(F.col("bin").alias("mb"), F.col("n").alias("mn"), F.col("n_pos").alias("mp"))
    # All frames here are bin-grain (10 rows / 55 intervals): broadcast
    # the right sides so the theta joins plan as the intentional-tiny
    # BroadcastNestedLoopJoin, never a partitioned CartesianProduct.
    iv = (
        j.join(F.broadcast(k), F.col("j") <= F.col("k"))
        .join(
            F.broadcast(m),
            (F.col("mb") >= F.col("j")) & (F.col("mb") <= F.col("k")),
        )
        .groupBy("j", "k")
        .agg((F.sum("mp").cast("double") / F.sum("mn")).alias("avg_rate"))
    )
    i = b.select(F.col("bin").alias("i"))
    stage1 = (
        i.join(
            F.broadcast(iv),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("avg_rate").alias("min_k"))
    )
    iso = stage1.groupBy("i").agg(F.max("min_k").alias("iso_rate"))
    return (
        b.join(iso, b.bin == iso.i)
        .select(
            "bin",
            "n",
            F.round(F.col("n_pos").cast("double") / F.col("n"), 9).alias(
                "observed_rate"
            ),
            F.round("iso_rate", 9).alias("isotonic_rate"),
        )
    )


def _wire_isotonic_oracle() -> None:
    from zmaxion_spark.queries.registry import REGISTRY, Query

    q = REGISTRY["q_isotonic_calibration"]
    REGISTRY["q_isotonic_calibration"] = Query(
        q.name,
        q.fn,
        _isotonic_oracle().replace("{ECE}", REGISTRY["q_calibration_ece"].oracle),
        q.operators,
        q.doc,
        q.bench,
    )


_wire_isotonic_oracle()


# ---------------------------------------------------------------------------
# #268 group_split_leakfree — group-aware split + leakage audit
# ---------------------------------------------------------------------------

_GS_HASH = "CAST(('0x' || SUBSTR(MD5(CAST({col} AS VARCHAR)), 1, 8)) AS BIGINT)"


@query(
    "q_group_split",
    oracle=f"""
        WITH assigned AS (
            SELECT user_id, event_id,
                   CASE WHEN {_GS_HASH.format(col='user_id')} % 10 < 8
                        THEN 'train' ELSE 'test' END AS split
            FROM events
        ),
        per AS (
            SELECT split, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   COUNT(DISTINCT user_id) AS n_groups
            FROM assigned GROUP BY split
        ),
        leak AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS leaked_groups FROM (
                SELECT user_id FROM assigned
                GROUP BY user_id HAVING COUNT(DISTINCT split) > 1)
        )
        SELECT split, n_rows, n_groups, leaked_groups
        FROM per CROSS JOIN leak
    """,
    operators=(25, 77, 268),
    doc="Group-aware train/test split (#268): rows split by a hash of "
    "their GROUP key (user), never the row id, so all of a user's "
    "events land on one side — the leakage-prevention rule for any "
    "model evaluated per-entity (a row-hash split would let the model "
    "memorize the test users from their train rows). The query emits "
    "the per-split census AND the graded leakage audit: the count of "
    "groups appearing in more than one split, which the construction "
    "forces to 0 — the oracle recomputes the audit independently, so "
    "a hash-exact pass PROVES leak-freedom rather than asserting it. "
    "Deterministic md5 bucketing keeps membership stable across runs, "
    "engines, and incremental data. Scale: the assignment is a "
    "row-local projection; the audit is one groupBy on the group key.",
)
def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    assigned = ev.select(
        "user_id",
        "event_id",
        F.when(bucket < 8, "train").otherwise("test").alias("split"),
    ).localCheckpoint(eager=True)
    per = assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_groups"),
    )
    leak = (
        assigned.groupBy("user_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("leaked_groups"))
    )
    return per.crossJoin(F.broadcast(leak)).select(
        "split", "n_rows", "n_groups", "leaked_groups"
    )


# ---------------------------------------------------------------------------
# #269 negative_sampling — smoothed-unigram deterministic negatives
# ---------------------------------------------------------------------------

_NS_K = 3  # negatives per sampled document
_NS_V = 64  # candidate vocabulary size


@query(
    "q_negative_sampling",
    oracle=f"""
        WITH tok AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term
                     FROM documents),
        freq AS (SELECT term, COUNT(*) AS n FROM tok
                 WHERE term <> '' GROUP BY term),
        vocab AS (
            SELECT term, n,
                   SQRT(SQRT(CAST(n * n * n AS DOUBLE))) AS w,
                   ROW_NUMBER() OVER (ORDER BY n DESC, term) AS r
            FROM freq QUALIFY r <= {_NS_V}
        ),
        cum AS (
            SELECT term, r, w,
                   SUM(w) OVER (ORDER BY r
                                ROWS UNBOUNDED PRECEDING) AS cw
            FROM vocab
        ),
        tot AS (SELECT MAX(cw) AS tw FROM cum),
        slots AS (
            SELECT d.doc_id, k.k,
                   CAST(('0x' || SUBSTR(MD5('neg:' || CAST(d.doc_id AS VARCHAR)
                        || ':' || CAST(k.k AS VARCHAR)), 1, 13)) AS BIGINT)
                   / 4503599627370496 * tot.tw AS u
            FROM documents d
            CROSS JOIN (SELECT UNNEST(RANGE(1, {_NS_K} + 1)) AS k) k
            CROSS JOIN tot
            WHERE d.doc_id % 7 = 0
        )
        SELECT s.doc_id, CAST(s.k AS BIGINT) AS k,
               ARG_MIN(c.term, c.r) AS neg_term,
               CAST(MIN(c.r) AS BIGINT) AS neg_rank
        FROM slots s JOIN cum c ON c.cw >= s.u
        GROUP BY s.doc_id, s.k
    """,
    operators=(44, 225, 269),
    doc=f"Smoothed-unigram negative sampling (#269), the word2vec/"
    "contrastive-training draw: candidate vocabulary = top-"
    f"{_NS_V} tokens, sampling weight n^0.75 computed as "
    "SQRT(SQRT(n^3)) — two correctly-rounded IEEE ops over an exact "
    "integer cube, bit-identical on both engines where POW's libm "
    f"would drift — and {_NS_K} negatives per sampled doc drawn by "
    "inverse-CDF: an md5-derived uniform in [0, W) against the "
    "running-sum weight table (first bucket with cum >= u, the "
    "argmin-by-rank tiebreak). Every draw is reproducible from "
    "(doc_id, slot) alone — resumable shard-parallel sampling with "
    "no RNG state. Scale: the CDF table is vocab-sized (broadcast); "
    "draws are row-local expressions; the lookup is a broadcast "
    "range join bounded by |vocab| per draw — at 100 TB swap in a "
    "bucketized searchsorted via mapInPandas, same contract.",
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    w = F.sqrt(F.sqrt((F.col("n") * F.col("n") * F.col("n")).cast("double")))
    vocab = (
        freq.select("term", "n", w.alias("w"))
        .withColumn(
            "r", F.row_number().over(Window.orderBy(F.col("n").desc(), "term"))
        )
        .filter(F.col("r") <= _NS_V)
    )
    cum = vocab.select(
        "term",
        "r",
        F.sum("w")
        .over(Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cw"),
    ).localCheckpoint(eager=True)
    tw = cum.agg(F.max("cw").alias("tw"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("neg:"),
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("k").cast("string"),
                    ).cast("binary")
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4503599627370496)
        * F.col("tw")
    )
    slots = (
        d.filter(F.col("doc_id") % 7 == 0)
        .select("doc_id")
        .crossJoin(F.broadcast(tw))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.lit(_NS_K))).alias("k"),
            F.col("tw"),
        )
        .select("doc_id", "k", u.alias("u"))
    )
    return (
        slots.join(F.broadcast(cum), F.col("cw") >= F.col("u"))
        .groupBy("doc_id", "k")
        .agg(
            F.min_by("term", "r").alias("neg_term"),
            F.min("r").cast("bigint").alias("neg_rank"),
        )
        .select("doc_id", F.col("k").cast("bigint").alias("k"), "neg_term", "neg_rank")
    )


# ---------------------------------------------------------------------------
# #288 corpus BLEU (clipped n-gram precision + brevity penalty)
# ---------------------------------------------------------------------------

_BLEU_DROP = 7  # the hypothesis drops every 7th token of the reference


def _bleu_grams_sql(src: str) -> str:
    """LEAD-chained 1..4-gram rows over a (doc_id, lang, tok, pos)
    CTE — `||` null-propagates, so a tail position short of n tokens
    yields NULL and is filtered, never a truncated gram."""
    return f"""(
        WITH g AS (
            SELECT doc_id, lang, tok,
                   LEAD(tok, 1) OVER w AS t1,
                   LEAD(tok, 2) OVER w AS t2,
                   LEAD(tok, 3) OVER w AS t3
            FROM {src} WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        )
        SELECT doc_id, lang, n, gram FROM (
            SELECT doc_id, lang, 1 AS n, tok AS gram FROM g
            UNION ALL
            SELECT doc_id, lang, 2, tok || ' ' || t1 FROM g
            UNION ALL
            SELECT doc_id, lang, 3, tok || ' ' || t1 || ' ' || t2 FROM g
            UNION ALL
            SELECT doc_id, lang, 4,
                   tok || ' ' || t1 || ' ' || t2 || ' ' || t3 FROM g
        ) WHERE gram IS NOT NULL
    )"""


@query(
    "q_bleu_eval",
    oracle=f"""
        WITH tok AS MATERIALIZED (
            SELECT doc_id, lang,
                   UNNEST(STRING_SPLIT(text, ' ')) AS tok,
                   UNNEST(RANGE(1, LEN(STRING_SPLIT(text, ' ')) + 1)) AS pos
            FROM documents
        ),
        htok AS MATERIALIZED (
            SELECT doc_id, lang, tok, pos FROM tok
            WHERE pos % {_BLEU_DROP} != 0
        ),
        rc AS MATERIALIZED (
            SELECT doc_id, lang, n, gram, COUNT(*) AS c
            FROM {{REF_GRAMS}} GROUP BY doc_id, lang, n, gram
        ),
        hc AS MATERIALIZED (
            SELECT doc_id, lang, n, gram, COUNT(*) AS c
            FROM {{HYP_GRAMS}} GROUP BY doc_id, lang, n, gram
        ),
        clip AS (
            SELECT hc.lang, hc.n, hc.c AS h,
                   LEAST(hc.c, COALESCE(rc.c, 0)) AS cl
            FROM hc LEFT JOIN rc
              ON rc.doc_id = hc.doc_id AND rc.n = hc.n AND rc.gram = hc.gram
        ),
        pern AS (
            SELECT lang, n, CAST(SUM(cl) AS BIGINT) AS num,
                   CAST(SUM(h) AS BIGINT) AS den
            FROM clip GROUP BY lang, n
        ),
        lens AS (
            SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS rlen,
                   CAST(SUM(CASE WHEN pos % {_BLEU_DROP} != 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS hlen
            FROM tok GROUP BY lang
        ),
        piv AS (
            SELECT lang,
                   MAX(CASE WHEN n = 1 THEN num END) AS num1,
                   MAX(CASE WHEN n = 1 THEN den END) AS den1,
                   MAX(CASE WHEN n = 2 THEN num END) AS num2,
                   MAX(CASE WHEN n = 2 THEN den END) AS den2,
                   MAX(CASE WHEN n = 3 THEN num END) AS num3,
                   MAX(CASE WHEN n = 3 THEN den END) AS den3,
                   MAX(CASE WHEN n = 4 THEN num END) AS num4,
                   MAX(CASE WHEN n = 4 THEN den END) AS den4
            FROM pern GROUP BY lang
        )
        SELECT l.lang, l.n_docs, l.rlen AS ref_len, l.hlen AS hyp_len,
               CAST(CAST(CAST(num1 AS DOUBLE) / den1 AS DECIMAL(38,9))
                    AS DOUBLE) AS p1,
               CAST(CAST(CAST(num2 AS DOUBLE) / den2 AS DECIMAL(38,9))
                    AS DOUBLE) AS p2,
               CAST(CAST(CAST(num3 AS DOUBLE) / den3 AS DECIMAL(38,9))
                    AS DOUBLE) AS p3,
               CAST(CAST(CAST(num4 AS DOUBLE) / den4 AS DECIMAL(38,9))
                    AS DOUBLE) AS p4,
               CASE WHEN num1 > 0 AND num2 > 0 AND num3 > 0 AND num4 > 0
                    THEN CAST(CAST(
                        (CASE WHEN hlen >= rlen THEN CAST(1.0 AS DOUBLE)
                              ELSE EXP(1 - CAST(rlen AS DOUBLE) / hlen) END)
                        * EXP((LN(CAST(num1 AS DOUBLE) / den1)
                               + LN(CAST(num2 AS DOUBLE) / den2)
                               + LN(CAST(num3 AS DOUBLE) / den3)
                               + LN(CAST(num4 AS DOUBLE) / den4)) / 4)
                        AS DECIMAL(38,9)) AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END AS bleu
        FROM piv p JOIN lens l ON l.lang = p.lang
    """.replace("{REF_GRAMS}", _bleu_grams_sql("tok")).replace(
        "{HYP_GRAMS}", _bleu_grams_sql("htok")
    ),
    operators=(23, 31, 41, 44, 288),
    doc=f"Corpus BLEU (#288), the canonical machine-translation / "
    "text-generation eval beside the ranking metrics (#265): the "
    "hypothesis is the reference with every "
    f"{_BLEU_DROP}th token dropped (a deterministic degradation, so "
    "the score is meaningful and reproducible), and per language the "
    "query computes clipped modified n-gram precisions p1..p4 (each "
    "hyp n-gram's count capped by its count in THAT document's "
    "reference — dropping an interior token manufactures unseen "
    "adjacencies, which is exactly what BLEU punishes), the brevity "
    "penalty exp(1 − r/c), and BLEU = BP·exp(Σ ln pn / 4). "
    "N-grams chain LEAD over the per-doc token order (null-propagating "
    "concat, so tail positions never emit truncated grams); every "
    "count stays BIGINT; the two transcendental steps are identical "
    "IEEE trees on exact-integer ratios quantized at 1e-9; a zero "
    "clipped count short-circuits to BLEU 0 via a null-safe AND chain "
    "(LEAST-over-null diverges between engines). Scale: token "
    "explode → two map-side-combined gram counts → one shuffle join "
    "on (doc, n, gram) → |langs|×4 cells; no window wider than a "
    "document, no driver state.",
)
def q_bleu_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    tok = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
        )
        .select("doc_id", "lang", (F.col("pos0") + 1).alias("pos"), "tok")
        # Round 12 (guide §2.5, the q_graph_2hop pattern): AQE
        # coalesced every window-input exchange by its ~12 MB INPUT
        # bytes, so the (doc_id,pos) sorts, the 4-way gram explode and
        # the gram aggregates all ran on a handful of tasks. A user
        # repartition on doc_id is AQE-coalescing-exempt
        # (REPARTITION_BY_NUM): the executed plans show the window
        # branches' AQEShuffleRead(coalesced) nodes gone after the pin
        # (plans/r12/q_bleu_eval_{before,after}_executed.txt) and the
        # downstream stages at full parallelism. LEAD values are
        # unchanged: same partition set, same intra-partition
        # (doc_id, pos) sort each window does. A/B ×4 (min): old
        # 3.27 s / new 2.59 s, new ≤ old every settled cycle; a
        # follow-up regrouping of the gram aggregate onto the
        # clip-join keys was measured and REJECTED (wash to slightly
        # negative — OPTIMIZATION_r12.md).
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    wnd = Window.partitionBy("doc_id").orderBy("pos")

    def gram_counts(rows: DataFrame) -> DataFrame:
        g = rows.select(
            "doc_id",
            "lang",
            "tok",
            F.lead("tok", 1).over(wnd).alias("t1"),
            F.lead("tok", 2).over(wnd).alias("t2"),
            F.lead("tok", 3).over(wnd).alias("t3"),
        )
        sp = F.lit(" ")
        grams = F.array(
            F.struct(F.lit(1).alias("n"), F.col("tok").alias("gram")),
            F.struct(
                F.lit(2).alias("n"),
                F.concat("tok", sp, "t1").alias("gram"),
            ),
            F.struct(
                F.lit(3).alias("n"),
                F.concat("tok", sp, "t1", sp, "t2").alias("gram"),
            ),
            F.struct(
                F.lit(4).alias("n"),
                F.concat("tok", sp, "t1", sp, "t2", sp, "t3").alias("gram"),
            ),
        )
        return (
            g.select("doc_id", "lang", F.explode(grams).alias("s"))
            .select("doc_id", "lang", "s.n", "s.gram")
            .filter(F.col("gram").isNotNull())
            .groupBy("doc_id", "lang", "n", "gram")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    rc = gram_counts(tok)
    hc = gram_counts(tok.filter(F.col("pos") % _BLEU_DROP != 0))
    clip = hc.alias("h").join(
        rc.alias("r"),
        (F.col("r.doc_id") == F.col("h.doc_id"))
        & (F.col("r.n") == F.col("h.n"))
        & (F.col("r.gram") == F.col("h.gram")),
        "left",
    ).select(
        F.col("h.lang").alias("lang"),
        F.col("h.n").alias("n"),
        F.col("h.c").alias("h"),
        F.least(F.col("h.c"), F.coalesce(F.col("r.c"), F.lit(0))).alias("cl"),
    )
    pern = clip.groupBy("lang", "n").agg(
        F.sum("cl").cast("bigint").alias("num"),
        F.sum("h").cast("bigint").alias("den"),
    )
    lens = tok.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("rlen"),
        F.sum(
            F.when(F.col("pos") % _BLEU_DROP != 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("hlen"),
    )
    piv = pern.groupBy("lang").agg(
        *[
            F.max(F.when(F.col("n") == i, F.col(c))).alias(f"{c}{i}")
            for i in (1, 2, 3, 4)
            for c in ("num", "den")
        ]
    )

    def pn(i: int):
        return F.col(f"num{i}").cast("double") / F.col(f"den{i}")

    bp = F.when(
        F.col("hlen") >= F.col("rlen"), F.lit(1.0)
    ).otherwise(F.exp(F.lit(1) - F.col("rlen").cast("double") / F.col("hlen")))
    logsum = F.log(pn(1)) + F.log(pn(2)) + F.log(pn(3)) + F.log(pn(4))
    bleu = F.when(
        (F.col("num1") > 0)
        & (F.col("num2") > 0)
        & (F.col("num3") > 0)
        & (F.col("num4") > 0),
        (bp * F.exp(logsum / 4)).cast("decimal(38,9)").cast("double"),
    ).otherwise(F.lit(0.0))
    return piv.join(lens, "lang").select(
        "lang",
        "n_docs",
        F.col("rlen").alias("ref_len"),
        F.col("hlen").alias("hyp_len"),
        *[
            pn(i).cast("decimal(38,9)").cast("double").alias(f"p{i}")
            for i in (1, 2, 3, 4)
        ],
        bleu.alias("bleu"),
    )


# ---------------------------------------------------------------------------
# #317 embargoed temporal split (purged time-series CV)
# ---------------------------------------------------------------------------

_EMB_US = 86_400_000_000  # 1-day embargo around the split point


@query(
    "q_embargoed_split",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id,
                   EPOCH_US(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ),
        t AS (SELECT (MIN(us) + MAX(us)) // 2 AS t FROM e),
        lab AS (
            SELECT e.user_id, e.event_id,
                   CASE WHEN e.us >= t.t THEN 'test'
                        WHEN e.us >= t.t - {_EMB_US} THEN 'embargo'
                        ELSE 'train' END AS split
            FROM e CROSS JOIN t
        ),
        census AS (
            SELECT split, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM lab GROUP BY split
        ),
        leak AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_leaks FROM (
                SELECT a.user_id
                FROM lab a JOIN lab b
                  ON b.user_id = a.user_id
                 AND a.split = 'train' AND b.split = 'test'
                JOIN e ea ON ea.event_id = a.event_id
                JOIN e eb ON eb.event_id = b.event_id
                CROSS JOIN t
                WHERE eb.us - ea.us < {_EMB_US}
            )
        )
        SELECT census.split, n_rows, n_users, leak.n_leaks
        FROM census CROSS JOIN leak
    """,
    operators=(77, 236, 317),
    doc="Embargoed temporal split (#317), the purged time-series CV "
    "from quantitative finance (de Prado) beside the hash split (#77) "
    "and PIT features (#236): train is everything a full embargo "
    "before the split instant, test everything after, and the embargo "
    "band between them is DISCARDED — features computed over trailing "
    "windows of train rows would otherwise overlap test labels and "
    "leak. The graded leak audit counts (train, test) same-user "
    "event pairs closer than the embargo — ZERO by construction here, "
    "and the column exists so a wrong embargo shows up as a nonzero "
    "integer, not a silent model-quality mystery. All integer µs. "
    "Scale: one labeling pass; the audit join is per-user and only "
    "exists to be zero.",
)
def q_embargoed_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as FF

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        FF.unix_micros(FF.col("ts").cast("timestamp")).alias("us"),
    )
    b = e.agg(FF.min("us").alias("mn"), FF.max("us").alias("mx")).collect()[0]
    t = (b.mn + b.mx) // 2
    lab = e.select(
        "user_id",
        "event_id",
        "us",
        FF.when(FF.col("us") >= t, "test")
        .when(FF.col("us") >= t - _EMB_US, "embargo")
        .otherwise("train")
        .alias("split"),
    ).localCheckpoint(eager=True)  # census + audit
    census = lab.groupBy("split").agg(
        FF.count(FF.lit(1)).cast("bigint").alias("n_rows"),
        FF.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    a = lab.filter(FF.col("split") == "train").select(
        FF.col("user_id").alias("u"), FF.col("us").alias("ua")
    )
    bb = lab.filter(FF.col("split") == "test").select(
        FF.col("user_id").alias("u"), FF.col("us").alias("ub")
    )
    leak = (
        a.join(bb, "u")
        .filter(FF.col("ub") - FF.col("ua") < _EMB_US)
        .agg(FF.count(FF.lit(1)).cast("bigint").alias("n_leaks"))
    )
    return census.crossJoin(FF.broadcast(leak)).select(
        "split", "n_rows", "n_users", "n_leaks"
    )


# ---------------------------------------------------------------------------
# #325 multi-class F1 evaluation (micro + macro over the lang-ID rule)
# ---------------------------------------------------------------------------

_F1_LANGID_CTE = """
        t AS (SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS toks
              FROM documents),
        s AS (SELECT doc_id, lang,
               LEN(LIST_INTERSECT(toks, ['der','die','und','ist','nicht','das','ein','mit'])) AS s_de,
               LEN(LIST_INTERSECT(toks, ['the','and','is','of','to','a','in','that'])) AS s_en,
               LEN(LIST_INTERSECT(toks, ['el','la','los','que','de','y','un','en'])) AS s_es,
               LEN(LIST_INTERSECT(toks, ['le','la','les','et','est','un','une','dans'])) AS s_fr,
               LEN(LIST_INTERSECT(toks, ['的','是','了','在','我','有','和','不'])) AS s_zh
              FROM t),
        pred AS (
            SELECT doc_id, lang,
                   CASE WHEN GREATEST(s_de, s_en, s_es, s_fr, s_zh) = 0
                             THEN 'und'
                        WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr, s_zh)
                             THEN 'de'
                        WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr, s_zh)
                             THEN 'en'
                        WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr, s_zh)
                             THEN 'es'
                        WHEN s_fr = GREATEST(s_de, s_en, s_es, s_fr, s_zh)
                             THEN 'fr'
                        ELSE 'zh' END AS pred_lang
            FROM s
        )
"""


@query(
    "q_f1_eval",
    oracle=f"""
        WITH {_F1_LANGID_CTE},
        classes AS (SELECT DISTINCT lang AS cls FROM pred),
        per AS (
            SELECT c.cls,
                   CAST(SUM(CASE WHEN p.lang = c.cls AND p.pred_lang = c.cls
                                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN p.lang <> c.cls AND p.pred_lang = c.cls
                                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN p.lang = c.cls AND p.pred_lang <> c.cls
                                 THEN 1 ELSE 0 END) AS BIGINT) AS fn
            FROM pred p CROSS JOIN classes c
            GROUP BY c.cls
        )
        SELECT cls, tp, fp, fn,
               CAST(CAST(CASE WHEN tp + fp > 0
                              THEN CAST(tp AS DOUBLE) / (tp + fp)
                              ELSE CAST(0 AS DOUBLE) END
                         AS DECIMAL(38,9)) AS DOUBLE) AS precision_,
               CAST(CAST(CASE WHEN tp + fn > 0
                              THEN CAST(tp AS DOUBLE) / (tp + fn)
                              ELSE CAST(0 AS DOUBLE) END
                         AS DECIMAL(38,9)) AS DOUBLE) AS recall_,
               CAST(CAST(CASE WHEN 2 * tp + fp + fn > 0
                              THEN 2 * CAST(tp AS DOUBLE)
                                   / (2 * tp + fp + fn)
                              ELSE CAST(0 AS DOUBLE) END
                         AS DECIMAL(38,9)) AS DOUBLE) AS f1
        FROM per
    """,
    operators=(64, 226, 325),
    doc="Multi-class F1 evaluation (#325) of the lang-ID rule (#64's "
    "classifier) against the true labels: per-class tp/fp/fn and "
    "precision/recall/F1 — the classification-eval sibling of AUC "
    "(#226) and ECE (#227), and the report every labeling pipeline "
    "publishes (micro-F1 = accuracy for single-label problems falls "
    "out as Σtp/(Σtp+Σfp); macro-F1 is the per-class mean — both "
    "derivable from these rows, which is why the ROWS are what is "
    "graded). F1 = 2tp/(2tp+fp+fn) avoids the p,r intermediate — "
    "one quantized division per cell, zero-denominator guarded on "
    "both engines. Scale: one classify pass + a |classes|-wide "
    "conditional aggregate; no joins beyond the class grid.",
)
def q_f1_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zmaxion_spark.queries.llm import q_lang_id

    pred = q_lang_id(spark, sf_dir)
    classes = pred.select(F.col("lang").alias("cls")).distinct()
    per = (
        pred.crossJoin(F.broadcast(classes))
        .groupBy("cls")
        .agg(
            F.sum(
                F.when(
                    (F.col("lang") == F.col("cls"))
                    & (F.col("pred_lang") == F.col("cls")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when(
                    (F.col("lang") != F.col("cls"))
                    & (F.col("pred_lang") == F.col("cls")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            F.sum(
                F.when(
                    (F.col("lang") == F.col("cls"))
                    & (F.col("pred_lang") != F.col("cls")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fn"),
        )
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")),
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        2 * F.col("tp").cast("double")
        / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
    ).otherwise(F.lit(0.0))
    return per.select(
        "cls",
        "tp",
        "fp",
        "fn",
        prec.cast("decimal(38,9)").cast("double").alias("precision_"),
        rec.cast("decimal(38,9)").cast("double").alias("recall_"),
        f1.cast("decimal(38,9)").cast("double").alias("f1"),
    )


# ---------------------------------------------------------------------------
# #333 decile lift / gains table  +  #334 Brier decomposition
# ---------------------------------------------------------------------------

_SCORED_SQL = """
            SELECT d.doc_id,
                   CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
                   q.quality_score AS s
            FROM documents d
            JOIN (
                SELECT doc_id,
                       ROUND(1 / (1 + EXP(-(z))), 9) AS quality_score
                FROM (
                    SELECT doc_id, 0.160745 + 0.904206 * (LN(1 + LENGTH(text)) - 5.5)
                           + 0.461865 * (CAST(LENGTH(text) AS DOUBLE)
                                     / LEN(STRING_SPLIT(text, ' ')) - 6.0)
                           + 0.160662 * (CAST(LENGTH(text)
                                          - LENGTH(REPLACE(text, ' ', ''))
                                          AS DOUBLE) / LENGTH(text) - 0.16) AS z
                    FROM documents WHERE LENGTH(text) > 0
                )
            ) q ON q.doc_id = d.doc_id
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return q_quality_classifier(spark, sf_dir).join(
        d.select(
            "doc_id", F.when(F.col("lang") == "en", 1).otherwise(0).alias("y")
        ),
        "doc_id",
    ).select("doc_id", "y", F.col("quality_score").alias("s"))


@query(
    "q_decile_lift",
    oracle=f"""
        WITH scored AS ({_SCORED_SQL}),
        ranked AS (
            SELECT y, NTILE(10) OVER (ORDER BY s DESC, doc_id) AS decile
            FROM scored
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_tot,
                   CAST(SUM(y) AS BIGINT) AS pos_tot
            FROM scored
        ),
        per AS (
            SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS n_pos
            FROM ranked GROUP BY decile
        ),
        cum AS (
            SELECT decile, n, n_pos,
                   SUM(n_pos) OVER (ORDER BY decile) AS cum_pos
            FROM per
        )
        SELECT CAST(decile AS INT) AS decile, n, n_pos,
               ROUND(CAST(n_pos AS DOUBLE) / pos_tot, 9) AS capture,
               ROUND((CAST(n_pos AS DOUBLE) / n)
                     / (CAST(pos_tot AS DOUBLE) / n_tot), 9) AS lift,
               ROUND(CAST(cum_pos AS DOUBLE) / pos_tot, 9) AS cum_capture
        FROM cum CROSS JOIN tot
        ORDER BY decile
    """,
    operators=(30, 226, 333),
    doc="Decile lift / gains table (#333), the campaign-targeting eval "
    "beside AUC (#226) and ROC (#235): documents ranked by classifier "
    "score split into 10 equal deciles (decile 1 = highest scores), "
    "each reporting capture rate, lift over base rate, and cumulative "
    "gains — the table that decides how deep to mail. The decile "
    "assignment reuses the round-6 bucket-decomposed rank machinery "
    "(functions/ranks.py): scores bucket by floor((1-s)*4096) — "
    "monotone in the DESCENDING sort order — so NTILE comes from an "
    "exact distributed row number + closed-form tile algebra, no "
    "single-partition window. All rates are exact-integer ratios "
    "under ROUND(9).",
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from zmaxion_spark.functions.ranks import bucketed_row_number, ntile_from_rn

    scored = _scored(spark, sf_dir).withColumn(
        "_bkt", F.floor((F.lit(1.0) - F.col("s")) * 4096).cast("long")
    )
    tot = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tot"),
        F.sum("y").cast("bigint").alias("pos_tot"),
    )
    ranked = bucketed_row_number(
        scored, "_bkt", [F.desc("s"), "doc_id"], out="rn"
    ).crossJoin(F.broadcast(tot))
    per = (
        ranked.select(
            ntile_from_rn("rn", "n_tot", 10).alias("decile"), "y", "n_tot", "pos_tot"
        )
        .groupBy("decile", "n_tot", "pos_tot")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
        )
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.withColumn("cum_pos", F.sum("n_pos").over(wc))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n",
            "n_pos",
            F.round(F.col("n_pos").cast("double") / F.col("pos_tot"), 9).alias(
                "capture"
            ),
            F.round(
                (F.col("n_pos").cast("double") / F.col("n"))
                / (F.col("pos_tot").cast("double") / F.col("n_tot")),
                9,
            ).alias("lift"),
            F.round(F.col("cum_pos").cast("double") / F.col("pos_tot"), 9).alias(
                "cum_capture"
            ),
        )
        .orderBy("decile")
    )


@query(
    "q_brier_decomposition",
    oracle=f"""
        WITH scored AS ({_SCORED_SQL}),
        terms AS (
            SELECT y, s, LEAST(CAST(FLOOR(s * 10) AS BIGINT), 9) AS bin,
                   CAST((s - y) * (s - y) AS DECIMAL(38,18)) AS sq
            FROM scored
        ),
        g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(sq) AS DOUBLE) AS sq_sum,
                   CAST(SUM(y) AS BIGINT) AS pos
            FROM terms
        ),
        bins AS (
            SELECT bin, COUNT(*) AS nk, SUM(y) AS posk,
                   CAST(SUM(CAST(s AS DECIMAL(38,9))) AS DOUBLE) AS s_sum
            FROM terms GROUP BY bin
        ),
        parts AS (
            SELECT b.bin, b.nk,
                   CAST(b.nk * (CAST(b.posk AS DOUBLE) / b.nk
                                - b.s_sum / b.nk)
                        * (CAST(b.posk AS DOUBLE) / b.nk - b.s_sum / b.nk)
                        AS DECIMAL(38,18)) AS rel_t,
                   CAST(b.nk * (CAST(b.posk AS DOUBLE) / b.nk
                                - CAST(g.pos AS DOUBLE) / g.n)
                        * (CAST(b.posk AS DOUBLE) / b.nk
                           - CAST(g.pos AS DOUBLE) / g.n)
                        AS DECIMAL(38,18)) AS res_t
            FROM bins b CROSS JOIN g
        )
        SELECT g.n,
               ROUND(g.sq_sum / g.n, 9) AS brier,
               ROUND(CAST(SUM(p.rel_t) AS DOUBLE) / g.n, 9) AS reliability,
               ROUND(CAST(SUM(p.res_t) AS DOUBLE) / g.n, 9) AS resolution,
               ROUND((CAST(g.pos AS DOUBLE) / g.n)
                     * (1 - CAST(g.pos AS DOUBLE) / g.n), 9) AS uncertainty
        FROM parts p CROSS JOIN g
        GROUP BY g.n, g.sq_sum, g.pos
    """,
    operators=(24, 227, 334),
    doc="Brier score + Murphy decomposition (#334), completing the "
    "calibration family (ECE #227, reliability bins): mean squared "
    "forecast error split into RELIABILITY (bin-mean forecast vs "
    "bin outcome rate — miscalibration), RESOLUTION (bin outcome "
    "spread vs base rate — discrimination), and UNCERTAINTY "
    "(base-rate variance), over 10 fixed score bins. Parity: squared "
    "terms are doubles of identical operands summed through "
    "DECIMAL(38,18) (order-independent); per-bin means derive from "
    "exact integer counts and DECIMAL(38,9) score sums; the <=10 "
    "bin partials also sum as decimals. Scale: one scan to bin "
    "cells, constant-size state everywhere — the whole decomposition "
    "shuffles 10 rows.",
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored(spark, sf_dir)
    terms = scored.select(
        "y",
        "s",
        F.least(F.floor(F.col("s") * 10).cast("long"), F.lit(9)).alias("bin"),
        ((F.col("s") - F.col("y")) * (F.col("s") - F.col("y")))
        .cast("decimal(38,18)")
        .alias("sq"),
    )
    g = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("sq").cast("double").alias("sq_sum"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    bins = terms.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nk"),
        F.sum("y").alias("posk"),
        F.sum(F.col("s").cast("decimal(38,9)")).cast("double").alias("s_sum"),
    )
    yk = F.col("posk").cast("double") / F.col("nk")
    sk = F.col("s_sum") / F.col("nk")
    ybar = F.col("pos").cast("double") / F.col("n")
    parts = bins.crossJoin(F.broadcast(g)).select(
        "n",
        "sq_sum",
        "pos",
        (F.col("nk") * (yk - sk) * (yk - sk)).cast("decimal(38,18)").alias(
            "rel_t"
        ),
        (F.col("nk") * (yk - ybar) * (yk - ybar))
        .cast("decimal(38,18)")
        .alias("res_t"),
    )
    return parts.groupBy("n", "sq_sum", "pos").agg(
        F.sum("rel_t").cast("double").alias("_rel"),
        F.sum("res_t").cast("double").alias("_res"),
    ).select(
        "n",
        F.round(F.col("sq_sum") / F.col("n"), 9).alias("brier"),
        F.round(F.col("_rel") / F.col("n"), 9).alias("reliability"),
        F.round(F.col("_res") / F.col("n"), 9).alias("resolution"),
        F.round(
            (F.col("pos").cast("double") / F.col("n"))
            * (1 - F.col("pos").cast("double") / F.col("n")),
            9,
        ).alias("uncertainty"),
    )


# ---------------------------------------------------------------------------
# #351 decision_stump — best information-gain split over a feature census
# ---------------------------------------------------------------------------

_STUMP_TOPK = 5


@query(
    "q_decision_stump",
    oracle=f"""
        WITH pts AS (
            SELECT n_chars AS x,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents
        ),
        cells AS (
            SELECT x, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS pos
            FROM pts GROUP BY x
        ),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS pt
            FROM cells
        ),
        run AS (
            SELECT x,
                   CAST(SUM(n) OVER (ORDER BY x) AS BIGINT) AS nl,
                   CAST(SUM(pos) OVER (ORDER BY x) AS BIGINT) AS pl
            FROM cells
        ),
        ent AS (
            SELECT r.x AS threshold,
                   r.nl AS n_left, t.nt - r.nl AS n_right,
                   r.pl AS pos_left, t.pt - r.pl AS pos_right,
                   t.nt, t.pt
            FROM run r CROSS JOIN tot t
            WHERE r.nl < t.nt
        ),
        ig AS (
            SELECT threshold, n_left, n_right, pos_left, pos_right,
                   ROUND(
                     (CASE WHEN pt = 0 OR pt = nt THEN 0
                      ELSE -(CAST(pt AS DOUBLE)/nt) * LN(CAST(pt AS DOUBLE)/nt)
                           - (1 - CAST(pt AS DOUBLE)/nt)
                             * LN(1 - CAST(pt AS DOUBLE)/nt) END)
                     - CAST(n_left AS DOUBLE)/nt *
                       (CASE WHEN pos_left = 0 OR pos_left = n_left THEN 0
                        ELSE -(CAST(pos_left AS DOUBLE)/n_left)
                              * LN(CAST(pos_left AS DOUBLE)/n_left)
                             - (1 - CAST(pos_left AS DOUBLE)/n_left)
                               * LN(1 - CAST(pos_left AS DOUBLE)/n_left) END)
                     - CAST(n_right AS DOUBLE)/nt *
                       (CASE WHEN pos_right = 0 OR pos_right = n_right THEN 0
                        ELSE -(CAST(pos_right AS DOUBLE)/n_right)
                              * LN(CAST(pos_right AS DOUBLE)/n_right)
                             - (1 - CAST(pos_right AS DOUBLE)/n_right)
                               * LN(1 - CAST(pos_right AS DOUBLE)/n_right) END)
                   , 9) AS info_gain
            FROM ent
        )
        SELECT threshold, n_left, n_right, pos_left, pos_right, info_gain
        FROM ig
        ORDER BY info_gain DESC, threshold
        LIMIT {_STUMP_TOPK}
    """,
    operators=(23, 31, 351),
    doc=f"Decision stump (#351): the best binary split x <= t of a "
    "numeric feature (n_chars) against a label (lang='en') by "
    "information gain — the single-feature learner inside every "
    "boosted-tree round and THE feature-screening primitive beside "
    f"chi2 (#280) and WOE/IV (#212); top-{_STUMP_TOPK} candidate "
    "thresholds graded. All split statistics come from a RUNNING SUM "
    "over the (value, count, pos) CENSUS — distinct feature values, "
    "not rows, so the candidate sweep costs one window over cells "
    "(the quantile_hist #91 discipline); entropies are identical "
    "IEEE ln-trees over exact integer counts with 0·ln0 guarded by "
    "CASE on the integer boundary, one ROUND(9) before the ranked "
    "limit. Scale: cells are bounded by the feature's cardinality; "
    "for continuous features pre-bin to quantile cells first "
    "(#219) — the same plan then holds at any corpus size.",
    bench=False,
)
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pts = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("x"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    cells = pts.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("pos").cast("bigint").alias("pt"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    run = cells.select(
        F.col("x").alias("threshold"),
        F.sum("n").over(w).alias("nl"),
        F.sum("pos").over(w).alias("pl"),
    )
    ent = (
        run.crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("nt"))
        .select(
            "threshold",
            F.col("nl").alias("n_left"),
            (F.col("nt") - F.col("nl")).alias("n_right"),
            F.col("pl").alias("pos_left"),
            (F.col("pt") - F.col("pl")).alias("pos_right"),
            "nt",
            "pt",
        )
    )

    def h(pos, n):
        p = pos.cast("double") / n
        return F.when((pos == 0) | (pos == n), F.lit(0.0)).otherwise(
            -p * F.log(p) - (1 - p) * F.log(1 - p)
        )

    ig = (
        h(F.col("pt"), F.col("nt"))
        - F.col("n_left").cast("double") / F.col("nt")
        * h(F.col("pos_left"), F.col("n_left"))
        - F.col("n_right").cast("double") / F.col("nt")
        * h(F.col("pos_right"), F.col("n_right"))
    )
    return (
        ent.select(
            "threshold",
            "n_left",
            "n_right",
            "pos_left",
            "pos_right",
            F.round(ig, 9).alias("info_gain"),
        )
        .orderBy(F.desc("info_gain"), "threshold")
        .limit(_STUMP_TOPK)
    )
