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
            SELECT c.c_mktsegment AS seg, o.o_totalprice AS t
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
                   CAST(SUM(CAST(t AS DECIMAL(38,6))) AS DOUBLE) AS sum_all
            FROM joined
        ),
        per AS (
            SELECT seg, COUNT(*) AS n,
                   CAST(SUM(CAST(t AS DECIMAL(38,6))) AS DOUBLE) AS sum_t
            FROM joined GROUP BY seg
        )
        SELECT seg, n,
               ROUND(sum_t / n, 9) AS mean_target,
               ROUND((sum_t + {_TE_M} * (sum_all / n_all)) / (n + {_TE_M}), 9)
                   AS encoded,
               ROUND(sum_all / n_all, 9) AS global_mean
        FROM per CROSS JOIN g
    """,
    operators=(213,),
    doc=f"Smoothed target encoding (#213): each category (market "
    "segment) is encoded as (sum_target + m*global_mean)/(n + m) with "
    f"m={_TE_M} — the prior-blended category mean that protects rare "
    "categories from overfitting, the standard high-cardinality "
    "categorical encoder for gradient-boosted models. Sums ride "
    "DECIMAL(38,6) so the encoded values are order-independent and "
    "hash-exact. Scale shape: one fact-dim broadcast join, one hash "
    "aggregate per category plus one global aggregate broadcast back; "
    "the encoder table (one row per category) then broadcasts onto "
    "training data for application.",
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
    ).select(F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("t"))
    g = joined.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum(F.col("t").cast("decimal(38,6)")).cast("double").alias("sum_all"),
    )
    per = joined.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("t").cast("decimal(38,6)")).cast("double").alias("sum_t"),
    )
    gmean = F.col("sum_all") / F.col("n_all")
    return per.crossJoin(F.broadcast(g)).select(
        "seg",
        "n",
        F.round(F.col("sum_t") / F.col("n"), 9).alias("mean_target"),
        F.round(
            (F.col("sum_t") + _TE_M * gmean) / (F.col("n") + _TE_M), 9
        ).alias("encoded"),
        F.round(gmean, 9).alias("global_mean"),
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
