"""Round-7 experimentation wave — SURVEY.md §2 (#394–#395).

Exact Bayesian A/B (the closed finite-sum P(B > A) over Beta
posteriors, computed with the #375 portable ln-factorial machinery)
and the doubly-robust ATE estimator that combines the propensity
(#281/#306) and outcome-regression (#163) halves the engine already
carries — consistent if EITHER model is right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.analysis7_q import _sql_lf
from zmaxion_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# #394 bayesian_ab — exact P(variant beats control) over Beta posteriors
# ---------------------------------------------------------------------------


def _sql_lbeta(x: str, y: str) -> str:
    """ln Beta(x, y) for positive-integer SQL expressions."""
    return (
        f"({_sql_lf(f'({x}) - 1')} + {_sql_lf(f'({y}) - 1')}"
        f" - {_sql_lf(f'({x}) + ({y}) - 1')})"
    )


# P(B > A) = sum_{i=0}^{aB-1} exp( lnB(aA+i, bA+bB) - ln(bB+i)
#                                  - lnB(1+i, bB) - lnB(aA, bA) )
_BAYES_TERM = (
    f"({_sql_lbeta('aa + i', 'ba + bb')} - LN(CAST(bb + i AS DOUBLE))"
    f" - {_sql_lbeta('1 + i', 'bb')} - {_sql_lbeta('aa', 'ba')})"
)


@query(
    "q_bayesian_ab",
    oracle=f"""
        WITH conv AS (
            SELECT user_id % 2 AS arm,
                   CAST(MAX(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c
            FROM events GROUP BY user_id
        ),
        cells AS (
            SELECT CAST(SUM(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT)
                       + 1 AS aa,
                   CAST(SUM(CASE WHEN arm = 0 THEN 1 - c ELSE 0 END)
                        AS BIGINT) + 1 AS ba,
                   CAST(SUM(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT)
                       + 1 AS ab,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 - c ELSE 0 END)
                        AS BIGINT) + 1 AS bb_
            FROM conv
        ),
        ks AS (
            SELECT aa, ba, ab, bb_ AS bb,
                   UNNEST(GENERATE_SERIES(CAST(0 AS BIGINT), ab - 1)) AS i
            FROM cells
        ),
        terms AS (
            SELECT aa, ba, ab, bb, {_BAYES_TERM} AS lt FROM ks
        )
        SELECT ANY_VALUE(aa) - 1 AS conv_a,
               ANY_VALUE(aa) + ANY_VALUE(ba) - 2 AS n_a,
               ANY_VALUE(ab) - 1 AS conv_b,
               ANY_VALUE(ab) + ANY_VALUE(bb) - 2 AS n_b,
               ROUND(CAST(SUM(CAST(EXP(lt) AS DECIMAL(38,18))) AS DOUBLE), 9)
                   AS p_b_beats_a,
               CAST(CAST(SUM(CAST(EXP(lt) AS DECIMAL(38,18))) AS DOUBLE)
                    >= 0.95 AS INT) AS ship_b
        FROM terms
        GROUP BY ALL
    """,
    operators=(23, 24, 375, 394),
    doc="Exact Bayesian A/B (#394): P(p_B > p_A) under independent "
    "Beta(1,1)-prior posteriors on per-user purchase conversion — "
    "computed by the EXACT finite sum sum_i exp(lnB(aA+i, bA+bB) - "
    "ln(bB+i) - lnB(1+i,bB) - lnB(aA,bA)) rather than Monte Carlo, "
    "so the decision is deterministic and oracle-checkable; the "
    "posterior-probability framing answers 'how sure are we B is "
    "better' where the frequentist gates (#147/#286/#369) answer "
    "'can we reject equality'. Parity: ln-Beta through the #375 "
    "portable Stirling lf() (one generated SQL text, no engine "
    "lgamma), terms sum through DECIMAL(38,18). Scale: the sum has "
    "conversions_B + 1 terms fanned from ONE 1-row census — linear, "
    "partitionable, and bounded by the conversion count.",
    bench=False,
)
def q_bayesian_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    conv = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("c")
        )
        .select((F.col("user_id") % 2).alias("arm"), "c")
    )
    cells = conv.agg(
        (F.sum(F.when(F.col("arm") == 0, F.col("c")).otherwise(0)) + 1)
        .cast("bigint")
        .alias("aa"),
        (F.sum(F.when(F.col("arm") == 0, 1 - F.col("c")).otherwise(0)) + 1)
        .cast("bigint")
        .alias("ba"),
        (F.sum(F.when(F.col("arm") == 1, F.col("c")).otherwise(0)) + 1)
        .cast("bigint")
        .alias("ab"),
        (F.sum(F.when(F.col("arm") == 1, 1 - F.col("c")).otherwise(0)) + 1)
        .cast("bigint")
        .alias("bb"),
    )
    ks = cells.select(
        "aa",
        "ba",
        "ab",
        "bb",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("ab") - 1)
        ).alias("i"),
    )
    terms = ks.select(
        "aa", "ba", "ab", "bb", F.expr(_BAYES_TERM).alias("lt")
    )
    psum = F.sum(F.exp(F.col("lt")).cast("decimal(38,18)")).cast("double")
    return terms.groupBy().agg(
        (F.any_value(F.col("aa")) - 1).alias("conv_a"),
        (F.any_value(F.col("aa")) + F.any_value(F.col("ba")) - 2).alias("n_a"),
        (F.any_value(F.col("ab")) - 1).alias("conv_b"),
        (F.any_value(F.col("ab")) + F.any_value(F.col("bb")) - 2).alias("n_b"),
        F.round(psum, 9).alias("p_b_beats_a"),
        (psum >= 0.95).cast("int").alias("ship_b"),
    )


# ---------------------------------------------------------------------------
# #395 doubly_robust_ate — AIPW combining propensity + outcome models
# ---------------------------------------------------------------------------


@query(
    "q_doubly_robust_ate",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   CAST(user_id % 2 AS BIGINT) AS tr,
                   LEAST(CAST(COUNT(*) AS BIGINT) // 20, 4) AS xb,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS y
            FROM events GROUP BY user_id
        ),
        cells AS (
            SELECT xb, tr, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS sy
            FROM u GROUP BY xb, tr
        ),
        ols AS (
            SELECT tr,
                   (CAST(SUM(xb * sy) AS DOUBLE)
                    - CAST(SUM(n * xb) AS DOUBLE) * SUM(sy) / SUM(n))
                   / (CAST(SUM(n * xb * xb) AS DOUBLE)
                      - CAST(SUM(n * xb) AS DOUBLE) * SUM(n * xb) / SUM(n))
                       AS b,
                   CAST(SUM(sy) AS DOUBLE) / SUM(n)
                   - ((CAST(SUM(xb * sy) AS DOUBLE)
                       - CAST(SUM(n * xb) AS DOUBLE) * SUM(sy) / SUM(n))
                      / (CAST(SUM(n * xb * xb) AS DOUBLE)
                         - CAST(SUM(n * xb) AS DOUBLE) * SUM(n * xb)
                           / SUM(n)))
                     * (CAST(SUM(n * xb) AS DOUBLE) / SUM(n)) AS a
            FROM cells GROUP BY tr
        ),
        ps AS (
            SELECT xb,
                   CAST(SUM(CASE WHEN tr = 1 THEN n ELSE 0 END) AS DOUBLE)
                   / SUM(n) AS e,
                   CAST(SUM(n) AS BIGINT) AS nx
            FROM cells GROUP BY xb
        ),
        terms AS (
            SELECT c.xb, c.tr, c.n, c.sy, p.e,
                   o1.a + o1.b * c.xb AS mu1,
                   o0.a + o0.b * c.xb AS mu0
            FROM cells c
            JOIN ps p ON p.xb = c.xb
            JOIN ols o1 ON o1.tr = 1
            JOIN ols o0 ON o0.tr = 0
        ),
        agg AS (
            SELECT CAST(SUM(CAST(
                       n * (mu1 - mu0)
                       + CASE WHEN tr = 1
                              THEN (sy - n * mu1) / e
                              ELSE -(sy - n * mu0) / (1 - e) END
                       AS DECIMAL(38,12))) AS DOUBLE)
                   / (SELECT SUM(n) FROM cells) AS ate_dr,
                   CAST(SUM(CASE WHEN tr = 1 THEN sy ELSE 0 END) AS DOUBLE)
                   / SUM(CASE WHEN tr = 1 THEN n ELSE 0 END)
                   - CAST(SUM(CASE WHEN tr = 0 THEN sy ELSE 0 END)
                          AS DOUBLE)
                     / SUM(CASE WHEN tr = 0 THEN n ELSE 0 END) AS ate_naive,
                   CAST(SUM(n) AS BIGINT) AS n_users
            FROM terms
        )
        SELECT n_users,
               ROUND(ate_naive / 100, 9) AS ate_naive,
               ROUND(ate_dr / 100, 9) AS ate_dr
        FROM agg
    """,
    operators=(23, 163, 281, 395),
    doc="Doubly-robust (AIPW) ATE (#395): combines the stratified "
    "propensity e(x) (activity-band cells, the #281 discipline) with "
    "per-arm LINEAR outcome models mu_t(x) = a_t + b_t x (weighted "
    "OLS over the same cells, #163) into the augmented estimator "
    "ATE = mean[mu1 - mu0 + T(y - mu1)/e - (1-T)(y - mu0)/(1-e)] — "
    "consistent if EITHER the propensity or the outcome model is "
    "right, the safety property neither IPW (#284) nor regression "
    "alone has. Because both models are functions of the band, the "
    "per-user sum COLLAPSES onto the (band, arm) cells: n·(mu1-mu0) "
    "+ (sy - n·mu_t)/e per cell — integer cents and counts into one "
    "decimal-quantized sum, no per-user pass after the rollup. "
    "Scale: one per-user rollup, then 10-cell algebra.",
    bench=False,
)
def q_doubly_robust_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("y"),
        )
        .select(
            (F.col("user_id") % 2).cast("bigint").alias("tr"),
            F.least(F.expr("cnt div 20"), F.lit(4).cast("bigint")).alias("xb"),
            "y",
        )
    )
    cells = u.groupBy("xb", "tr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
    ).cache()
    sn = F.sum("n")
    sxn = F.sum(F.col("n") * F.col("xb"))
    sxxn = F.sum(F.col("n") * F.col("xb") * F.col("xb"))
    sy_ = F.sum("sy")
    sxy = F.sum(F.col("xb") * F.col("sy"))
    ols = cells.groupBy("tr").agg(
        sn.cast("bigint").alias("sn"),
        sxn.cast("bigint").alias("sxn"),
        sxxn.cast("bigint").alias("sxxn"),
        sy_.cast("bigint").alias("sy_"),
        sxy.cast("bigint").alias("sxy"),
    )
    b = (
        F.col("sxy").cast("double")
        - F.col("sxn").cast("double") * F.col("sy_") / F.col("sn")
    ) / (
        F.col("sxxn").cast("double")
        - F.col("sxn").cast("double") * F.col("sxn") / F.col("sn")
    )
    a = F.col("sy_").cast("double") / F.col("sn") - b * (
        F.col("sxn").cast("double") / F.col("sn")
    )
    fit = ols.select("tr", a.alias("a"), b.alias("b"))
    ps = cells.groupBy("xb").agg(
        (
            F.sum(F.when(F.col("tr") == 1, F.col("n")).otherwise(0)).cast(
                "double"
            )
            / F.sum("n")
        ).alias("e")
    )
    o1 = fit.filter(F.col("tr") == 1).select(
        F.col("a").alias("a1"), F.col("b").alias("b1")
    )
    o0 = fit.filter(F.col("tr") == 0).select(
        F.col("a").alias("a0"), F.col("b").alias("b0")
    )
    terms = (
        cells.join(F.broadcast(ps), "xb")
        .crossJoin(F.broadcast(o1))
        .crossJoin(F.broadcast(o0))
        .select(
            "xb",
            "tr",
            "n",
            "sy",
            "e",
            (F.col("a1") + F.col("b1") * F.col("xb")).alias("mu1"),
            (F.col("a0") + F.col("b0") * F.col("xb")).alias("mu0"),
        )
    )
    contrib = (
        F.col("n") * (F.col("mu1") - F.col("mu0"))
        + F.when(
            F.col("tr") == 1,
            (F.col("sy") - F.col("n") * F.col("mu1")) / F.col("e"),
        ).otherwise(
            -(F.col("sy") - F.col("n") * F.col("mu0")) / (1 - F.col("e"))
        )
    ).cast("decimal(38,12)")
    agg = terms.agg(
        F.sum(contrib).cast("double").alias("s_dr"),
        F.sum(F.when(F.col("tr") == 1, F.col("sy")).otherwise(0))
        .cast("double")
        .alias("sy1"),
        F.sum(F.when(F.col("tr") == 1, F.col("n")).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("tr") == 0, F.col("sy")).otherwise(0))
        .cast("double")
        .alias("sy0"),
        F.sum(F.when(F.col("tr") == 0, F.col("n")).otherwise(0)).alias("n0"),
        F.sum("n").cast("bigint").alias("n_users"),
    )
    return agg.select(
        "n_users",
        F.round(
            (F.col("sy1") / F.col("n1") - F.col("sy0") / F.col("n0")) / 100, 9
        ).alias("ate_naive"),
        F.round(F.col("s_dr") / F.col("n_users") / 100, 9).alias("ate_dr"),
    )
