"""Round-8 wave — SURVEY.md §2.26 (#402–#412).

Preference aggregation (Bradley-Terry), uplift evaluation (Qini),
the survival-estimator completion (Nelson-Aalen + RMST), heavier
distribution tests (k-sample Anderson-Darling), long-memory and
vocabulary-growth diagnostics (Hurst R/S, Heaps' law), clustering
quality (simplified silhouette), density clustering census (sampled
grid DBSCAN), cooperative attribution (exact 3-filter Shapley), and
the LLM-pipeline pair: tokenizer fertility and temperature-sampled
data mixing weights.

Parity disciplines reused from the repo:

- Iterated fixed-point rounds (Bradley-Terry MM) quantize each
  round through ROUND(12) with per-term DECIMAL(38,18) sums — the
  #340 textrank / #398 gmm_em discipline; the oracle unrolls the
  rounds as CTEs.
- Integer-first statistics: Anderson-Darling numerators, Hurst
  rescaled ranges (n·cum_i − i·Σx stays BIGINT), and Shapley
  subset counts are exact integers until one final IEEE tree.
- ln/exp trees are written identically on both sides (the #233
  Kaplan-Meier precedent); sums of ln/exp terms pass through
  DECIMAL casts so addition order cannot drift.
- "Randomness" (hyperplanes, samples) is md5-derived at plan level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# #402 bradley_terry — pairwise-preference strength via 4 MM rounds
# ---------------------------------------------------------------------------

_BT_ROUNDS = 4
_BT_FLOOR = "0.000000000001"  # keeps a winless player's p away from 0/0


def _bt_round_sql(prev: str, out: str) -> str:
    """One Bradley-Terry MM update as a CTE: p_i' = W_i / Σ_j n_ij /
    (p_i + p_j), per-term DECIMAL(38,18) so the sum is order-free,
    ROUND(12) re-quantization per round (the #340/#398 discipline)."""
    return f"""
        {out} AS (
            SELECT n.i,
                   GREATEST(ROUND(CAST(w.w AS DOUBLE)
                       / CAST(SUM(CAST(CAST(n.n AS DOUBLE)
                                       / (pi.p + pj.p)
                                       AS DECIMAL(38,18))) AS DOUBLE), 12),
                       {_BT_FLOOR}) AS p
            FROM nall n
            JOIN {prev} pi ON pi.i = n.i
            JOIN {prev} pj ON pj.i = n.j
            JOIN wt w ON w.i = n.i
            GROUP BY n.i, w.w
        )"""


@query(
    "q_bradley_terry",
    oracle=f"""
        WITH base AS (
            SELECT o.o_custkey AS ck, o.o_orderpriority AS m,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS q
            FROM orders o GROUP BY 1, 2
        ),
        duel AS (
            SELECT a.m AS wi, b.m AS lo
            FROM base a JOIN base b
              ON b.ck = a.ck AND b.m <> a.m AND a.q > b.q
        ),
        e AS (
            SELECT wi AS i, lo AS j, CAST(COUNT(*) AS BIGINT) AS w
            FROM duel GROUP BY 1, 2
        ),
        nall AS (
            SELECT i, j, CAST(SUM(n) AS BIGINT) AS n FROM (
                SELECT i, j, w AS n FROM e
                UNION ALL
                SELECT j AS i, i AS j, w AS n FROM e
            ) GROUP BY i, j
        ),
        players AS (SELECT DISTINCT i FROM nall),
        wt AS (
            SELECT p.i, COALESCE(CAST(SUM(e.w) AS BIGINT), 0) AS w
            FROM players p LEFT JOIN e ON e.i = p.i GROUP BY p.i
        ),
        r0 AS (SELECT i, CAST(1 AS DOUBLE) AS p FROM players),
        {",".join(_bt_round_sql(f"r{k}", f"r{k + 1}") for k in range(_BT_ROUNDS))},
        nd AS (
            SELECT i, CAST(SUM(n) AS BIGINT) AS n_duels FROM nall GROUP BY i
        )
        SELECT r.i AS player, d.n_duels, w.w AS wins,
               ROUND(r.p, 9) AS strength,
               CAST(ROW_NUMBER() OVER (ORDER BY r.p DESC, r.i) AS BIGINT)
                   AS rnk
        FROM r{_BT_ROUNDS} r
        JOIN wt w ON w.i = r.i
        JOIN nd d ON d.i = r.i
        ORDER BY rnk
    """,
    operators=(13, 23, 402),
    doc=f"Bradley-Terry preference aggregation (#402): the model "
    "behind arena-style LLM leaderboards and any pairwise-judgment "
    "eval — per customer, each pair of order-priority classes duels "
    "(larger cent-exact spend wins, ties abstain), the duel census "
    "collapses to a k x k win matrix, and player strengths come from "
    f"{_BT_ROUNDS} fixed MM rounds p_i' = W_i / SUM_j n_ij/(p_i+p_j) "
    "from p=1 — each round's per-term quotients pass through "
    "DECIMAL(38,18) (order-free sums) and re-quantize at ROUND(12), "
    "so Spark's plan-loop rounds are bit-identical to the oracle's "
    "unrolled CTE chain (the #340/#398 discipline); a winless "
    "player's strength floors at 1e-12 instead of poisoning later "
    "rounds with 0/0. Scale: duels are bounded per customer "
    "(<= k(k-1)/2 pairs after an ALREADY-AGGREGATED per-customer "
    "rollup), the MM rounds run on the k^2-cell matrix — thousands "
    "of times smaller than the fact table; the corpus is scanned "
    "once.",
    bench=True,
)
def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    base = o.groupBy(
        F.col("o_custkey").alias("ck"), F.col("o_orderpriority").alias("m")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("q")
    )
    a, b = base.alias("a"), base.alias("b")
    duel = a.join(
        b,
        (F.col("b.ck") == F.col("a.ck"))
        & (F.col("b.m") != F.col("a.m"))
        & (F.col("a.q") > F.col("b.q")),
    ).select(F.col("a.m").alias("i"), F.col("b.m").alias("j"))
    e = (
        duel.groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .localCheckpoint(eager=True)
    )
    nall = (
        e.select("i", "j", F.col("w").alias("n"))
        .unionByName(
            e.select(
                F.col("j").alias("i"), F.col("i").alias("j"), F.col("w").alias("n")
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    players = nall.select("i").distinct()
    wt = (
        players.join(e, "i", "left")
        .groupBy("i")
        .agg(F.coalesce(F.sum("w").cast("bigint"), F.lit(0)).alias("w"))
        .localCheckpoint(eager=True)
    )
    p = players.select("i", F.lit(1.0).alias("p"))
    for _ in range(_BT_ROUNDS):
        pi = p.select(F.col("i"), F.col("p").alias("p_i"))
        pj = p.select(F.col("i").alias("j"), F.col("p").alias("p_j"))
        term = (
            F.col("n").cast("double") / (F.col("p_i") + F.col("p_j"))
        ).cast("decimal(38,18)")
        # The MM state is the k x k win matrix — k = distinct priority
        # classes (5), a fixed domain at EVERY scale factor. Each round's
        # checkpoint was materializing 32 near-empty post-shuffle
        # partitions (44 tiny stages measured for 8 rounds); coalesce(1)
        # collapses the scheduling overhead without touching the
        # (order-free, DECIMAL-summed) arithmetic.
        p = (
            nall.join(pi, "i")
            .join(pj, "j")
            .join(wt, "i")
            .groupBy("i", "w")
            .agg(
                F.greatest(
                    F.round(
                        F.col("w").cast("double")
                        / F.sum(term).cast("double"),
                        12,
                    ),
                    F.lit(float(_BT_FLOOR)),
                ).alias("p")
            )
            .select("i", "p")
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
    nd = nall.groupBy("i").agg(F.sum("n").cast("bigint").alias("n_duels"))
    w_rank = Window.orderBy(F.col("p").desc(), "i")
    return (
        p.join(wt, "i")
        .join(nd, "i")
        .select(
            F.col("i").alias("player"),
            "n_duels",
            F.col("w").alias("wins"),
            F.round("p", 9).alias("strength"),
            F.row_number().over(w_rank).cast("bigint").alias("rnk"),
        )
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# #403 qini_uplift — two-model uplift by band + Qini coefficient
# ---------------------------------------------------------------------------


@query(
    "q_qini_uplift",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   CAST(user_id % 2 AS INT) AS tr,
                   LEAST(CAST(COUNT(*) AS BIGINT) // 20, 4) AS xb,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv
            FROM events GROUP BY user_id
        ),
        cells AS (
            SELECT xb, tr, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(conv) AS BIGINT) AS c
            FROM u GROUP BY xb, tr
        ),
        score AS (
            SELECT xb,
                   CAST(SUM(CASE WHEN tr = 1 THEN c END) AS DOUBLE)
                   / SUM(CASE WHEN tr = 1 THEN n END)
                   - CAST(SUM(CASE WHEN tr = 0 THEN c END) AS DOUBLE)
                     / SUM(CASE WHEN tr = 0 THEN n END) AS up,
                   CAST(SUM(CASE WHEN tr = 1 THEN n ELSE 0 END) AS BIGINT)
                       AS nt,
                   CAST(SUM(CASE WHEN tr = 1 THEN c ELSE 0 END) AS BIGINT)
                       AS ct,
                   CAST(SUM(CASE WHEN tr = 0 THEN n ELSE 0 END) AS BIGINT)
                       AS nc,
                   CAST(SUM(CASE WHEN tr = 0 THEN c ELSE 0 END) AS BIGINT)
                       AS cc
            FROM cells GROUP BY xb
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (ORDER BY up DESC, xb) AS rk
            FROM score WHERE nt > 0 AND nc > 0
        ),
        cum AS (
            SELECT rk, xb, up, nt, ct, nc, cc,
                   SUM(nt) OVER w AS nt_c, SUM(ct) OVER w AS ct_c,
                   SUM(nc) OVER w AS nc_c, SUM(cc) OVER w AS cc_c
            FROM ranked
            WINDOW w AS (ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        qc AS (
            SELECT *,
                   CAST(ct_c AS DOUBLE)
                   - CAST(cc_c AS DOUBLE) * nt_c / nc_c AS qv
            FROM cum
        ),
        tot AS (
            SELECT CAST(SUM(nt + nc) AS BIGINT) AS n_tot,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM qc
        ),
        fin AS (
            SELECT MAX(CASE WHEN rk = (SELECT MAX(rk) FROM qc) THEN qv END)
                       AS q_final
            FROM qc
        ),
        coef AS (
            SELECT CAST(SUM(CAST(
                       q.qv - f.q_final
                             * CAST(q.nt_c + q.nc_c AS DOUBLE) / t.n_tot
                       AS DECIMAL(38,12))) AS DOUBLE) / t.k AS qini_coef
            FROM qc q CROSS JOIN tot t CROSS JOIN fin f
            GROUP BY t.k
        )
        SELECT q.rk, q.xb AS band,
               ROUND(q.up, 9) AS uplift,
               q.nt AS n_t, q.ct AS conv_t, q.nc AS n_c, q.cc AS conv_c,
               ROUND(q.qv, 9) AS qini_cum,
               ROUND(c.qini_coef, 9) AS qini_coef
        FROM qc q CROSS JOIN coef c
        ORDER BY q.rk
    """,
    operators=(23, 31, 403),
    doc="Qini uplift evaluation (#403): the incremental-impact view "
    "a conversion-rate comparison cannot give — users stratify into "
    "activity bands (the #281/#395 covariate), the two-model uplift "
    "score per band is conv_T - conv_C (bands missing either arm "
    "are excluded — the contract requires both arms), bands rank "
    "by score, and "
    "the Qini curve Q(k) = convT_cum - convC_cum * nT_cum/nC_cum "
    "accumulates down the ranking; the Qini coefficient averages "
    "Q(k)'s lift over the random-targeting diagonal (per-band terms "
    "decimal-quantized). In-sample scoring at the graded scale — "
    "the embargoed/split operators (#77/#225 family) carry the "
    "out-of-sample discipline separately. The targeting ship-gate "
    "beside the frequentist family (#147/#286/#369) and DR-ATE "
    "(#395). Scale: one per-user rollup, then 10-cell algebra — "
    "identical shape to #395.",
    bench=False,
)
def q_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.least(
                (F.count(F.lit(1)) / 20).cast("bigint"), F.lit(4)
            ).alias("xb"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
        .select(
            (F.col("user_id") % 2).cast("int").alias("tr"), "xb", "conv"
        )
    )
    cells = u.groupBy("xb", "tr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("c"),
    )
    t1 = F.when(F.col("tr") == 1, F.col("c"))
    n1 = F.when(F.col("tr") == 1, F.col("n"))
    t0 = F.when(F.col("tr") == 0, F.col("c"))
    n0 = F.when(F.col("tr") == 0, F.col("n"))
    score = cells.groupBy("xb").agg(
        (
            F.sum(t1).cast("double") / F.sum(n1)
            - F.sum(t0).cast("double") / F.sum(n0)
        ).alias("up"),
        F.sum(F.when(F.col("tr") == 1, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("nt"),
        F.sum(F.when(F.col("tr") == 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("ct"),
        F.sum(F.when(F.col("tr") == 0, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("nc"),
        F.sum(F.when(F.col("tr") == 0, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("cc"),
    )
    w_rank = Window.orderBy(F.col("up").desc(), "xb")
    ranked = score.filter((F.col("nt") > 0) & (F.col("nc") > 0)).select(
        "*", F.row_number().over(w_rank).alias("rk")
    )
    w_cum = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    cum = ranked.select(
        "rk", "xb", "up", "nt", "ct", "nc", "cc",
        F.sum("nt").over(w_cum).alias("nt_c"),
        F.sum("ct").over(w_cum).alias("ct_c"),
        F.sum("nc").over(w_cum).alias("nc_c"),
        F.sum("cc").over(w_cum).alias("cc_c"),
    )
    qc = cum.withColumn(
        "qv",
        F.col("ct_c").cast("double")
        - F.col("cc_c").cast("double") * F.col("nt_c") / F.col("nc_c"),
    ).localCheckpoint(eager=True)
    tot = qc.agg(
        F.sum(F.col("nt") + F.col("nc")).cast("bigint").alias("n_tot"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("rk").alias("max_rk"),
    )
    fin = (
        qc.join(F.broadcast(tot), qc["rk"] == tot["max_rk"])
        .select(F.col("qv").alias("q_final"), "n_tot", "k")
    )
    coef = (
        qc.crossJoin(F.broadcast(fin))
        .groupBy("k")
        .agg(
            (
                F.sum(
                    (
                        F.col("qv")
                        - F.col("q_final")
                        * (F.col("nt_c") + F.col("nc_c")).cast("double")
                        / F.col("n_tot")
                    ).cast("decimal(38,12)")
                ).cast("double")
                / F.col("k")
            ).alias("qini_coef")
        )
        .select("qini_coef")
    )
    return (
        qc.crossJoin(F.broadcast(coef))
        .select(
            "rk",
            F.col("xb").alias("band"),
            F.round("up", 9).alias("uplift"),
            F.col("nt").alias("n_t"),
            F.col("ct").alias("conv_t"),
            F.col("nc").alias("n_c"),
            F.col("cc").alias("conv_c"),
            F.round("qv", 9).alias("qini_cum"),
            F.round("qini_coef", 9).alias("qini_coef"),
        )
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# #404 nelson_aalen — cumulative hazard + Greenwood-style variance + RMST
# ---------------------------------------------------------------------------


@query(
    "q_nelson_aalen",
    oracle="""
        WITH span AS (
            SELECT user_id,
                   EPOCH_US(MAX(CAST(ts AS TIMESTAMP))
                            - MIN(CAST(ts AS TIMESTAMP))) // 86400000000
                       AS life_days,
                   CAST(MAX(CAST(ts AS TIMESTAMP))
                        < (SELECT MAX(CAST(ts AS TIMESTAMP))
                           FROM events) - INTERVAL 12 HOUR AS INT) AS churned
            FROM events GROUP BY user_id
        ),
        t AS (
            SELECT life_days AS t, COUNT(*) AS n_at_t,
                   CAST(SUM(churned) AS BIGINT) AS d
            FROM span GROUP BY life_days
        ),
        risk AS (
            SELECT t, d,
                   CAST(SUM(n_at_t) OVER (ORDER BY t DESC
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT)
                       AS n_risk
            FROM t
        ),
        ev AS (SELECT t, d, n_risk FROM risk WHERE d > 0),
        na AS (
            SELECT t, d, n_risk,
                   CAST(SUM(CAST(CAST(d AS DOUBLE) / n_risk
                                 AS DECIMAL(38,18))) OVER w AS DOUBLE)
                       AS cumhaz,
                   CAST(SUM(CAST(CAST(d AS DOUBLE) / n_risk / n_risk
                                 AS DECIMAL(38,18))) OVER w AS DOUBLE)
                       AS na_var,
                   CASE WHEN d = n_risk THEN CAST(0 AS DOUBLE)
                        ELSE EXP(SUM(CASE WHEN d < n_risk
                                          THEN LN(1 - CAST(d AS DOUBLE)
                                                      / n_risk)
                                          ELSE 0 END) OVER w) END AS s
            FROM ev
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        stepped AS (
            SELECT *, LEAD(t) OVER (ORDER BY t) AS t_next FROM na
        ),
        rmst AS (
            SELECT (SELECT MIN(t) FROM ev)
                   + CAST(SUM(CAST(s * (t_next - t) AS DECIMAL(38,12)))
                          AS DOUBLE) AS v
            FROM stepped WHERE t_next IS NOT NULL
        )
        SELECT n.t AS life_days, n.d AS n_churned, n.n_risk,
               ROUND(n.cumhaz, 9) AS na_cumhaz,
               ROUND(n.na_var, 12) AS na_var,
               ROUND(n.s, 9) AS km_surv,
               ROUND(r.v, 9) AS rmst
        FROM na n CROSS JOIN rmst r
        ORDER BY n.t
    """,
    operators=(31, 233, 404),
    doc="Nelson-Aalen cumulative hazard + RMST (#404): the estimator "
    "pair that completes the survival family around Kaplan-Meier "
    "(#233, whose churn fixture and reverse-cumulative risk sets "
    "this reuses, stats_q.py:392) — H(t) = SUM d_i/n_i with its "
    "variance SUM d_i/n_i^2 (both association-free DECIMAL(38,18) "
    "window sums, no ln/exp needed — the NA estimator is the one "
    "you want when hazard, not survival, is the quantity of "
    "interest), the KM curve alongside (the #233 exp-sum-ln tree, "
    "zeroed exactly when d = n_risk), and the restricted mean "
    "survival time — the integral of the KM step function over the "
    "observed window, the censoring-correct 'average lifetime' that "
    "a plain mean of lifetimes gets wrong — as one decimal-summed "
    "LEAD pass. Scale: two hash aggregates + windows over "
    "|distinct lifetimes| rows, same as #233.",
    bench=False,
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev0 = _t(spark, sf_dir, "events")
    gmax = ev0.groupBy().agg(F.max("ts").alias("gmax"))
    span = (
        ev0.groupBy("user_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        .crossJoin(F.broadcast(gmax))
        .select(
            F.expr(
                "(unix_micros(t1) - unix_micros(t0)) div 86400000000"
            ).alias("life_days"),
            (F.col("t1") < F.col("gmax") - F.expr("INTERVAL 12 HOURS"))
            .cast("int")
            .alias("churned"),
        )
    )
    t = span.groupBy(F.col("life_days").alias("t")).agg(
        F.count(F.lit(1)).alias("n_at_t"),
        F.sum("churned").cast("bigint").alias("d"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ev = t.select(
        "t", "d", F.sum("n_at_t").over(w_desc).cast("bigint").alias("n_risk")
    ).filter(F.col("d") > 0)
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    dn = F.col("d").cast("double") / F.col("n_risk")
    na = ev.select(
        "t",
        "d",
        "n_risk",
        F.sum(dn.cast("decimal(38,18)")).over(w).cast("double").alias("cumhaz"),
        F.sum((dn / F.col("n_risk")).cast("decimal(38,18)"))
        .over(w)
        .cast("double")
        .alias("na_var"),
        F.when(F.col("d") == F.col("n_risk"), F.lit(0.0))
        .otherwise(
            F.exp(
                F.sum(
                    F.when(
                        F.col("d") < F.col("n_risk"),
                        F.log(F.lit(1) - dn),
                    ).otherwise(F.lit(0.0))
                ).over(w)
            )
        )
        .alias("s"),
    ).localCheckpoint(eager=True)
    w_lead = Window.orderBy("t")
    stepped = na.select(
        "s", "t", F.lead("t").over(w_lead).alias("t_next")
    ).filter(F.col("t_next").isNotNull())
    tmin = na.agg(F.min("t").alias("tmin"))
    # Global agg (no groupBy): with a single distinct event time,
    # `stepped` is empty and a grouped agg would yield ZERO rows,
    # emptying the whole output, while the oracle's scalar subquery
    # yields one row with a NULL sum. An ungrouped agg over the empty
    # frame returns exactly that one NULL row, matching the oracle on
    # degenerate fixtures.
    ssum = stepped.agg(
        F.sum(
            (F.col("s") * (F.col("t_next") - F.col("t"))).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("_ssum")
    )
    rmst = ssum.crossJoin(F.broadcast(tmin)).select(
        (F.col("tmin") + F.col("_ssum")).alias("v")
    )
    return (
        na.crossJoin(F.broadcast(rmst))
        .select(
            F.col("t").alias("life_days"),
            F.col("d").alias("n_churned"),
            "n_risk",
            F.round("cumhaz", 9).alias("na_cumhaz"),
            F.round("na_var", 12).alias("na_var"),
            F.round("s", 9).alias("km_surv"),
            F.round("v", 9).alias("rmst"),
        )
        .orderBy("life_days")
    )


# ---------------------------------------------------------------------------
# #405 anderson_darling — two-sample AD test on tied integer samples
# ---------------------------------------------------------------------------


@query(
    "q_anderson_darling",
    oracle="""
        WITH u AS (
            SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY user_id
        ),
        blocks AS (
            SELECT x, CAST(COUNT(*) AS BIGINT) AS l,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS l1
            FROM u GROUP BY x
        ),
        cums AS (
            SELECT x, l, l1,
                   SUM(l) OVER w AS b, SUM(l1) OVER w AS m1
            FROM blocks
            WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        mom AS (
            SELECT CAST(SUM(l) AS BIGINT) AS nn,
                   CAST(SUM(l1) AS BIGINT) AS n1
            FROM blocks
        ),
        terms AS (
            SELECT c.l, c.b, c.m1, m.nn, m.n1, m.nn - m.n1 AS n2,
                   c.b - c.m1 AS m2
            FROM cums c CROSS JOIN mom m
            WHERE c.b < m.nn
        ),
        a2 AS (
            SELECT nn, n1, n2,
                   CAST(SUM(CAST(
                       CAST(l AS DOUBLE) / nn
                       * (CAST(nn * m1 - n1 * b AS DOUBLE)
                          * CAST(nn * m1 - n1 * b AS DOUBLE))
                       / (CAST(b AS DOUBLE) * (nn - b)) / n1
                       AS DECIMAL(38,18))) AS DOUBLE)
                   + CAST(SUM(CAST(
                       CAST(l AS DOUBLE) / nn
                       * (CAST(nn * m2 - n2 * b AS DOUBLE)
                          * CAST(nn * m2 - n2 * b AS DOUBLE))
                       / (CAST(b AS DOUBLE) * (nn - b)) / n2
                       AS DECIMAL(38,18))) AS DOUBLE) AS v
            FROM terms GROUP BY nn, n1, n2
        )
        SELECT n1, n2,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM blocks) AS n_blocks,
               ROUND(v, 9) AS a2_kn,
               CAST(v > 2.492 AS INT) AS significant_05
        FROM a2
    """,
    operators=(23, 31, 405),
    doc="Two-sample Anderson-Darling (#405, Scholz-Stephens 1987, "
    "right-continuous/discrete variant): integrates EVERY weighted "
    "ECDF gap with the 1/(H(1-H)) tail weighting that makes it the "
    "most powerful omnibus two-sample test in the family — KS "
    "(#272) sees only the largest gap, CvM (#377) weights all gaps "
    "equally; AD up-weights the tails where distribution shifts "
    "that matter (heavy users, outlier cohorts) live. On the tied "
    "integer per-user activity census the statistic is exact: "
    "blocks are distinct values, every numerator N*M_aj - n_a*B_j "
    "is BIGINT, and per-block terms sum through DECIMAL(38,18); "
    "the 5% gate uses the k=2 asymptotic critical value (2.492). "
    "Verified against scipy.stats.anderson_ksamp(midrank=False) in "
    "tests/test_round8_refs.py. Scale: one per-user rollup + one "
    "census + one window — the #377 shape exactly.",
    bench=False,
)
def q_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .select((F.col("user_id") % 2).cast("int").alias("arm"), "x")
    )
    blocks = u.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("l"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("l1"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cums = blocks.select(
        "x", "l", "l1",
        F.sum("l").over(w).alias("b"),
        F.sum("l1").over(w).alias("m1"),
    )
    mom = blocks.agg(
        F.sum("l").cast("bigint").alias("nn"),
        F.sum("l1").cast("bigint").alias("n1"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    )
    terms = cums.crossJoin(F.broadcast(mom)).filter(
        F.col("b") < F.col("nn")
    ).select(
        "l", "b", "m1", "nn", "n1", "n_blocks",
        (F.col("nn") - F.col("n1")).alias("n2"),
        (F.col("b") - F.col("m1")).alias("m2"),
    )

    def _inner(m_col: str, n_col: str):
        num = (F.col("nn") * F.col(m_col) - F.col(n_col) * F.col("b")).cast(
            "double"
        )
        return (
            F.col("l").cast("double") / F.col("nn")
            * (num * num)
            / (F.col("b").cast("double") * (F.col("nn") - F.col("b")))
            / F.col(n_col)
        ).cast("decimal(38,18)")

    a2 = terms.groupBy("nn", "n1", "n2", "n_blocks").agg(
        (
            F.sum(_inner("m1", "n1")).cast("double")
            + F.sum(_inner("m2", "n2")).cast("double")
        ).alias("v")
    )
    return a2.select(
        "n1",
        "n2",
        "n_blocks",
        F.round("v", 9).alias("a2_kn"),
        (F.col("v") > 2.492).cast("int").alias("significant_05"),
    )


# ---------------------------------------------------------------------------
# #406 hurst_exponent — rescaled-range long-memory estimate per series
# ---------------------------------------------------------------------------

_HURST_SIZES = (5, 10, 15)  # the events fixture spans 30 days at every SF


@query(
    "q_hurst_exponent",
    oracle=f"""
        WITH o AS (
            SELECT event_type,
                   DATEDIFF('day', DATE '1970-01-01',
                            CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d
            FROM events
        ),
        days AS (
            SELECT UNNEST(GENERATE_SERIES(mn, mx)) AS d
            FROM (SELECT MIN(d) AS mn, MAX(d) AS mx FROM o)
        ),
        types AS (SELECT DISTINCT event_type FROM o),
        cnt AS (SELECT event_type, d, COUNT(*) AS n FROM o GROUP BY 1, 2),
        grid AS MATERIALIZED (
            SELECT t.event_type,
                   days.d - (SELECT MIN(d) FROM days) AS t,
                   CAST(COALESCE(cnt.n, 0) AS BIGINT) AS x
            FROM types t CROSS JOIN days
            LEFT JOIN cnt ON cnt.event_type = t.event_type AND cnt.d = days.d
        ),
        sized AS (
            SELECT g.event_type, s.sz, g.t // s.sz AS blk,
                   ROW_NUMBER() OVER (PARTITION BY g.event_type, s.sz,
                                      g.t // s.sz ORDER BY g.t) AS i,
                   SUM(g.x) OVER (PARTITION BY g.event_type, s.sz,
                                  g.t // s.sz ORDER BY g.t
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum,
                   SUM(g.x) OVER (PARTITION BY g.event_type, s.sz,
                                  g.t // s.sz) AS sx_all,
                   g.x
            FROM grid g
            CROSS JOIN (SELECT UNNEST([{", ".join(str(s) for s in _HURST_SIZES)}]) AS sz) s
        ),
        dev AS (
            SELECT event_type, sz, blk, x,
                   sz * cum - i * sx_all AS v
            FROM sized
        ),
        bagg AS (
            SELECT event_type, sz, blk,
                   CAST(COUNT(*) AS BIGINT) AS nb,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(MAX(v) AS BIGINT) AS maxv,
                   CAST(MIN(v) AS BIGINT) AS minv
            FROM dev GROUP BY event_type, sz, blk
        ),
        rs AS (
            SELECT event_type, sz,
                   CAST(SUM(CAST(
                       CAST(maxv - minv AS DOUBLE)
                       / SQRT(CAST(nb * sxx - sx * sx AS DOUBLE))
                       AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mean_rs,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks
            FROM bagg
            WHERE nb = sz AND nb * sxx > sx * sx
            GROUP BY event_type, sz
        ),
        fit AS (
            SELECT event_type,
                   (CAST(SUM(CAST(LN(CAST(sz AS DOUBLE))
                                  * LN(mean_rs) AS DECIMAL(38,18)))
                         AS DOUBLE)
                    - CAST(SUM(CAST(LN(CAST(sz AS DOUBLE))
                                    AS DECIMAL(38,18))) AS DOUBLE)
                      * CAST(SUM(CAST(LN(mean_rs) AS DECIMAL(38,18)))
                             AS DOUBLE) / COUNT(*))
                   / (CAST(SUM(CAST(LN(CAST(sz AS DOUBLE))
                                    * LN(CAST(sz AS DOUBLE))
                                    AS DECIMAL(38,18))) AS DOUBLE)
                      - CAST(SUM(CAST(LN(CAST(sz AS DOUBLE))
                                      AS DECIMAL(38,18))) AS DOUBLE)
                        * CAST(SUM(CAST(LN(CAST(sz AS DOUBLE))
                                        AS DECIMAL(38,18))) AS DOUBLE)
                        / COUNT(*)) AS h
            FROM rs GROUP BY event_type
            HAVING COUNT(*) = {len(_HURST_SIZES)}
        ),
        wide AS (
            SELECT event_type,
                   MAX(CASE WHEN sz = 5 THEN mean_rs END) AS rs5,
                   MAX(CASE WHEN sz = 10 THEN mean_rs END) AS rs10,
                   MAX(CASE WHEN sz = 15 THEN mean_rs END) AS rs15
            FROM rs GROUP BY event_type
        )
        SELECT w.event_type,
               ROUND(w.rs5, 9) AS rs5,
               ROUND(w.rs10, 9) AS rs10,
               ROUND(w.rs15, 9) AS rs15,
               ROUND(f.h, 9) AS hurst
        FROM wide w JOIN fit f ON f.event_type = w.event_type
        ORDER BY w.event_type
    """,
    operators=(23, 31, 406),
    doc="Hurst exponent by rescaled range (#406, Hurst 1951/Mandelbrot "
    "R/S): per daily series, full blocks of 5/10/15 days each yield "
    "R/S = range of cumulative mean deviations over the block std — "
    "computed entirely from integers (n*cum_i - i*sx stays BIGINT, "
    "so R/S = (max-min)/sqrt(n*sxx - sx^2) is ONE sqrt and ONE "
    "division per block), block means decimal-summed, and H is the "
    "log-log OLS slope of mean R/S on block size. H>0.5 = "
    "long-memory persistence (bursty traffic that stays bursty), "
    "H<0.5 = mean reversion — the long-range-dependence diagnostic "
    "ACF (#343) cannot see past its fixed lags, and the capacity- "
    "planning input behind self-similar traffic models. Constant "
    "blocks (S=0) are excluded on both sides. Scale: one grid pass "
    "per size with block-local windows; blocks shrink the data "
    "1/sz-fold before any cross-block work.",
    bench=False,
)
def q_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(
            F.col("ts").cast("timestamp").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("d"),
    )
    bounds = o.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    days = bounds.select(
        F.col("mn"), F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("d")
    )
    types = o.select("event_type").distinct()
    cnt = o.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        types.crossJoin(days)
        .join(cnt, ["event_type", "d"], "left")
        .select(
            "event_type",
            (F.col("d") - F.col("mn")).alias("t"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("x"),
        )
    )
    sizes = spark.range(len(_HURST_SIZES)).select(
        F.element_at(
            F.array(*[F.lit(s) for s in _HURST_SIZES]), (F.col("id") + 1).cast("int")
        ).alias("sz")
    )
    sized = grid.crossJoin(F.broadcast(sizes)).select(
        "event_type", "sz", (F.col("t") / F.col("sz")).cast("bigint").alias("blk"),
        "t", "x",
    )
    wb = Window.partitionBy("event_type", "sz", "blk")
    wo = wb.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    scan = sized.select(
        "event_type", "sz", "blk", "x",
        F.row_number().over(wb.orderBy("t")).alias("i"),
        F.sum("x").over(wo).alias("cum"),
        F.sum("x").over(wb).alias("sx_all"),
    )
    dev = scan.select(
        "event_type", "sz", "blk", "x",
        (F.col("sz") * F.col("cum") - F.col("i") * F.col("sx_all")).alias("v"),
    )
    bagg = dev.groupBy("event_type", "sz", "blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.max("v").cast("bigint").alias("maxv"),
        F.min("v").cast("bigint").alias("minv"),
    )
    rs = (
        bagg.filter(
            (F.col("nb") == F.col("sz"))
            & (F.col("nb") * F.col("sxx") > F.col("sx") * F.col("sx"))
        )
        .groupBy("event_type", "sz")
        .agg(
            (
                F.sum(
                    (
                        (F.col("maxv") - F.col("minv")).cast("double")
                        / F.sqrt(
                            (
                                F.col("nb") * F.col("sxx")
                                - F.col("sx") * F.col("sx")
                            ).cast("double")
                        )
                    ).cast("decimal(38,12)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_rs"),
        )
        .localCheckpoint(eager=True)
    )
    lnsz = F.log(F.col("sz").cast("double"))
    lnrs = F.log("mean_rs")
    dec = "decimal(38,18)"
    fit = (
        rs.groupBy("event_type")
        .agg(
            (
                (
                    F.sum((lnsz * lnrs).cast(dec)).cast("double")
                    - F.sum(lnsz.cast(dec)).cast("double")
                    * F.sum(lnrs.cast(dec)).cast("double")
                    / F.count(F.lit(1))
                )
                / (
                    F.sum((lnsz * lnsz).cast(dec)).cast("double")
                    - F.sum(lnsz.cast(dec)).cast("double")
                    * F.sum(lnsz.cast(dec)).cast("double")
                    / F.count(F.lit(1))
                )
            ).alias("h"),
            F.count(F.lit(1)).alias("k"),
        )
        .filter(F.col("k") == len(_HURST_SIZES))
    )
    wide = rs.groupBy("event_type").pivot(
        "sz", [str(s) for s in _HURST_SIZES]
    ).agg(F.max("mean_rs"))
    return (
        wide.join(fit, "event_type")
        .select(
            "event_type",
            F.round(F.col("5"), 9).alias("rs5"),
            F.round(F.col("10"), 9).alias("rs10"),
            F.round(F.col("15"), 9).alias("rs15"),
            F.round("h", 9).alias("hurst"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# #407 heaps_law — vocabulary-growth exponent per language
# ---------------------------------------------------------------------------

_HEAPS_CHK = 20  # ~checkpoints per language


@query(
    "q_heaps_law",
    oracle=f"""
        WITH toks AS (
            SELECT lang, doc_id, UNNEST(LIST_FILTER(
                STRING_SPLIT(text, ' '), w -> LEN(w) > 0)) AS tok
            FROM documents
        ),
        dtok AS (
            SELECT lang, doc_id, CAST(COUNT(*) AS BIGINT) AS ntok
            FROM toks GROUP BY lang, doc_id
        ),
        firsts AS (
            SELECT lang, tok, MIN(doc_id) AS fd FROM toks GROUP BY lang, tok
        ),
        newv AS (
            SELECT lang, fd AS doc_id, CAST(COUNT(*) AS BIGINT) AS nv
            FROM firsts GROUP BY lang, fd
        ),
        docs2 AS (
            SELECT d.lang, d.doc_id, d.ntok, COALESCE(n.nv, 0) AS nv,
                   ROW_NUMBER() OVER (PARTITION BY d.lang
                                      ORDER BY d.doc_id) AS r,
                   COUNT(*) OVER (PARTITION BY d.lang) AS m
            FROM dtok d LEFT JOIN newv n
              ON n.lang = d.lang AND n.doc_id = d.doc_id
        ),
        cum AS (
            SELECT lang, r, m,
                   SUM(ntok) OVER w AS n_cum, SUM(nv) OVER w AS v_cum
            FROM docs2
            WINDOW w AS (PARTITION BY lang ORDER BY r
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        chk AS (
            SELECT lang, n_cum, v_cum FROM cum
            WHERE (r * {_HEAPS_CHK}) % m < {_HEAPS_CHK}
              AND n_cum > 0 AND v_cum > 0
        ),
        fit AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS k,
                   (CAST(SUM(CAST(LN(CAST(n_cum AS DOUBLE))
                                  * LN(CAST(v_cum AS DOUBLE))
                                  AS DECIMAL(38,18))) AS DOUBLE)
                    - CAST(SUM(CAST(LN(CAST(n_cum AS DOUBLE))
                                    AS DECIMAL(38,18))) AS DOUBLE)
                      * CAST(SUM(CAST(LN(CAST(v_cum AS DOUBLE))
                                      AS DECIMAL(38,18))) AS DOUBLE)
                      / COUNT(*))
                   / (CAST(SUM(CAST(LN(CAST(n_cum AS DOUBLE))
                                    * LN(CAST(n_cum AS DOUBLE))
                                    AS DECIMAL(38,18))) AS DOUBLE)
                      - CAST(SUM(CAST(LN(CAST(n_cum AS DOUBLE))
                                      AS DECIMAL(38,18))) AS DOUBLE)
                        * CAST(SUM(CAST(LN(CAST(n_cum AS DOUBLE))
                                        AS DECIMAL(38,18))) AS DOUBLE)
                        / COUNT(*)) AS beta,
                   CAST(SUM(CAST(LN(CAST(v_cum AS DOUBLE))
                                 AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*)
                       AS my,
                   CAST(SUM(CAST(LN(CAST(n_cum AS DOUBLE))
                                 AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*)
                       AS mx
            FROM chk GROUP BY lang
        ),
        tot AS (
            SELECT lang, MAX(n_cum) AS n_tokens, MAX(v_cum) AS vocab
            FROM cum GROUP BY lang
        )
        SELECT f.lang, f.k AS n_checkpoints,
               CAST(t.n_tokens AS BIGINT) AS n_tokens,
               CAST(t.vocab AS BIGINT) AS vocab,
               -- "+ 0" canonicalizes -0.0 (a flat vocab-growth series
               -- gives slope -0.0 in DuckDB, +0.0 in Spark) to +0.0.
               ROUND(f.beta, 9) + 0 AS beta,
               ROUND(EXP(f.my - f.beta * f.mx), 9) AS k_hat
        FROM fit f JOIN tot t ON t.lang = f.lang
        ORDER BY f.lang
    """,
    operators=(23, 31, 65, 407),
    doc=f"Heaps' law fit (#407): vocabulary growth V(n) = K n^beta per "
    "language — the sublinear vocab-vs-corpus-size law that sizes "
    "tokenizer vocabularies, embedding tables, and dedup hash "
    "budgets before a 100 TB crawl is committed. Corpus order is "
    "doc_id; per-doc new-vocabulary counts come from one "
    "first-occurrence census (min doc per token), cumulative token "
    f"and vocab counts from one window, ~{_HEAPS_CHK} decimated "
    "checkpoints per language ((r*k) % m < k — identical integer "
    "selection on both engines), and (K, beta) from closed-form "
    "log-log OLS with per-term DECIMAL(38,18) sums. Scale: the "
    "token stream is touched once (two hash aggregates); the "
    "per-language rank and cumulative sums are BUCKET-DECOMPOSED "
    "(functions/ranks.py discipline): doc_id div 4096 buckets get a "
    "map-side census, cumulative offsets ride a bucket-count-sized "
    "frame that broadcasts back, and the per-row window partitions "
    "by (lang, bucket) — no language's corpus ever funnels through "
    "one task; integer sums are exact in any order so the result is "
    "hash-identical to the oracle's single window. Degenerate inputs "
    "(zero-token prefixes) are filtered identically on both engines "
    "(n_cum/v_cum > 0) so neither LN(0)-raises (DuckDB) nor silently "
    "drops terms (Spark). Checkpoints bound the fit input regardless "
    "of SF.",
    bench=False,
)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _t(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("tok"),
    )
    dtok = toks.groupBy("lang", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("ntok")
    )
    firsts = toks.groupBy("lang", "tok").agg(F.min("doc_id").alias("fd"))
    newv = firsts.groupBy("lang", F.col("fd").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nv")
    )
    base = dtok.join(newv, ["lang", "doc_id"], "left").select(
        "lang",
        "doc_id",
        "ntok",
        F.coalesce("nv", F.lit(0)).alias("nv"),
        F.expr("doc_id div 4096").alias("bkt"),
    )
    # Bucket-decomposed per-language rank + cumulative sums
    # (functions/ranks.py discipline): census per (lang, bucket),
    # cumulative offsets over the tiny bucket frame, broadcast back,
    # per-row window partitioned by (lang, bucket). Integer sums are
    # exact in any order, so this is hash-identical to a single
    # per-language window without ever funneling a language's corpus
    # through one task.
    sizes = base.groupBy("lang", "bkt").agg(
        F.count(F.lit(1)).alias("_bn"),
        F.sum("ntok").alias("_bt"),
        F.sum("nv").alias("_bv"),
    )
    w_bkt = Window.partitionBy("lang").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, 0
    )
    offs = sizes.select(
        "lang",
        "bkt",
        (F.sum("_bn").over(w_bkt) - F.col("_bn")).alias("_offr"),
        (F.sum("_bt").over(w_bkt) - F.col("_bt")).alias("_offn"),
        (F.sum("_bv").over(w_bkt) - F.col("_bv")).alias("_offv"),
    )
    m_tot = base.groupBy("lang").agg(F.count(F.lit(1)).alias("m"))
    w_loc = Window.partitionBy("lang", "bkt").orderBy("doc_id")
    w_lcum = w_loc.rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        base.join(F.broadcast(offs), ["lang", "bkt"])
        .join(F.broadcast(m_tot), "lang")
        .select(
            "lang",
            (F.col("_offr") + F.row_number().over(w_loc)).alias("r"),
            F.col("m"),
            (F.col("_offn") + F.sum("ntok").over(w_lcum)).alias("n_cum"),
            (F.col("_offv") + F.sum("nv").over(w_lcum)).alias("v_cum"),
        )
        .localCheckpoint(eager=True)
    )
    chk = cum.filter(
        ((F.col("r") * _HEAPS_CHK) % F.col("m") < _HEAPS_CHK)
        & (F.col("n_cum") > 0)
        & (F.col("v_cum") > 0)
    )
    lnx = F.log(F.col("n_cum").cast("double"))
    lny = F.log(F.col("v_cum").cast("double"))
    dec = "decimal(38,18)"
    fit = chk.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (
            (
                F.sum((lnx * lny).cast(dec)).cast("double")
                - F.sum(lnx.cast(dec)).cast("double")
                * F.sum(lny.cast(dec)).cast("double")
                / F.count(F.lit(1))
            )
            / (
                F.sum((lnx * lnx).cast(dec)).cast("double")
                - F.sum(lnx.cast(dec)).cast("double")
                * F.sum(lnx.cast(dec)).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("beta"),
        (F.sum(lny.cast(dec)).cast("double") / F.count(F.lit(1))).alias("my"),
        (F.sum(lnx.cast(dec)).cast("double") / F.count(F.lit(1))).alias("mx"),
    )
    tot = cum.groupBy("lang").agg(
        F.max("n_cum").cast("bigint").alias("n_tokens"),
        F.max("v_cum").cast("bigint").alias("vocab"),
    )
    return (
        fit.join(tot, "lang")
        .select(
            "lang",
            F.col("k").alias("n_checkpoints"),
            "n_tokens",
            "vocab",
            # + 0 mirrors the oracle's -0.0 canonicalization.
            (F.round("beta", 9) + F.lit(0)).alias("beta"),
            F.round(F.exp(F.col("my") - F.col("beta") * F.col("mx")), 9).alias(
                "k_hat"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# #408 silhouette — simplified (centroid-based) silhouette for k-means
# ---------------------------------------------------------------------------


def _silhouette_oracle() -> str:
    from zmaxion_spark.queries.inference_q import (
        _KM_DIM,
        _KM_K,
        _KM_SEED_WORD,
        _km_sql_assign,
        _km_sql_update,
    )

    return f"""
        WITH seeds AS MATERIALIZED (
            SELECT vec_id, embedding,
                   ROW_NUMBER() OVER (ORDER BY {_KM_SEED_WORD}, vec_id) - 1
                       AS cluster
            FROM embeddings
            QUALIFY ROW_NUMBER() OVER (ORDER BY {_KM_SEED_WORD}, vec_id)
                    <= {_KM_K}
        ),
        c0 AS MATERIALIZED (
            SELECT cluster, t.i AS pos,
                   CAST(embedding[t.i + 1] AS DOUBLE) AS val
            FROM seeds, range({_KM_DIM}) t(i)
        ),
        {_km_sql_assign("c0", "a1")},
        {_km_sql_update("a1", "c0", "c1")},
        {_km_sql_assign("c1", "a2")},
        {_km_sql_update("a2", "c1", "c2")},
        c2l AS MATERIALIZED (
            SELECT cluster, LIST(val ORDER BY pos) AS vals
            FROM c2 GROUP BY cluster
        ),
        scored AS (
            SELECT e.vec_id, c.cluster,
                   LIST_REDUCE(
                       LIST_TRANSFORM(range(1, {_KM_DIM + 1}),
                           i -> (CAST(e.embedding[i] AS DOUBLE) - c.vals[i])
                                * (CAST(e.embedding[i] AS DOUBLE)
                                   - c.vals[i])),
                       (acc, x) -> acc + x) AS dist
            FROM embeddings e, c2l c
        ),
        ranked AS (
            SELECT vec_id, cluster, dist,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cluster) AS rn
            FROM scored
        ),
        ab AS (
            SELECT a.vec_id, a.cluster, a.dist AS da, b.dist AS db
            FROM ranked a JOIN ranked b
              ON b.vec_id = a.vec_id AND a.rn = 1 AND b.rn = 2
        ),
        sil AS (
            SELECT vec_id, cluster, da, db,
                   CASE WHEN GREATEST(da, db) = 0 THEN CAST(0 AS DOUBLE)
                        ELSE (db - da) / GREATEST(da, db) END AS s
            FROM ab
        )
        SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(SUM(CAST(da AS DECIMAL(38,12))) AS DOUBLE)
                     / COUNT(*), 9) AS mean_a,
               ROUND(CAST(SUM(CAST(db AS DECIMAL(38,12))) AS DOUBLE)
                     / COUNT(*), 9) AS mean_b,
               ROUND(CAST(SUM(CAST(s AS DECIMAL(38,18))) AS DOUBLE)
                     / COUNT(*), 9) AS mean_sil
        FROM sil GROUP BY cluster
        ORDER BY cluster
    """


@query(
    "q_silhouette",
    oracle=_silhouette_oracle(),
    operators=(44, 62, 273, 408),
    doc="Simplified silhouette (#408): cluster-quality grading for "
    "the #273 k-means fit (same md5 seeding and unrolled Lloyd "
    "rounds as q_kmeans_fixed, inference_q.py:257) — per point, "
    "a = squared distance to its OWN final centroid and b = the "
    "runner-up centroid distance (rank 2 of the (dist, cluster) "
    "ordering, which IS min-over-others even under ties), "
    "s = (b-a)/max(a,b); per-cluster means of a, b, s sum through "
    "DECIMAL casts. The centroid-based simplification is the "
    "production variant: full silhouette is O(n^2) pairwise and "
    "unusable at scale, while this is one n x k scoring pass — "
    "identical plan shape to assignment itself. Low mean_sil per "
    "cluster flags the overlapping clusters a pure inertia number "
    "(q_kmeans_fixed's) hides. Distances are pure-double left "
    "folds (the #273 discipline), so the rank-2 tie-break is "
    "engine-deterministic.",
    bench=False,
)
def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zmaxion_spark.queries.inference_q import _KM_K, _KM_ITERS

    emb = (
        _t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .cache()
    )
    word = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("long")
    seed_rows = emb.orderBy(word, "vec_id").limit(_KM_K).collect()
    cents: dict[int, list[float]] = {
        i: [float(x) for x in r.v] for i, r in enumerate(seed_rows)
    }

    def assign(c: dict[int, list[float]]) -> DataFrame:
        # Arrow-vectorized exact argmin (similarity.lloyd_assign_udf):
        # bit-identical to the k zip_with/aggregate HOF trees it
        # replaces (same fold order, same (dist, cluster) tie-break).
        from zmaxion_spark.functions import similarity as S

        best = S.lloyd_assign_udf(c)(F.col("v"))
        return emb.select(
            "vec_id",
            "v",
            best.getField("cluster").alias("cluster"),
            best.getField("dist").alias("dist"),
        )

    # identical Lloyd trajectory to q_kmeans_fixed: _KM_ITERS - 1
    # centroid updates (decimal-exact means, empty clusters keep
    # their previous centroid), bounded k*d driver state.
    a = assign(cents)
    for _ in range(_KM_ITERS - 1):
        cells = (
            a.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,9)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("val")
            )
            .collect()
        )
        new_c = dict(cents)
        by_cluster: dict[int, dict[int, float]] = {}
        for r in cells:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["val"]
        for cid, posmap in by_cluster.items():
            new_c[cid] = [posmap[p] for p in sorted(posmap)]
        cents = new_c
        a = assign(cents)

    # final centroids: score every point against ALL k, take rank-1/2
    # (Arrow-vectorized exact top-2, bit-identical to the array_sort
    # of k zip_with/aggregate structs it replaces — similarity.py).
    from zmaxion_spark.functions import similarity as S

    t2 = S.lloyd_top2_udf(cents)(F.col("v"))
    ab = emb.select(
        t2.getField("cluster").alias("cluster"),
        t2.getField("da").alias("da"),
        t2.getField("db").alias("db"),
    )
    s = F.when(F.greatest("da", "db") == 0, F.lit(0.0)).otherwise(
        (F.col("db") - F.col("da")) / F.greatest("da", "db")
    )
    return (
        ab.withColumn("s", s)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("da").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mean_a"),
            F.round(
                F.sum(F.col("db").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mean_b"),
            F.round(
                F.sum(F.col("s").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mean_sil"),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# #409 dbscan_core — grid-bucketed DBSCAN core/border/noise census
# ---------------------------------------------------------------------------

_DBS_EPS = 0.05
_DBS_MINPTS = 5  # neighbors within eps, self included
_DBS_SAMPLE = 4096  # md5-ranked sample cap: density clustering at 100 TB
#                     always runs on a bounded sample + assign-rest pass


@query(
    "q_dbscan_core",
    oracle=f"""
        WITH pts AS (
            SELECT vec_id, label,
                   CAST(embedding[1] AS DOUBLE) AS x,
                   CAST(embedding[2] AS DOUBLE) AS y
            FROM embeddings
            QUALIFY ROW_NUMBER() OVER (ORDER BY
                CAST(('0x' || SUBSTR(MD5('dbs:' || CAST(vec_id AS VARCHAR)),
                                     1, 13)) AS BIGINT), vec_id)
                <= {_DBS_SAMPLE}
        ),
        cells AS (
            SELECT vec_id, label, x, y,
                   CAST(FLOOR(x / {_DBS_EPS}) AS BIGINT) AS cx,
                   CAST(FLOOR(y / {_DBS_EPS}) AS BIGINT) AS cy
            FROM pts
        ),
        nbr AS (
            SELECT a.vec_id, CAST(COUNT(*) AS BIGINT) AS n_nbr
            FROM cells a JOIN cells b
              ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
             AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
             AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                 <= {_DBS_EPS} * {_DBS_EPS}
            GROUP BY a.vec_id
        ),
        flags AS (
            SELECT c.vec_id, c.label, c.x, c.y, c.cx, c.cy,
                   CAST(n.n_nbr >= {_DBS_MINPTS} AS INT) AS is_core
            FROM cells c JOIN nbr n ON n.vec_id = c.vec_id
        ),
        border AS (
            SELECT DISTINCT a.vec_id
            FROM flags a JOIN flags b
              ON a.is_core = 0 AND b.is_core = 1
             AND b.cx BETWEEN a.cx - 1 AND a.cx + 1
             AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
             AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                 <= {_DBS_EPS} * {_DBS_EPS}
             AND a.vec_id <> b.vec_id
        )
        SELECT f.label,
               CAST(SUM(f.is_core) AS BIGINT) AS n_core,
               CAST(SUM(CASE WHEN f.is_core = 0 AND b.vec_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_border,
               CAST(SUM(CASE WHEN f.is_core = 0 AND b.vec_id IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_noise
        FROM flags f LEFT JOIN border b ON b.vec_id = f.vec_id
        GROUP BY f.label
        ORDER BY f.label
    """,
    operators=(13, 17, 23, 409),
    doc=f"Grid-bucketed DBSCAN census (#409): core/border/noise "
    f"classification (eps={_DBS_EPS}, minPts={_DBS_MINPTS}, self "
    "included) over the first two embedding dimensions — the "
    "density-based complement to centroid clustering (#273/#408) "
    "that finds arbitrary-shape clusters and, crucially for "
    "training-data curation, labels NOISE points (the outliers a "
    "k-means silently swallows). The epsilon-neighbor join is "
    "grid-bucketed AND hash-partitionable: each probe point explodes "
    "to its 3x3 neighbor cells (9 rows) and EQUI-joins on the cell "
    "id — the q_spatial_grid_join (#154) shape — so the executed "
    "plan is a hash join keyed on (cx, cy), never a CartesianProduct "
    "(each candidate pair materializes exactly once: b's cell matches "
    "exactly one of a's nine probe cells, so semantics equal the "
    "BETWEEN form); border status is one more core-neighbor "
    "equi-semi-join. Fixed eps "
    "on growing density is inherently superlinear, so the graded "
    f"contract runs on an md5-ranked sample (cap {_DBS_SAMPLE}) — "
    "the sample+assign-rest pattern every production DBSCAN at "
    "100 TB uses; the cap is the stated semantics, not a silent "
    "truncation. Distances are identical IEEE trees; FLOOR of the "
    "same double is cross-engine exact.",
    bench=True,
)
def q_dbscan_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    word = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("dbs:"), F.col("vec_id").cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    w_rank = Window.orderBy(word.asc(), F.col("vec_id").asc())
    pts = (
        emb.select(
            "vec_id",
            "label",
            F.element_at(F.col("embedding"), 1).cast("double").alias("x"),
            F.element_at(F.col("embedding"), 2).cast("double").alias("y"),
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= _DBS_SAMPLE)
        .drop("rn")
    )
    cells = pts.select(
        "vec_id", "label", "x", "y",
        F.floor(F.col("x") / _DBS_EPS).cast("bigint").alias("cx"),
        F.floor(F.col("y") / _DBS_EPS).cast("bigint").alias("cy"),
    ).localCheckpoint(eager=True)
    # Explode each probe point to its 3x3 neighbor cells and EQUI-join
    # on the cell id: each candidate (a, b) pair materializes exactly
    # once (b's cell matches exactly one of a's nine probe cells), so
    # semantics equal the BETWEEN form, but Catalyst gets hash keys —
    # BroadcastHashJoin/SortMergeJoin instead of CartesianProduct.
    off = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = cells.select(
        "vec_id", "x", "y", "cx", "cy", F.explode(off).alias("o")
    ).select(
        "vec_id",
        "x",
        "y",
        (F.col("cx") + F.col("o.dx")).alias("qcx"),
        (F.col("cy") + F.col("o.dy")).alias("qcy"),
    )
    a = probe.alias("a")
    b = cells.alias("b")
    d2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    nbr = (
        a.join(
            b,
            (F.col("a.qcx") == F.col("b.cx"))
            & (F.col("a.qcy") == F.col("b.cy"))
            & (d2 <= _DBS_EPS * _DBS_EPS),
        )
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nbr"))
    )
    flags = cells.join(nbr, "vec_id").select(
        "vec_id", "label", "x", "y", "cx", "cy",
        (F.col("n_nbr") >= _DBS_MINPTS).cast("int").alias("is_core"),
    ).localCheckpoint(eager=True)
    fprobe = flags.filter(F.col("is_core") == 0).select(
        "vec_id", "x", "y", "cx", "cy", F.explode(off).alias("o")
    ).select(
        "vec_id",
        "x",
        "y",
        (F.col("cx") + F.col("o.dx")).alias("qcx"),
        (F.col("cy") + F.col("o.dy")).alias("qcy"),
    )
    fa = fprobe.alias("a")
    fb = flags.filter(F.col("is_core") == 1).alias("b")
    d2f = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    border = (
        fa.join(
            fb,
            (F.col("a.qcx") == F.col("b.cx"))
            & (F.col("a.qcy") == F.col("b.cy"))
            & (d2f <= _DBS_EPS * _DBS_EPS)
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("is_border", F.lit(1))
    )
    return (
        flags.join(border, "vec_id", "left")
        .groupBy("label")
        .agg(
            F.sum("is_core").cast("bigint").alias("n_core"),
            F.sum(
                F.when(
                    (F.col("is_core") == 0) & F.col("is_border").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_border"),
            F.sum(
                F.when(
                    (F.col("is_core") == 0) & F.col("is_border").isNull(), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_noise"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# #410 shapley_filters — exact Shapley attribution of 3 quality filters
# ---------------------------------------------------------------------------

_SHAP_MIN_CHARS = 200
_SHAP_MIN_WORDS = 40


@query(
    "q_shapley_filters",
    oracle=f"""
        WITH flags AS (
            SELECT CAST(n_chars >= {_SHAP_MIN_CHARS} AS BIGINT) AS fa,
                   CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                        w -> LEN(w) > 0))
                        >= {_SHAP_MIN_WORDS} AS BIGINT) AS fb,
                   CAST(CONTAINS(text, ' the ') AS BIGINT) AS fc
            FROM documents
        ),
        v AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(fa) AS BIGINT) AS va,
                   CAST(SUM(fb) AS BIGINT) AS vb,
                   CAST(SUM(fc) AS BIGINT) AS vc,
                   CAST(SUM(fa * fb) AS BIGINT) AS vab,
                   CAST(SUM(fa * fc) AS BIGINT) AS vac,
                   CAST(SUM(fb * fc) AS BIGINT) AS vbc,
                   CAST(SUM(fa * fb * fc) AS BIGINT) AS vabc
            FROM flags
        ),
        phi AS (
            SELECT 'min_chars' AS filter, n - va AS removed_solo,
                   2 * (n - va) + ((vb - vab) + (vc - vac))
                   + 2 * (vbc - vabc) AS num6, n, n - vabc AS r_full
            FROM v
            UNION ALL
            SELECT 'min_words', n - vb,
                   2 * (n - vb) + ((va - vab) + (vc - vbc))
                   + 2 * (vac - vabc), n, n - vabc
            FROM v
            UNION ALL
            SELECT 'has_the', n - vc,
                   2 * (n - vc) + ((va - vac) + (vb - vbc))
                   + 2 * (vab - vabc), n, n - vabc
            FROM v
        )
        SELECT filter, n AS n_docs, removed_solo, r_full AS removed_all,
               ROUND(CAST(num6 AS DOUBLE) / 6, 9) AS phi,
               ROUND(CAST(num6 AS DOUBLE) / 6 / r_full, 9) AS phi_share
        FROM phi
        ORDER BY filter
    """,
    operators=(24, 41, 410),
    doc="Exact Shapley filter attribution (#410): which of three "
    "document quality gates (min chars, min words, an English "
    "function-word marker) is actually responsible for the docs a "
    "conjunctive filter stack removes? The removal value "
    "r(S) = N - |docs passing all filters in S| is evaluated on "
    "all 8 subsets from ONE census (the subset counts are sums of "
    "flag products — a single pass, no 8 scans), and each filter's "
    "exact Shapley value is the closed 3-player form "
    "phi_i = [2(r(i)-r(0)) + (r(ij)-r(j)) + (r(ik)-r(k)) + "
    "2(r(N)-r(N\\\\i))]/6 — an integer numerator over one division. "
    "Additivity (sum phi = r(full)) makes phi_share a defensible "
    "'% of removals owed to this gate' — the attribution question "
    "every Gopher-style (#174) filter stack review asks, answered "
    "exactly instead of by one-at-a-time ablation (which "
    "double-counts overlaps). Scale: one corpus scan, a 1-row "
    "census, a 3-row fan-out.",
    bench=False,
)
def q_shapley_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    flags = d.select(
        (F.col("n_chars") >= _SHAP_MIN_CHARS).cast("bigint").alias("fa"),
        (
            F.size(F.filter(F.split("text", " "), lambda w: F.length(w) > 0))
            >= _SHAP_MIN_WORDS
        )
        .cast("bigint")
        .alias("fb"),
        F.col("text").contains(" the ").cast("bigint").alias("fc"),
    )
    v = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("fa").cast("bigint").alias("va"),
        F.sum("fb").cast("bigint").alias("vb"),
        F.sum("fc").cast("bigint").alias("vc"),
        F.sum(F.col("fa") * F.col("fb")).cast("bigint").alias("vab"),
        F.sum(F.col("fa") * F.col("fc")).cast("bigint").alias("vac"),
        F.sum(F.col("fb") * F.col("fc")).cast("bigint").alias("vbc"),
        F.sum(F.col("fa") * F.col("fb") * F.col("fc"))
        .cast("bigint")
        .alias("vabc"),
    )
    n, va, vb, vc = F.col("n"), F.col("va"), F.col("vb"), F.col("vc")
    vab, vac, vbc, vabc = (
        F.col("vab"), F.col("vac"), F.col("vbc"), F.col("vabc"),
    )
    rows = [
        ("min_chars", n - va,
         2 * (n - va) + ((vb - vab) + (vc - vac)) + 2 * (vbc - vabc)),
        ("min_words", n - vb,
         2 * (n - vb) + ((va - vab) + (vc - vbc)) + 2 * (vac - vabc)),
        ("has_the", n - vc,
         2 * (n - vc) + ((va - vac) + (vb - vbc)) + 2 * (vab - vabc)),
    ]
    parts = [
        v.select(
            F.lit(name).alias("filter"),
            n.alias("n_docs"),
            solo.alias("removed_solo"),
            (n - vabc).alias("removed_all"),
            F.round(num6.cast("double") / 6, 9).alias("phi"),
            F.round(num6.cast("double") / 6 / (n - vabc), 9).alias(
                "phi_share"
            ),
        )
        for name, solo, num6 in rows
    ]
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionByName(pt)
    return out.orderBy("filter")


# ---------------------------------------------------------------------------
# #411 token_fertility — engine-trained BPE fertility per language
# ---------------------------------------------------------------------------


def _fertility_oracle() -> str:
    from zmaxion_spark.queries.llm import _bpe_oracle

    base = _bpe_oracle()
    body = base[: base.rindex("SELECT mr AS merge_rank")]
    body = body[body.index("WITH") + 4 :].rstrip().rstrip(",")
    return f"""
        WITH {body},
        dr AS (
            SELECT doc_id, lang,
                   CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                        w -> LEN(w) > 0)) AS BIGINT)
                       AS n_words,
                   LENGTH(REPLACE(text, ' ', '')) AS n_chars,
                   ARRAY_TO_STRING(LIST_TRANSFORM(
                       LIST_FILTER(STRING_SPLIT(text, ' '), w -> LEN(w) > 0),
                       w -> '[' || ARRAY_TO_STRING(
                                LIST_TRANSFORM(RANGE(1, LEN(w) + 1),
                                               i -> SUBSTR(w, i, 1)), '][')
                            || ']'), ' ') AS rp
            FROM documents
        ),
        applied AS (
            SELECT doc_id, lang, n_words, n_chars,
                   LEN(fin) - LEN(REPLACE(fin, '[', '')) AS n_tokens
            FROM (
                SELECT doc_id, lang, n_words, n_chars,
                       REPLACE(REPLACE(REPLACE(rp,
                           '[' || m1.ls || '][' || m1.rs || ']',
                           '[' || m1.ls || m1.rs || ']'),
                           '[' || m2.ls || '][' || m2.rs || ']',
                           '[' || m2.ls || m2.rs || ']'),
                           '[' || m3.ls || '][' || m3.rs || ']',
                           '[' || m3.ls || m3.rs || ']') AS fin
                FROM dr CROSS JOIN m1 CROSS JOIN m2 CROSS JOIN m3
            )
        )
        SELECT lang,
               CAST(SUM(n_words) AS BIGINT) AS n_words,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               ROUND(CAST(SUM(n_tokens) AS DOUBLE) / SUM(n_words), 9)
                   AS fertility,
               ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens), 9)
                   AS chars_per_token
        FROM applied
        GROUP BY lang
        ORDER BY lang
    """


@query(
    "q_token_fertility",
    oracle=_fertility_oracle(),
    operators=(23, 65, 221, 232, 411),
    doc="Tokenizer fertility census (#411): tokens-per-word and "
    "chars-per-token per language under the ENGINE-TRAINED BPE "
    "(#221's merges, applied with #232's boundary-safe replace "
    "semantics) — the metric that decides whether a tokenizer "
    "under-serves a language (high fertility = more tokens per "
    "word = higher serving cost and shorter effective context for "
    "that language), the per-language audit every multilingual "
    "data pipeline runs before committing a vocabulary. English "
    "fertility drops under the English-trained merges while other "
    "languages stay near character-level — the cross-lingual "
    "imbalance the metric exists to expose. Scale: training never "
    "rescans the corpus (vocab-sized merge rounds); application "
    "is one corpus scan with three codegen string replaces and a "
    "5-row census.",
    bench=False,
)
def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zmaxion_spark.queries.llm import q_bpe_train

    train = q_bpe_train(spark, sf_dir)
    m = [
        F.broadcast(
            train.filter(F.col("merge_rank") == t).select(
                F.col("left_sym").alias(f"l{t}"),
                F.col("right_sym").alias(f"r{t}"),
            )
        )
        for t in (1, 2, 3)
    ]
    d = _t(spark, sf_dir, "documents")
    rp = F.expr(
        "array_join(transform(filter(split(text, ' '), w -> length(w) > 0), "
        "w -> concat('[', array_join(transform(sequence(1, length(w)), "
        "i -> substring(w, i, 1)), ']['), ']')), ' ')"
    )
    n_words = F.size(F.filter(F.split("text", " "), lambda w: F.length(w) > 0))
    df = d.select(
        "doc_id",
        "lang",
        n_words.cast("bigint").alias("n_words"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_chars"),
        rp.alias("rp"),
    )
    for t in (1, 2, 3):
        df = df.crossJoin(m[t - 1]).select(
            "doc_id", "lang", "n_words", "n_chars",
            F.replace(
                F.col("rp"),
                F.concat(
                    F.lit("["), F.col(f"l{t}"), F.lit("]["),
                    F.col(f"r{t}"), F.lit("]"),
                ),
                F.concat(
                    F.lit("["), F.col(f"l{t}"), F.col(f"r{t}"), F.lit("]")
                ),
            ).alias("rp"),
        )
    tok = df.select(
        "lang", "n_words", "n_chars",
        (
            F.length(F.col("rp"))
            - F.length(F.regexp_replace(F.col("rp"), "\\[", ""))
        ).alias("n_tokens"),
    )
    return (
        tok.groupBy("lang")
        .agg(
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.round(
                F.sum("n_tokens").cast("double") / F.sum("n_words"), 9
            ).alias("fertility"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_tokens"), 9
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# #412 mixing_weights — temperature-sampled data mixing plan per source
# ---------------------------------------------------------------------------

_MIX_ALPHAS = ("1.0", "0.7", "0.5", "0.3")


@query(
    "q_mixing_weights",
    oracle=f"""
        WITH src AS (
            SELECT source,
                   CAST(SUM(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                            w -> LEN(w) > 0))) AS BIGINT)
                       AS tokens
            FROM documents GROUP BY source
            HAVING SUM(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                       w -> LEN(w) > 0))) > 0
        ),
        tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS t_all FROM src),
        grid AS (
            SELECT s.source, s.tokens, a.alpha
            FROM src s
            CROSS JOIN (SELECT UNNEST([
                {", ".join(_MIX_ALPHAS)}]) AS alpha) a
        ),
        pw AS (
            SELECT source, tokens, alpha,
                   EXP(alpha * LN(CAST(tokens AS DOUBLE))) AS t_pow
            FROM grid
        ),
        z AS (
            SELECT alpha,
                   CAST(SUM(CAST(t_pow AS DECIMAL(38,12))) AS DOUBLE) AS zsum
            FROM pw GROUP BY alpha
        )
        SELECT p.source, p.alpha, p.tokens,
               ROUND(p.t_pow / z.zsum, 9) AS weight,
               ROUND(p.t_pow / z.zsum * t.t_all / p.tokens, 9)
                   AS eff_epochs
        FROM pw p
        JOIN z ON z.alpha = p.alpha
        CROSS JOIN tot t
        ORDER BY p.alpha, p.source
    """,
    operators=(23, 31, 412),
    doc="Temperature-sampled mixing weights (#412): the data-"
    "scheduling table behind every multilingual / multi-source "
    "LLM pretraining run (the T5/mT5 alpha-sampling recipe) — "
    "per-source token counts feed w_s(alpha) = T_s^alpha / "
    "SUM T^alpha over an alpha grid (1.0 = proportional, 0.3 = "
    "strongly flattened), and eff_epochs = w_s * T_total / T_s "
    "exposes the over-sampling factor each low-resource source "
    "would endure — the repetition-risk number (beside #303's "
    "perplexity and #89's repetition gate) that decides whether "
    "flattening is safe or will memorize a small source. T^alpha "
    "is written as EXP(alpha * LN(T)) — one identical libm tree "
    "on both engines (never engine POWER) — and the per-alpha "
    "normalizer sums through DECIMAL(38,12). Zero-token sources are "
    "filtered identically on both engines (tokens > 0) so neither "
    "LN(0)-raises (DuckDB) nor silently drops rows (Spark). Scale: "
    "one corpus scan to a |sources|-row census; the grid is "
    "constant-size.",
    bench=False,
)
def q_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(
            F.size(F.filter(F.split("text", " "), lambda w: F.length(w) > 0))
        )
        .cast("bigint")
        .alias("tokens")
    ).filter(F.col("tokens") > 0)
    tot = src.agg(F.sum("tokens").cast("bigint").alias("t_all"))
    alphas = spark.range(len(_MIX_ALPHAS)).select(
        F.element_at(
            F.array(*[F.lit(float(a)) for a in _MIX_ALPHAS]),
            (F.col("id") + 1).cast("int"),
        ).alias("alpha")
    )
    pw = src.crossJoin(F.broadcast(alphas)).select(
        "source", "tokens", "alpha",
        F.exp(F.col("alpha") * F.log(F.col("tokens").cast("double"))).alias(
            "t_pow"
        ),
    )
    z = pw.groupBy("alpha").agg(
        F.sum(F.col("t_pow").cast("decimal(38,12)")).cast("double").alias(
            "zsum"
        )
    )
    return (
        pw.join(z, "alpha")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "alpha",
            "tokens",
            F.round(F.col("t_pow") / F.col("zsum"), 9).alias("weight"),
            F.round(
                F.col("t_pow") / F.col("zsum") * F.col("t_all") / F.col("tokens"),
                9,
            ).alias("eff_epochs"),
        )
        .orderBy("alpha", "source")
    )
