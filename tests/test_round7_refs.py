"""Round-7 independent-reference tests (SURVEY.md §5.4).

Every statistic added in round 7 is recomputed here by a pure-Python
(or numpy / math.lgamma) implementation that shares NO code or
formula derivation with either engine side — the round-6 lesson is
that a Spark query and its mirrored DuckDB oracle can agree on the
same wrong formula, so each new test must also clear an independent
implementation on the real fixture.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.registry import REGISTRY


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF_SMOKE).collect()


def _arm_values(spark):
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    a = sorted(r.x for r in ev if r.user_id % 2 == 0)
    b = sorted(r.x for r in ev if r.user_id % 2 == 1)
    return a, b


def _midranks(values):
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(values):
        j = i
        while j + 1 < len(values) and values[order[j + 1]] == values[order[i]]:
            j += 1
        avg = (i + j) / 2.0 + 1.0
        for t in range(i, j + 1):
            ranks[order[t]] = avg
        i = j + 1
    return ranks


def test_mann_whitney_matches_rank_sum_reference(spark):
    """#373 via the rank-sum route: U = R1 - n1(n1+1)/2 with float
    midranks over the pooled sample (not the pair-count route the
    engines use), tie-corrected z per the classical formula."""
    a, b = _arm_values(spark)
    n1, n2 = len(a), len(b)
    pooled = a + b
    ranks = _midranks(pooled)
    r1 = sum(ranks[:n1])
    u = r1 - n1 * (n1 + 1) / 2.0
    from collections import Counter

    tie = sum(t**3 - t for t in Counter(pooled).values())
    nn = n1 + n2
    sigma = math.sqrt(
        n1 * n2 / 12.0 * ((nn + 1) - tie / (nn * (nn - 1.0)))
    )
    z_ref = (u - n1 * n2 / 2.0) / sigma
    got = _rows(spark, "q_mann_whitney")[0]
    assert got.n1 == n1 and got.n2 == n2
    assert abs(got.u_stat - u) < 1e-9
    assert abs(got.z - z_ref) < 1e-6
    assert got.significant == int(abs(z_ref) > 1.959963984540054)


def test_wilcoxon_matches_signed_rank_reference(spark):
    """#374 with float midranks of |diff| and the textbook W+/sigma."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "user_id",
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .collect()
    )
    mn = min(r.d for r in ev)
    mx = max(r.d for r in ev)
    per = {}
    for r in ev:
        early = r.d * 2 < mn + mx
        e, l = per.get(r.user_id, (0, 0))
        per[r.user_id] = (e + (1 if early else 0), l + (0 if early else 1))
    diffs = [e - l for e, l in per.values() if e != l]
    n = len(diffs)
    absd = [abs(d) for d in diffs]
    ranks = _midranks(absd)
    w_plus = sum(r for r, d in zip(ranks, diffs) if d > 0)
    from collections import Counter

    tie = sum(t**3 - t for t in Counter(absd).values())
    sigma = math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tie / 48.0)
    z_ref = (w_plus - n * (n + 1) / 4.0) / sigma
    got = _rows(spark, "q_wilcoxon_signed_rank")[0]
    assert got.n == n
    assert abs(got.w_plus - w_plus) < 1e-9
    assert abs(got.z - z_ref) < 1e-6


def test_fisher_exact_matches_lgamma_reference(spark):
    """#375 against math.lgamma — fully independent of the portable
    Stirling machinery both engines share."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "lang", "source"
    ).collect()
    a = sum(1 for r in docs if r.source == "src1" and r.lang == "en")
    r1 = sum(1 for r in docs if r.source == "src1")
    c1 = sum(1 for r in docs if r.lang == "en")
    nn = len(docs)
    r2, _c2 = nn - r1, nn - c1

    def lf(n):
        return math.lgamma(n + 1)

    def logp(k):
        return (
            lf(r1)
            + lf(r2)
            + lf(c1)
            + lf(nn - c1)
            - lf(nn)
            - lf(k)
            - lf(r1 - k)
            - lf(c1 - k)
            - lf(r2 - c1 + k)
        )

    lo, hi = max(0, c1 - r2), min(r1, c1)
    lp_obs = logp(a)
    p_two = sum(
        math.exp(logp(k))
        for k in range(lo, hi + 1)
        if logp(k) <= lp_obs + 1e-7
    )
    got = _rows(spark, "q_fisher_exact")[0]
    assert got.a == a and got.r1 == r1 and got.c1 == c1 and got.nn == nn
    assert abs(got.p_observed - math.exp(lp_obs)) < 1e-9
    assert abs(got.p_two_sided - p_two) < 1e-7
    assert got.significant == int(p_two < 0.05)


def test_cramer_von_mises_matches_ecdf_reference(spark):
    """#377 as a direct ECDF integral with float fractions."""
    a, b = _arm_values(spark)
    n1, n2 = len(a), len(b)
    nn = n1 + n2
    vals = sorted(set(a + b))
    t_ref = 0.0
    for v in vals:
        fa = sum(1 for x in a if x <= v) / n1
        gb = sum(1 for x in b if x <= v) / n2
        tv = sum(1 for x in a + b if x == v)
        t_ref += tv * (fa - gb) ** 2
    t_ref *= n1 * n2 / (nn * nn)
    got = _rows(spark, "q_cramer_von_mises")[0]
    assert got.n1 == n1 and got.n2 == n2
    assert abs(got.t_stat - t_ref) < 1e-9


def test_holt_winters_matches_python_fold(spark):
    """#380: the full additive HW recursion replayed in pure Python."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    mn = min(r.d for r in ev)
    mx = max(r.d for r in ev)
    types = sorted({r.event_type for r in ev})
    cnt = {(r.event_type, r.d): r.x for r in ev}
    got = {r.event_type: r for r in _rows(spark, "q_holt_winters")}
    for et in types:
        ys = [float(cnt.get((et, d), 0)) for d in range(mn, mx + 1)]
        n = len(ys)
        l = sum(ys[:7]) / 7
        bb = (sum(ys[7:14]) - sum(ys[:7])) / 49
        s = [ys[i] - l for i in range(7)]
        sse = 0.0
        for t in range(7, n):
            x = ys[t]
            so = s[t % 7]
            err = x - ((l + bb) + so)
            sse += err * err
            l_new = 0.2 * (x - so) + 0.8 * (l + bb)
            bb = 0.1 * (l_new - l) + 0.9 * bb
            s[t % 7] = 0.3 * (x - l_new) + 0.7 * so
            l = l_new
        g = got[et]
        assert g.n_days == n
        assert abs(g.level - l) < 1e-6
        assert abs(g.trend - bb) < 1e-6
        assert abs(g.rmse - (sse / (n - 7)) ** 0.5) < 1e-6
        assert abs(g.forecast_1 - ((l + bb) + s[n % 7])) < 1e-6
        assert abs(g.forecast_7 - ((l + 7 * bb) + s[(n + 6) % 7])) < 1e-6


def test_ar2_and_granger_match_numpy_reference(spark):
    """#378/#379 against numpy lstsq — independent of the closed
    determinant forms both engines share."""
    import numpy as np

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    mn = min(r.d for r in ev)
    mx = max(r.d for r in ev)
    cnt = {(r.event_type, r.d): r.x for r in ev}

    def series(et):
        return np.array(
            [float(cnt.get((et, d), 0)) for d in range(mn, mx + 1)]
        )

    # AR(2): Yule-Walker from biased autocovariances
    got = {r.event_type: r for r in _rows(spark, "q_ar2_forecast")}
    for et in sorted({r.event_type for r in ev}):
        x = series(et)
        mu = x.mean()
        xc = x - mu
        c0 = float(xc @ xc)
        c1 = float(xc[1:] @ xc[:-1])
        c2 = float(xc[2:] @ xc[:-2])
        r1, r2 = c1 / c0, c2 / c0
        phi1 = r1 * (1 - r2) / (1 - r1 * r1)
        phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
        g = got[et]
        assert abs(g.phi1 - phi1) < 1e-6
        assert abs(g.phi2 - phi2) < 1e-6
        f1 = mu + phi1 * (x[-1] - mu) + phi2 * (x[-2] - mu)
        assert abs(g.forecast_1 - f1) < 1e-6

    # Granger: restricted vs unrestricted OLS via lstsq
    granger = {(r.cause, r.effect): r for r in _rows(spark, "q_granger_lag")}
    for cause, effect in [("click", "view"), ("view", "click")]:
        y_full = series(effect)
        x_full = series(cause)
        y, yl, xl = y_full[1:], y_full[:-1], x_full[:-1]
        m = len(y)
        ones = np.ones(m)

        def rss(design):
            beta, *_ = np.linalg.lstsq(design, y, rcond=None)
            resid = y - design @ beta
            return float(resid @ resid)

        rss_r = rss(np.column_stack([ones, yl]))
        rss_u = rss(np.column_stack([ones, yl, xl]))
        f_ref = (rss_r - rss_u) * (m - 3) / rss_u
        g = granger[(cause, effect)]
        assert g.m == m
        assert abs(g.f_stat - f_ref) < 1e-4, (g.f_stat, f_ref)


def test_permutation_entropy_matches_python_reference(spark):
    """#381: ordinal codes + entropy recomputed with argsort-style
    stable ranking in pure Python."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    mn = min(r.d for r in ev)
    mx = max(r.d for r in ev)
    cnt = {(r.event_type, r.d): r.x for r in ev}
    got = {r.event_type: r for r in _rows(spark, "q_permutation_entropy")}
    for et in sorted({r.event_type for r in ev}):
        xs = [cnt.get((et, d), 0) for d in range(mn, mx + 1)]
        from collections import Counter

        codes = Counter()
        for i in range(len(xs) - 3):
            w = xs[i : i + 4]
            # stable rank == position in a stable argsort
            order = sorted(range(4), key=lambda j: (w[j], j))
            rank = [0] * 4
            for pos, j in enumerate(order):
                rank[j] = pos
            code = ((rank[0] * 4 + rank[1]) * 4 + rank[2]) * 4 + rank[3]
            codes[code] += 1
        n = sum(codes.values())
        h = -sum(c / n * math.log(c / n) for c in codes.values())
        g = got[et]
        assert g.n_windows == n
        assert g.n_patterns == len(codes)
        assert abs(g.h - h) < 1e-6
        top = min(codes, key=lambda c: (-codes[c], c))
        assert g.top_code == top


def test_dtw_band_reference_and_toy(spark):
    """#386: pinned toy DTW values + band-vs-unbanded dominance on
    the real fixture."""

    def dtw(a, b, w=None):
        n, m = len(a), len(b)
        big = float("inf")
        dp = [[big] * m for _ in range(n)]
        for i in range(n):
            js = range(m) if w is None else range(
                max(0, i - w), min(m, i + w + 1)
            )
            for j in js:
                cost = abs(a[i] - b[j])
                if i == 0 and j == 0:
                    dp[i][j] = cost
                    continue
                prev = min(
                    dp[i - 1][j] if i > 0 else big,
                    dp[i][j - 1] if j > 0 else big,
                    dp[i - 1][j - 1] if i > 0 and j > 0 else big,
                )
                dp[i][j] = cost + prev if prev < big else big
        return dp[n - 1][m - 1]

    # identical series -> 0; unit shift of a spike -> cost bounded
    assert dtw([1, 2, 3, 2, 1], [1, 2, 3, 2, 1], 5) == 0
    assert dtw([0, 5, 0, 0], [0, 0, 5, 0], 5) == 0  # phase shift absorbed
    assert dtw([0, 5, 0, 0], [0, 0, 5, 0], 0) == 10  # lock-step cannot

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    mn = min(r.d for r in ev)
    mx = max(r.d for r in ev)
    cnt = {(r.event_type, r.d): r.x for r in ev}
    ser = {
        et: [cnt.get((et, d), 0) for d in range(mn, mx + 1)]
        for et in sorted({r.event_type for r in ev})
    }
    got = _rows(spark, "q_dtw_distance")
    for r in got:
        ref = dtw(ser[r.type_a], ser[r.type_b], 5)
        assert r.dtw == ref, (r.type_a, r.type_b, r.dtw, ref)
        # banded >= unbanded always
        assert r.dtw >= dtw(ser[r.type_a], ser[r.type_b], None)


def test_t_closeness_matches_python_reference(spark):
    """#384: ordered EMD recomputed with float cumulative fractions
    for a sample of QI classes."""
    rows = (
        load_table(spark, SF_SMOKE, "customer")
        .join(
            load_table(spark, SF_SMOKE, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_nationkey", "c_mktsegment", "o_orderpriority")
        .collect()
    )
    cats = sorted({r.o_orderpriority for r in rows})
    m = len(cats)
    from collections import Counter

    glob = Counter(r.o_orderpriority for r in rows)
    nt = len(rows)
    got = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in _rows(spark, "q_t_closeness")
    }
    checked = 0
    for key in list(got)[:10]:
        grp = [
            r.o_orderpriority
            for r in rows
            if (r.c_nationkey, r.c_mktsegment) == key
        ]
        gc = Counter(grp)
        cum_g, cum_t, emd = 0.0, 0.0, 0.0
        for cat in cats:
            cum_g += gc.get(cat, 0) / len(grp)
            cum_t += glob[cat] / nt
            emd += abs(cum_g - cum_t)
        t_ref = emd / (m - 1)
        assert abs(got[key].t_value - t_ref) < 1e-6
        checked += 1
    assert checked == 10


def test_smote_nn_and_interpolation_reference(spark):
    """#385: 1-NN and lam recomputed with numpy + hashlib."""
    import numpy as np

    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    from collections import Counter

    counts = Counter(r.label for r in emb)
    mlab = min(counts, key=lambda l: (counts[l], l))
    mino = [(r.vec_id, np.array(r.embedding, dtype=np.float64)) for r in emb
            if r.label == mlab]
    got = {r.vec_id: r for r in _rows(spark, "q_smote_interpolate")}
    assert set(got) == {vid for vid, _ in mino}
    for vid, v in mino:
        dists = sorted(
            (round(float(((v - u) ** 2).sum()), 9), uid)
            for uid, u in mino
            if uid != vid
        )
        d2, nn_id = dists[0]
        g = got[vid]
        assert g.nn_id == nn_id
        assert abs(g.nn_d2 - d2) < 1e-6
        h = hashlib.md5(f"smote:{vid}".encode()).hexdigest()[:13]
        lam_ref = int(h, 16) / 2**52
        assert abs(g.lam - lam_ref) < 1e-9


# ---------------------------------------------------------------------------
# Wave-3 references (#387-#393)
# ---------------------------------------------------------------------------


def test_jonckheere_matches_pairwise_reference(spark):
    """#390: J and the tie-corrected variance recomputed by direct
    pairwise counting over raw day samples."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    mn = min(r.d for r in ev)
    groups = {}
    for r in ev:
        groups.setdefault((r.d - mn) // 7, []).append(r.x)
    keys = sorted(groups)
    j = 0.0
    for gi in range(len(keys)):
        for gh in range(gi + 1, len(keys)):
            for xa in groups[keys[gi]]:
                for xb in groups[keys[gh]]:
                    if xb > xa:
                        j += 1.0
                    elif xb == xa:
                        j += 0.5
    ns = [len(groups[k]) for k in keys]
    nn = sum(ns)
    from collections import Counter

    allv = [x for k in keys for x in groups[k]]
    tc = Counter(allv).values()
    a25 = sum(n * (n - 1) * (2 * n + 5) for n in ns)
    b25 = sum(t * (t - 1) * (2 * t + 5) for t in tc)
    a3 = sum(n * (n - 1) * (n - 2) for n in ns)
    b3 = sum(t * (t - 1) * (t - 2) for t in tc)
    a2 = sum(n * (n - 1) for n in ns)
    b2 = sum(t * (t - 1) for t in tc)
    mean = (nn * nn - sum(n * n for n in ns)) / 4.0
    var = (
        (nn * (nn - 1) * (2 * nn + 5) - a25 - b25) / 72.0
        + a3 * b3 / (36.0 * nn * (nn - 1) * (nn - 2))
        + a2 * b2 / (8.0 * nn * (nn - 1))
    )
    z_ref = (j - mean) / math.sqrt(var)
    got = _rows(spark, "q_jonckheere_terpstra")[0]
    assert got.n_days == nn
    assert abs(got.j_stat - j) < 1e-9
    assert abs(got.z - z_ref) < 1e-6


def test_kendall_w_matches_midrank_reference(spark):
    """#391: W recomputed with float midranks per judge."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    mn = min(r.d for r in ev)
    mx = max(r.d for r in ev)
    types = sorted({r.event_type for r in ev})
    cnt = {(r.event_type, r.d): r.x for r in ev}
    n = mx - mn + 1
    k = len(types)
    rsum = [0.0] * n
    tsum = 0.0
    for et in types:
        vals = [cnt.get((et, d), 0) for d in range(mn, mx + 1)]
        rks = _midranks(vals)
        for i, r in enumerate(rks):
            rsum[i] += r
        from collections import Counter

        tsum += sum(t**3 - t for t in Counter(vals).values())
    s = sum((r - k * (n + 1) / 2.0) ** 2 for r in rsum)
    w_ref = 12 * s / (k * k * (n**3 - n) - k * tsum)
    got = _rows(spark, "q_kendall_w")[0]
    assert got.n_days == n and got.n_judges == k
    assert abs(got.w - w_ref) < 1e-6
    assert abs(got.chi2 - k * (n - 1) * w_ref) < 1e-6


def test_hodges_lehmann_matches_brute_force(spark):
    """#392: the median of pairwise differences by brute force."""
    a, b = _arm_values(spark)
    diffs = sorted(x - y for x in a for y in b)
    t = len(diffs)
    lo = diffs[(t + 1) // 2 - 1]
    hi = diffs[t // 2 + 1 - 1]
    got = _rows(spark, "q_hodges_lehmann")[0]
    assert got.n_pairs == t
    assert got.hl_lo == lo and got.hl_hi == hi
    assert abs(got.hl_estimate - (lo + hi) / 2.0) < 1e-9


def test_cochran_armitage_matches_reference(spark):
    """#389: CA z recomputed from raw per-band counts."""
    rows = (
        load_table(spark, SF_SMOKE, "customer")
        .filter(F.col("c_acctbal") >= 0)
        .join(
            load_table(spark, SF_SMOKE, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_acctbal", "o_orderpriority")
        .collect()
    )
    from collections import Counter

    n_s, r_s = Counter(), Counter()
    for r in rows:
        s = min(int(r.c_acctbal // 3000), 3)
        n_s[s] += 1
        if r.o_orderpriority == "1-URGENT":
            r_s[s] += 1
    nn = sum(n_s.values())
    rr = sum(r_s.values())
    p = rr / nn
    num = sum(s * r_s[s] for s in n_s) - sum(s * n_s[s] for s in n_s) * p
    var = p * (1 - p) * (
        sum(s * s * n_s[s] for s in n_s)
        - sum(s * n_s[s] for s in n_s) ** 2 / nn
    )
    z_ref = num / math.sqrt(var)
    got = _rows(spark, "q_cochran_armitage")[0]
    assert got.n_total == nn and got.n_events == rr
    assert abs(got.z - z_ref) < 1e-6


def test_mood_median_matches_reference(spark):
    """#393: grand-median 2xk chi2 recomputed directly."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    vals = sorted(r.x for r in ev)
    m = len(vals)
    gm = (vals[(m + 1) // 2 - 1] + vals[(m + 2) // 2 - 1]) / 2.0
    from collections import Counter

    above, below = Counter(), Counter()
    for r in ev:
        if r.x > gm:
            above[r.event_type] += 1
        elif r.x < gm:
            below[r.event_type] += 1
    types = sorted(set(above) | set(below))
    ta = sum(above.values())
    tb = sum(below.values())
    chi2 = 0.0
    for et in types:
        a, b = above[et], below[et]
        ea = (a + b) * ta / (ta + tb)
        eb = (a + b) * tb / (ta + tb)
        chi2 += (a - ea) ** 2 / ea + (b - eb) ** 2 / eb
    got = _rows(spark, "q_mood_median")[0]
    assert got.k == len(types)
    assert got.n_used == ta + tb
    assert abs(got.chi2 - chi2) < 1e-6


def test_item_cf_cosine_reference(spark):
    """#387: cosine and ranking recomputed from raw baskets for a
    sample of items."""
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    from collections import Counter, defaultdict

    orders = defaultdict(set)
    for r in li:
        orders[r.l_orderkey].add(r.l_partkey)
    n_item = Counter()
    co = Counter()
    for items in orders.values():
        for i in items:
            n_item[i] += 1
        s = sorted(items)
        for ai in range(len(s)):
            for bi in range(ai + 1, len(s)):
                co[(s[ai], s[bi])] += 1
                co[(s[bi], s[ai])] += 1
    got = _rows(spark, "q_item_cf_topk")
    assert got, "support floor should leave some pairs at sf0.001+"
    for r in got[:20]:
        assert co[(r.item, r.rec)] == r.co
        ref_cos = r.co / math.sqrt(n_item[r.item] * n_item[r.rec])
        assert abs(r.cosine - ref_cos) < 1e-6


def test_mase_matches_reference(spark):
    """#388: MASE recomputed from the zero-completed grid."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    mn = min(r.d for r in ev)
    mx = max(r.d for r in ev)
    cnt = {(r.event_type, r.d): r.x for r in ev}
    got = {r.event_type: r for r in _rows(spark, "q_forecast_mase")}
    for et in sorted({r.event_type for r in ev}):
        xs = [cnt.get((et, d), 0) for d in range(mn, mx + 1)]
        ae1 = sum(abs(xs[t] - xs[t - 1]) for t in range(7, len(xs)))
        ae7 = sum(abs(xs[t] - xs[t - 7]) for t in range(7, len(xs)))
        m = len(xs) - 7
        g = got[et]
        assert g.n_scored == m
        assert abs(g.mase_lag1 - ae1 / ae7) < 1e-6
        assert g.lag1_beats_seasonal == int(ae1 < ae7)


# ---------------------------------------------------------------------------
# Wave-4 references (#394-#395)
# ---------------------------------------------------------------------------


def test_bayesian_ab_matches_lgamma_reference(spark):
    """#394: P(B>A) recomputed with math.lgamma Beta functions."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("c")
        )
        .collect()
    )
    ca = sum(r.c for r in ev if r.user_id % 2 == 0)
    na = sum(1 for r in ev if r.user_id % 2 == 0)
    cb = sum(r.c for r in ev if r.user_id % 2 == 1)
    nb_ = sum(1 for r in ev if r.user_id % 2 == 1)
    aa, ba = ca + 1, na - ca + 1
    ab, bb = cb + 1, nb_ - cb + 1

    def lbeta(x, y):
        return math.lgamma(x) + math.lgamma(y) - math.lgamma(x + y)

    p_ref = sum(
        math.exp(
            lbeta(aa + i, ba + bb)
            - math.log(bb + i)
            - lbeta(1 + i, bb)
            - lbeta(aa, ba)
        )
        for i in range(ab)
    )
    got = _rows(spark, "q_bayesian_ab")[0]
    assert got.conv_a == ca and got.n_a == na
    assert got.conv_b == cb and got.n_b == nb_
    assert abs(got.p_b_beats_a - p_ref) < 1e-7
    assert got.ship_b == int(p_ref >= 0.95)
    # sanity: a Beta-posterior P(B>A) is a probability
    assert 0.0 <= got.p_b_beats_a <= 1.0


def test_doubly_robust_matches_reference(spark):
    """#395: AIPW recomputed per-user in pure Python (the engines
    compute it on collapsed cells — this checks the collapse)."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("y"),
        )
        .collect()
    )
    users = [
        (r.user_id % 2, min(r.cnt // 20, 4), r.y) for r in ev
    ]
    from collections import defaultdict

    cn = defaultdict(int)
    cs = defaultdict(int)
    for tr, xb, y in users:
        cn[(xb, tr)] += 1
        cs[(xb, tr)] += y

    def ols(tr):
        pts = [(xb, cs[(xb, t)], cn[(xb, t)]) for (xb, t) in cn if t == tr]
        sn = sum(n for _, _, n in pts)
        sxn = sum(xb * n for xb, _, n in pts)
        sxxn = sum(xb * xb * n for xb, _, n in pts)
        sy = sum(s for _, s, _ in pts)
        sxy = sum(xb * s for xb, s, _ in pts)
        b = (sxy - sxn * sy / sn) / (sxxn - sxn * sxn / sn)
        a = sy / sn - b * (sxn / sn)
        return a, b

    a1, b1 = ols(1)
    a0, b0 = ols(0)
    e = {}
    for xb in {x for (x, _) in cn}:
        n1 = cn.get((xb, 1), 0)
        n0 = cn.get((xb, 0), 0)
        e[xb] = n1 / (n1 + n0)
    s = 0.0
    for tr, xb, y in users:
        mu1 = a1 + b1 * xb
        mu0 = a0 + b0 * xb
        s += mu1 - mu0
        if tr == 1:
            s += (y - mu1) / e[xb]
        else:
            s -= (y - mu0) / (1 - e[xb])
    ate_ref = s / len(users) / 100
    got = _rows(spark, "q_doubly_robust_ate")[0]
    assert got.n_users == len(users)
    assert abs(got.ate_dr - ate_ref) < 1e-6
    y1 = [y for tr, _, y in users if tr == 1]
    y0 = [y for tr, _, y in users if tr == 0]
    naive_ref = (sum(y1) / len(y1) - sum(y0) / len(y0)) / 100
    assert abs(got.ate_naive - naive_ref) < 1e-6


# ---------------------------------------------------------------------------
# Wave-5 references (#396-#397)
# ---------------------------------------------------------------------------


def _series_by_type(spark):
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    mn = min(r.d for r in ev)
    mx = max(r.d for r in ev)
    cnt = {(r.event_type, r.d): r.x for r in ev}
    return {
        et: [cnt.get((et, d), 0) for d in range(mn, mx + 1)]
        for et in sorted({r.event_type for r in ev})
    }


def test_binseg_matches_sse_scan_reference(spark):
    """#396: the argmax split recomputed by an explicit per-split SSE
    evaluation (not the prefix-sum identity the engines share)."""
    got = {r.event_type: r for r in _rows(spark, "q_binseg_changepoint")}
    for et, xs in _series_by_type(spark).items():
        n = len(xs)

        def sse(seg):
            m = sum(seg) / len(seg)
            return sum((v - m) ** 2 for v in seg)

        total = sse(xs)
        best_t, best_gain = None, -1.0
        for t in range(n - 1):
            gain = total - sse(xs[: t + 1]) - sse(xs[t + 1 :])
            if gain > best_gain + 1e-9:
                best_t, best_gain = t, gain
        g = got[et]
        assert g.split_t == best_t, (et, g.split_t, best_t)
        assert abs(g.sse_gain - best_gain) < 1e-6
        assert abs(g.mean_left - sum(xs[: best_t + 1]) / (best_t + 1)) < 1e-6


def test_ransac_matches_hash_sampling_reference(spark):
    """#397: candidate sampling, scoring, and selection recomputed
    with hashlib."""
    got = {r.event_type: r for r in _rows(spark, "q_ransac_line")}
    for et, xs in _series_by_type(spark).items():
        n = len(xs)
        best = None
        for c in range(16):
            h = hashlib.md5(f"ransac:{et}:{c}".encode()).hexdigest()
            i1 = int(h[:13], 16) % n
            i2r = int(h[13:26], 16) % (n - 1)
            t2 = i2r + (1 if i2r >= i1 else 0)
            b = (xs[t2] - xs[i1]) / (t2 - i1)
            a = xs[i1] - b * i1
            n_in = sum(1 for t, y in enumerate(xs) if abs(y - (a + b * t)) <= 3.0)
            key = (-n_in, c)
            if best is None or key < best[0]:
                best = (key, c, a, b, n_in)
        _, c, a, b, n_in = best
        g = got[et]
        assert g.best_candidate == c, (et, g.best_candidate, c)
        assert g.n_inliers == n_in
        assert abs(g.slope - b) < 1e-6 and abs(g.intercept - a) < 1e-6


def test_gmm_em_matches_python_reference(spark):
    """#398: the full 4-round EM replayed in pure Python from the raw
    per-user census (independent of both engines' cell algebra)."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    from collections import Counter

    cen = sorted(Counter(r.x for r in ev).items())
    nn = sum(f for _, f in cen)
    sx = sum(f * x for x, f in cen)
    sxx = sum(f * x * x for x, f in cen)
    cum = 0
    p25 = p75 = None
    for x, f in cen:
        cum += f
        if p25 is None and cum * 4 >= nn:
            p25 = x
        if p75 is None and cum * 4 >= 3 * nn:
            p75 = x
    s0 = ((sxx / nn) - (sx / nn) ** 2) ** 0.5
    w, m1, s1, m2, s2 = 0.5, float(p25), s0, float(p75), s0
    for _ in range(4):
        sw1 = sx1 = sxx1 = sw2 = sx2 = sxx2 = 0.0
        for x, f in cen:
            g1 = (w / s1) * math.exp(-0.5 * ((x - m1) / s1) ** 2)
            g2 = ((1 - w) / s2) * math.exp(-0.5 * ((x - m2) / s2) ** 2)
            r1 = g1 / (g1 + g2)
            sw1 += f * r1
            sx1 += f * r1 * x
            sxx1 += f * r1 * x * x
            sw2 += f * (1 - r1)
            sx2 += f * (1 - r1) * x
            sxx2 += f * (1 - r1) * x * x
        w = sw1 / nn
        m1, s1 = sx1 / sw1, (sxx1 / sw1 - (sx1 / sw1) ** 2) ** 0.5
        m2, s2 = sx2 / sw2, (sxx2 / sw2 - (sx2 / sw2) ** 2) ** 0.5
    sc = sum(
        f
        * math.log(
            (w / s1) * math.exp(-0.5 * ((x - m1) / s1) ** 2)
            + ((1 - w) / s2) * math.exp(-0.5 * ((x - m2) / s2) ** 2)
        )
        for x, f in cen
    )
    got = _rows(spark, "q_gmm_em")[0]
    assert got.n_users == nn
    assert abs(got.w1 - w) < 1e-6
    assert abs(got.mu1 - m1) < 1e-6 and abs(got.sigma1 - s1) < 1e-6
    assert abs(got.mu2 - m2) < 1e-6 and abs(got.sigma2 - s2) < 1e-6
    assert abs(got.avg_logdensity - sc / nn) < 1e-6
    # the two regimes must be ordered and distinct on this fixture
    assert got.mu1 < got.mu2


def test_stream_page_hinkley_matches_unquantized_reference(spark):
    """#399: alarms recomputed with an UNQUANTIZED pure-Python PH —
    the nano-unit quantization must not change which events alarm
    (tolerance margin) and ph values agree to 1e-6."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    from collections import defaultdict

    seqs = defaultdict(list)
    for r in ev:
        seqs[r.user_id].append((r.ts, r.event_id, r.value))
    ref = {}
    for uid, rows in seqs.items():
        rows.sort()
        n = s = 0
        m = mmin = 0.0
        for _, ev_id, val in rows:
            c = int(math.floor(val * 100 + 0.5))
            n, s = n + 1, s + c
            m += (c - s / n) - 10.0
            mmin = min(mmin, m)
            if m - mmin >= 40000.0:
                ref[uid] = (ev_id, n, m - mmin)
                break
    got = {r.user_id: r for r in _rows(spark, "q_stream_page_hinkley")}
    assert set(got) == set(ref)
    for uid, (ev_id, n, ph) in ref.items():
        g = got[uid]
        assert g.event_id == ev_id and g.n_seen == n
        assert abs(g.ph - ph) < 1e-5


def test_mantel_haenszel_matches_reference(spark):
    """#400: CMH chi2 and OR_MH recomputed from raw per-user strata."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("np"),
        )
        .collect()
    )
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0, 0, 0])  # a, b, c, d
    for r in ev:
        tr = r.user_id % 2
        xb = min(r.cnt // 20, 4)
        y = int(5 * r.np > r.cnt)
        idx = (0 if y else 1) if tr == 1 else (2 if y else 3)
        cells[xb][idx] += 1
    sa = se = sv = sad = sbc = 0.0
    k = nu = 0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        if n < 2:
            continue
        k += 1
        nu += n
        sa += a
        se += (a + b) * (a + c) / n
        sv += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        sad += a * d / n
        sbc += b * c / n
    chi = (abs(sa - se) - 0.5) ** 2 / sv
    got = _rows(spark, "q_mantel_haenszel")[0]
    assert got.n_strata == k and got.n_users == nu
    assert abs(got.cmh_chi2 - chi) < 1e-6
    assert abs(got.or_mh - sad / sbc) < 1e-6
    assert got.significant == int(chi > 3.841458820694124)


def test_hmm_forward_matches_python_reference(spark):
    """#401: the forward recursion replayed in pure Python with
    math.lgamma emissions (no Stirling, no per-step quantization) —
    agreement to 1e-5 proves the quantized engine chain tracks the
    true forward likelihood."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    mn = min(r.d for r in ev)
    mx = max(r.d for r in ev)
    cnt = {(r.event_type, r.d): r.x for r in ev}
    got = {r.event_type: r for r in _rows(spark, "q_hmm_forward")}
    ln_stay, ln_switch = math.log(0.9), math.log(0.1)
    for et in sorted({r.event_type for r in ev}):
        xs = [cnt.get((et, d), 0) for d in range(mn, mx + 1)]
        m = len(xs)
        srt = sorted(range(m), key=lambda i: (xs[i], i))
        p25 = xs[srt[math.ceil(m / 4.0) - 1]]
        p75 = xs[srt[math.ceil(3 * m / 4.0) - 1]]
        mu1, mu2 = p25 + 0.5, p75 + 0.5

        def logpmf(x, mu):
            return x * math.log(mu) - mu - math.lgamma(x + 1)

        def lse(a, b):
            hi = max(a, b)
            return hi + math.log1p(math.exp(-abs(a - b)))

        la1 = math.log(0.5) + logpmf(xs[0], mu1)
        la2 = math.log(0.5) + logpmf(xs[0], mu2)
        for x in xs[1:]:
            n1 = logpmf(x, mu1) + lse(la1 + ln_stay, la2 + ln_switch)
            n2 = logpmf(x, mu2) + lse(la1 + ln_switch, la2 + ln_stay)
            la1, la2 = n1, n2
        ll = lse(la1, la2)
        g = got[et]
        assert g.mu_low == mu1 and g.mu_high == mu2
        assert abs(g.loglik - ll) < 1e-5, (et, g.loglik, ll)
        assert abs(g.p_high_final - math.exp(la2 - ll)) < 1e-6
