"""Round-9 waves 6-13 independent-reference tests (SURVEY.md §5.4).

Every statistic added in waves 6-13 (#443-#486) is recomputed here by
a pure-Python/numpy implementation taking a DIFFERENT derivation
route than the engine pair: dense numpy matrices instead of edge
joins (HITS, IPF), brute adjacency-set intersections instead of
oriented wedge joins (local clustering), real np.cos/np.sin instead
of the algebraic CASE tables (periodogram), np.lstsq instead of the
closed-form moment OLS (Durbin-Watson), and raw-float textbook
formulas instead of integer limb algebra (Jarque-Bera, Theil,
James-Stein, Gumbel, Slope One, price indices, Ochiai) — so a
formula error mirrored into the oracle cannot hide.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from tests.conftest import SF_SMOKE
from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.registry import REGISTRY


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF_SMOKE).collect()


def _trade_edges(spark):
    """Nation trade edges (cust nation -> supp nation, lineitem count)."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    supp = load_table(spark, SF_SMOKE, "supplier")
    rows = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select("c_nationkey", "s_nationkey")
        .collect()
    )
    w = Counter((r.c_nationkey, r.s_nationkey) for r in rows)
    return w


def test_hits_matrix_power_iteration(spark):
    """#443 via a dense numpy adjacency matrix: 4 rounds of h = W a /
    max, a = W'h / max (with the same per-round 1e-12 re-quantize)
    must reproduce the engine's hub/authority vectors."""
    w = _trade_edges(spark)
    srcs = sorted({s for s, _ in w})
    dsts = sorted({d for _, d in w})
    W = np.zeros((len(srcs), len(dsts)))
    for (s, d), c in w.items():
        W[srcs.index(s), dsts.index(d)] = c
    h = np.ones(len(srcs))
    for _ in range(4):
        a = W.T @ h
        a = np.floor(a / a.max() * 1e12 + 0.5) / 1e12
        h = W @ a
        h = np.floor(h / h.max() * 1e12 + 0.5) / 1e12
    got = _rows(spark, "q_hits_scores")
    hub = {r.node: r.score for r in got if r.side == "hub"}
    auth = {r.node: r.score for r in got if r.side == "authority"}
    for i, s in enumerate(srcs):
        assert abs(hub[s] - h[i]) < 1e-9
    for i, d in enumerate(dsts):
        assert abs(auth[d] - a[i]) < 1e-9


def _copurchase_adj(spark):
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    pair_counts = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_counts[(ps[i], ps[j])] += 1
    adj = defaultdict(set)
    for (u, v), c in pair_counts.items():
        if c >= 2:
            adj[u].add(v)
            adj[v].add(u)
    return adj, by_order


def test_local_clustering_matches_set_intersections(spark):
    """#444 via brute adjacency-set intersections: per-node triangle
    counts t(v) = half the sum of |N(v) ∩ N(u)| over neighbors, then
    the same decile census."""
    adj, _ = _copurchase_adj(spark)
    census = defaultdict(lambda: [0, 0, []])
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        t = sum(len(adj[u] & nb) for u in nb) // 2
        lcc = 2.0 * t / (d * (d - 1))
        dec = min(int(lcc * 10), 9)
        census[dec][0] += 1
        census[dec][1] += t
        census[dec][2].append(lcc)
    got = {r.decile: r for r in _rows(spark, "q_local_clustering")}
    assert set(got) == set(census)
    for dec, (n, t, lccs) in census.items():
        assert got[dec].n_nodes == n
        assert got[dec].n_tri_incidences == t
        assert abs(got[dec].mean_lcc - sum(lccs) / len(lccs)) < 1e-9


def test_theil_decomposition_from_raw_floats(spark):
    """#445 via raw-float Theil over nation revenue cells, checking
    T_total, T_between + T_within additivity against the engine."""
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    nation = load_table(spark, SF_SMOKE, "nation")
    rows = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select("n_regionkey", "n_nationkey", "o_totalprice")
        .collect()
    )
    cells = defaultdict(float)
    regions = defaultdict(list)
    for r in rows:
        cells[(r.n_regionkey, r.n_nationkey)] += math.floor(
            r.o_totalprice * 100 + 0.5
        )
    for (reg, g), x in cells.items():
        regions[reg].append(x)
    xt = sum(cells.values())
    ng = len(cells)
    t_total = sum(x / xt * math.log(x / xt * ng) for x in cells.values())
    t_between = sum(
        sum(xs) / xt * math.log(sum(xs) / xt * ng / len(xs))
        for xs in regions.values()
    )
    t_within = sum(
        sum(xs) / xt * sum(x / sum(xs) * math.log(x / sum(xs) * len(xs)) for x in xs)
        for xs in regions.values()
    )
    got = _rows(spark, "q_theil_inequality")[0]
    assert got.n_nations == ng
    assert abs(got.t_total - t_total) < 1e-9
    assert abs(got.t_between - t_between) < 1e-9
    assert abs(got.t_within - t_within) < 1e-9
    assert abs(got.additivity_gap) < 1e-8
    assert abs(t_total - (t_between + t_within)) < 1e-12


def test_jarque_bera_matches_numpy_moments(spark):
    """#446 via numpy central moments on the raw dollar array."""
    x = np.array(
        [
            math.floor(r.o_totalprice + 0.5)
            for r in load_table(spark, SF_SMOKE, "orders").collect()
        ],
        dtype=float,
    )
    n = len(x)
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    m4 = ((x - m) ** 4).mean()
    skew = m3 / m2**1.5
    exk = m4 / m2**2 - 3
    jb = n / 6 * (skew**2 + exk**2 / 4)
    got = _rows(spark, "q_jarque_bera")[0]
    assert got.n == n
    assert abs(got.skewness - skew) < 1e-6 * max(1.0, abs(skew))
    assert abs(got.excess_kurtosis - exk) < 1e-6 * max(1.0, abs(exk))
    assert abs(got.jb_stat - jb) < 1e-5 * max(1.0, abs(jb))
    assert got.reject_normal_5pct == (jb > 5.991)


def test_durbin_watson_matches_lstsq(spark):
    """#447 via np.linalg.lstsq on the day census, with the same
    whole-dollar residual quantize."""
    from pyspark.sql import functions as F

    rows = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy(F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") + 0.5).cast("bigint")).alias("y")
        )
        .collect()
    )
    ys = np.array([r.y for r in sorted(rows, key=lambda r: r.d)], dtype=float)
    t = np.arange(len(ys), dtype=float)
    A = np.vstack([np.ones_like(t), t]).T
    (a, b), *_ = np.linalg.lstsq(A, ys, rcond=None)
    eq = np.floor(ys - (a + b * t) + 0.5)
    dw = np.sum(np.diff(eq) ** 2) / np.sum(eq**2)
    got = _rows(spark, "q_durbin_watson")[0]
    assert got.n_days == len(ys)
    assert abs(got.intercept - a) < 1e-4 * max(1.0, abs(a))
    assert abs(got.slope - b) < 1e-4 * max(1.0, abs(b))
    assert abs(got.dw_stat - dw) < 1e-6


def test_james_stein_shrinks_toward_grand_mean(spark):
    """#448 via raw-float cell means: weights in [0,1], big cells
    shrink less, and the estimator matches the closed form."""
    rows = load_table(spark, SF_SMOKE, "customer").collect()
    cells = defaultdict(list)
    for r in rows:
        cells[r.c_nationkey].append(math.floor(r.c_acctbal * 100 + 0.5))
    k = len(cells)
    n = sum(len(v) for v in cells.values())
    grand = sum(sum(v) for v in cells.values()) / n
    s2 = sum(
        sum(x**2 for x in v) - sum(v) ** 2 / len(v) for v in cells.values()
    ) / (n - k)
    ssd = sum((sum(v) / len(v) - grand) ** 2 for v in cells.values())
    got = {r.nationkey: r for r in _rows(spark, "q_james_stein")}
    assert set(got) == set(cells)
    for g, v in cells.items():
        mean_i = sum(v) / len(v)
        w = max(0.0, 1 - (k - 3) * (s2 / len(v)) / ssd)
        js = grand + w * (mean_i - grand)
        assert 0.0 <= got[g].shrink_weight <= 1.0
        assert abs(got[g].raw_mean - mean_i / 100) < 1e-6
        assert abs(got[g].shrink_weight - w) < 1e-6
        assert abs(got[g].js_mean - js / 100) < 1e-4
        # shrunk mean lies between raw mean and grand mean
        lo, hi = sorted((mean_i / 100, grand / 100))
        assert lo - 1e-9 <= got[g].js_mean <= hi + 1e-9


def test_raking_ipf_converges_to_uniform_margins(spark):
    """#449 via dense numpy IPF without per-step rounding: cell match
    within quantization drift, and both raked margins ≈ 0.2."""
    cust = load_table(spark, SF_SMOKE, "customer")
    nation = load_table(spark, SF_SMOKE, "nation")
    rows = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .select("n_regionkey", "c_mktsegment")
        .collect()
    )
    counts = Counter((r.n_regionkey, r.c_mktsegment) for r in rows)
    rs = sorted({r for r, _ in counts})
    segs = sorted({s for _, s in counts})
    M = np.array(
        [[counts.get((r, s), 0) for s in segs] for r in rs], dtype=float
    )
    M /= M.sum()
    for _ in range(6):
        M *= 0.2 / M.sum(axis=1, keepdims=True)
        M *= 0.2 / M.sum(axis=0, keepdims=True)
    got = {(r.r, r.seg): r for r in _rows(spark, "q_raking_ipf")}
    for i, reg in enumerate(rs):
        for j, s in enumerate(segs):
            assert abs(got[(reg, s)].raked_share - M[i, j]) < 1e-8
    raked = np.array(
        [[got[(reg, s)].raked_share for s in segs] for reg in rs]
    )
    assert np.allclose(raked.sum(axis=0), 0.2, atol=1e-6)


def test_price_index_fisher_brackets(spark):
    """#450 via brute dicts: index values match, and Fisher lies
    between Laspeyres and Paasche (geometric-mean property)."""
    rows = load_table(spark, SF_SMOKE, "lineitem").collect()
    per = defaultdict(lambda: [0, 0])  # (pk, y) -> [rev_cents, qty]
    for r in rows:
        key = (r.l_partkey, r.l_shipdate.year)
        per[key][0] += math.floor(r.l_extendedprice * 100 + 0.5)
        per[key][1] += math.floor(r.l_quantity + 0.5)
    got = {r.y0: r for r in _rows(spark, "q_price_index")}
    years = sorted({y for _, y in per})
    for y0 in years[:-1]:
        y1 = y0 + 1
        ln = ld = pn = pd_ = 0.0
        npairs = 0
        for (pk, y), (rev, q) in per.items():
            if y != y0 or q <= 0:
                continue
            o = per.get((pk, y1))
            if not o or o[1] <= 0:
                continue
            p0, p1 = rev / q / 100, o[0] / o[1] / 100
            q0, q1 = q, o[1]
            ln += p1 * q0
            ld += p0 * q0
            pn += p1 * q1
            pd_ += p0 * q1
            npairs += 1
        if npairs == 0:
            assert y0 not in got
            continue
        g = got[y0]
        assert g.n_parts == npairs
        assert abs(g.laspeyres - ln / ld) < 1e-6
        assert abs(g.paasche - pn / pd_) < 1e-6
        lo, hi = sorted((g.laspeyres, g.paasche))
        assert lo - 1e-9 <= g.fisher <= hi + 1e-9


def test_periodogram_matches_real_trig(spark):
    """#451 via np.cos/np.sin (real trig, not the algebraic tables):
    per-period powers agree, shares sum to 1, entropy ≤ ln(5)."""
    from pyspark.sql import functions as F

    rows = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"))
        .agg(F.count(F.lit(1)).alias("y"))
        .collect()
    )
    ys = np.array([r.y for r in sorted(rows, key=lambda r: r.d)], dtype=float)
    t = np.arange(len(ys))
    got = {r.period: r for r in _rows(spark, "q_periodogram")}
    powers = {}
    for p in (2, 3, 5, 6, 10):
        ang = 2 * np.pi * (t % p) / p
        c = float(np.sum(ys * np.cos(ang)))
        s = float(np.sum(ys * np.sin(ang)))
        powers[p] = c * c + s * s
    tot = sum(powers.values())
    for p, pw in powers.items():
        assert abs(got[p].power - pw) < 1e-4 * max(1.0, pw)
        assert abs(got[p].share - pw / tot) < 1e-8
    assert abs(sum(r.share for r in got.values()) - 1.0) < 1e-9
    h = got[2].spectral_entropy
    assert 0.0 <= h <= math.log(5) + 1e-9
    href = -sum(
        pw / tot * math.log(pw / tot) for pw in powers.values() if pw > 0
    )
    assert abs(h - href) < 1e-6


def test_gumbel_fit_matches_numpy(spark):
    """#452 via pandas-free numpy block maxima and textbook MoM."""
    from pyspark.sql import functions as F

    rows = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
            F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("d"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") + 0.5).cast("bigint")).alias("y")
        )
        .collect()
    )
    blocks = defaultdict(int)
    for r in rows:
        blocks[r.ym] = max(blocks[r.ym], r.y)
    mx = np.array(sorted(blocks.values()), dtype=float)
    m1 = mx.mean()
    s = mx.std(ddof=1)
    beta = s * math.sqrt(6) / math.pi
    mu = m1 - 0.5772156649015329 * beta
    thr = 2 * (int(mx.sum()) // len(mx))
    p = 1 - math.exp(-math.exp(-((thr - mu) / beta)))
    r20 = mu - beta * math.log(-math.log(1 - 1 / 20))
    got = _rows(spark, "q_gumbel_maxima")[0]
    assert got.n_blocks == len(mx)
    assert got.threshold == thr
    assert got.max_observed == int(mx.max())
    assert abs(got.mu - mu) < 1e-4 * max(1.0, abs(mu))
    assert abs(got.beta - beta) < 1e-4 * max(1.0, abs(beta))
    assert abs(got.p_exceed_threshold - p) < 1e-7
    assert abs(got.return_level_20 - r20) < 1e-3 * max(1.0, abs(r20))


def test_slope_one_matches_brute_dicts(spark):
    """#453 via brute dict weighted Slope One without quantization."""
    rows = load_table(spark, SF_SMOKE, "events").collect()
    r = Counter()
    for e in rows:
        r[(e.user_id, e.event_type)] += 1
    users = defaultdict(dict)
    for (u, i), x in r.items():
        users[u][i] = x
    dev = defaultdict(lambda: [0, 0])  # (i, j) -> [n, sum(ri - rj)]
    for u, items in users.items():
        for i in items:
            for j in items:
                if i == j:
                    continue
                dev[(i, j)][0] += 1
                dev[(i, j)][1] += items[i] - items[j]
    errs = defaultdict(list)
    for u, items in users.items():
        for i in items:
            num = den = 0.0
            for j in items:
                if j == i or (i, j) not in dev:
                    continue
                n_ij, sd = dev[(i, j)]
                num += (items[j] + sd / n_ij) * n_ij
                den += n_ij
            if den > 0:
                errs[i].append(num / den - items[i])
    got = {r_.item: r_ for r_ in _rows(spark, "q_slope_one")}
    assert set(got) == set(errs)
    for i, es in errs.items():
        assert got[i].n_users == len(es)
        assert abs(got[i].mae - sum(abs(e) for e in es) / len(es)) < 1e-6
        assert abs(got[i].bias - sum(es) / len(es)) < 1e-6


def test_bipartite_ochiai_matches_brute_topk(spark):
    """#454 via brute pair counts: identical top-20 identity and
    scores, each score ≤ 1 and ≥ the support-based lower bound."""
    adj_pairs = Counter()
    deg = Counter()
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
        deg[r.l_partkey] += 1
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                adj_pairs[(ps[i], ps[j])] += 1
    scored = [
        (
            round(c / math.sqrt(deg[u] * deg[v]), 12),
            u,
            v,
            c,
        )
        for (u, v), c in adj_pairs.items()
        if c >= 2
    ]
    scored.sort(key=lambda x: (-x[0], x[1], x[2]))
    got = _rows(spark, "q_bipartite_ochiai")
    assert len(got) == min(20, len(scored))
    for row, (score, u, v, c) in zip(got, scored):
        assert (row.u, row.v, row.c) == (u, v, c)
        assert abs(row.ochiai - score) < 1e-12
        assert row.ochiai <= 1.0 + 1e-12


# ---------------------------------------------------------------------------
# Wave 8 (#455-#462)
# ---------------------------------------------------------------------------


def _daily_dollars(spark):
    from pyspark.sql import functions as F

    rows = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy(F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") + 0.5).cast("bigint")).alias("y")
        )
        .collect()
    )
    return np.array(
        [r.y for r in sorted(rows, key=lambda r: r.d)], dtype=float
    ), sorted(r.d for r in rows)


def test_yule_k_matches_brute_counter(spark):
    """#455 via brute per-language token Counters."""
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    per_lang = defaultdict(Counter)
    for r in docs:
        for w in r.text.split(" "):
            if w:
                per_lang[r.lang][w] += 1
    got = {r.lang: r for r in _rows(spark, "q_yule_k")}
    assert set(got) == set(per_lang)
    for lang, cnt in per_lang.items():
        n = sum(cnt.values())
        v = len(cnt)
        s2 = sum(f * f for f in cnt.values())
        assert got[lang].n_tokens == n
        assert got[lang].vocab == v
        assert abs(got[lang].yule_k - 1e4 * (s2 - n) / n**2) < 1e-6
        assert abs(got[lang].simpson_d - (s2 - n) / (n * (n - 1))) < 1e-9
        assert abs(got[lang].herdan_c - math.log(v) / math.log(n)) < 1e-9


def test_chow_break_matches_lstsq(spark):
    """#456 via three np.lstsq fits (pooled + two halves)."""
    ys, _ = _daily_dollars(spark)
    t = np.arange(len(ys), dtype=float)

    def sse(tt, yy):
        A = np.vstack([np.ones_like(tt), tt]).T
        coef, *_ = np.linalg.lstsq(A, yy, rcond=None)
        return float(np.sum((yy - A @ coef) ** 2))

    n = len(ys)
    half = (n + 1) // 2  # t*2 < n  <=>  t < n/2
    sse_p = sse(t, ys)
    sse_a = sse(t[:half], ys[:half])
    sse_b = sse(t[half:], ys[half:])
    f = ((sse_p - sse_a - sse_b) / 2) / ((sse_a + sse_b) / (n - 4))
    got = _rows(spark, "q_chow_break")[0]
    assert got.n_days == n
    assert abs(got.sse_pooled - sse_p) < 1e-3 * max(1.0, sse_p)
    assert abs(got.sse_split - (sse_a + sse_b)) < 1e-3 * max(1.0, sse_a + sse_b)
    assert abs(got.f_chow - f) < 1e-5 * max(1.0, abs(f))


def test_cooks_distance_matches_textbook(spark):
    """#457 via the textbook leverage/residual formulas with exact
    floats (no quantization), matching the elected top-10."""
    ys, days = _daily_dollars(spark)
    t = np.arange(len(ys), dtype=float)
    n = len(ys)
    A = np.vstack([np.ones_like(t), t]).T
    (a, b), *_ = np.linalg.lstsq(A, ys, rcond=None)
    e = ys - (a + b * t)
    h = 1 / n + (t - t.mean()) ** 2 / np.sum((t - t.mean()) ** 2)
    s2 = np.sum(np.floor(e * e + 0.5)) / (n - 2)
    d = e * e * h / (2 * s2 * (1 - h) ** 2)
    order = sorted(range(n), key=lambda i: (-round(d[i], 12), days[i]))[:10]
    got = _rows(spark, "q_cooks_distance")
    assert [r.d for r in got] == [days[i] for i in order]
    for r, i in zip(got, order):
        assert abs(r.cooks_d - d[i]) < 1e-6 * max(1.0, d[i])
    assert got[0].n_influential == int(np.sum(d > 4.0 / n))


def test_grubbs_matches_numpy(spark):
    """#458 via numpy mean/std and argmax."""
    ys, days = _daily_dollars(spark)
    m, s = ys.mean(), ys.std(ddof=1)
    dev = np.abs(ys - m)
    i = int(np.argmax(dev))
    got = _rows(spark, "q_grubbs_outlier")[0]
    assert got.n_days == len(ys)
    assert got.outlier_day == days[i]
    assert got.outlier_value == int(ys[i])
    assert abs(got.g_stat - dev[i] / s) < 1e-7
    assert got.outlier_flag == (dev[i] / s > 4.0)


def test_kupiec_matches_math(spark):
    """#459 via numpy rank election and the textbook LR."""
    ys, _ = _daily_dollars(spark)
    n = len(ys)
    k = max(n * 5 // 100, 1)
    var95 = float(np.sort(ys)[k - 1])
    x = int(np.sum(ys < var95))
    if x == 0:
        lr = -2 * n * math.log(0.95)
    else:
        lr = -2 * (
            (n - x) * math.log(0.95)
            + x * math.log(0.05)
            - (n - x) * math.log(1 - x / n)
            - x * math.log(x / n)
        )
    got = _rows(spark, "q_kupiec_pof")[0]
    assert got.n_days == n
    assert got.var_95 == int(var95)
    assert got.n_exceptions == x
    assert abs(got.lr_pof - lr) < 1e-7
    assert got.reject_var_model == (lr > 3.841)


def test_rich_club_matches_brute(spark):
    """#460 via brute degree/edge filtering per grid cut."""
    adj, _ = _copurchase_adj(spark)
    edges = {
        (u, v) for u, nb in adj.items() for v in nb if u < v
    }
    deg = {u: len(nb) for u, nb in adj.items()}
    got = {r.k: r for r in _rows(spark, "q_rich_club")}
    for k in (1, 2, 4, 8, 16):
        nodes = [u for u, d in deg.items() if d > k]
        ek = sum(1 for (u, v) in edges if deg[u] > k and deg[v] > k)
        assert got[k].n_nodes == len(nodes)
        assert got[k].n_edges == ek
        if len(nodes) >= 2:
            phi = 2 * ek / (len(nodes) * (len(nodes) - 1))
            assert abs(got[k].phi - phi) < 1e-9
        else:
            assert got[k].phi is None


def test_degree_powerlaw_matches_per_node_sum(spark):
    """#461 via the per-NODE log sum (not the degree census route)."""
    adj, _ = _copurchase_adj(spark)
    deg = [len(nb) for nb in adj.values()]
    n = len(deg)
    alpha = 1 + n / sum(math.log(2 * d) for d in deg)
    got = _rows(spark, "q_degree_powerlaw")[0]
    assert got.n_nodes == n
    assert got.dmax == max(deg)
    assert abs(got.mean_degree - sum(deg) / n) < 1e-9
    assert abs(got.alpha - alpha) < 1e-6
    assert got.alpha > 1.0


def test_average_precision_matches_brute_sweep(spark):
    """#462 via a brute float threshold sweep over the same scored
    frame, plus the prevalence floor property."""
    from zmaxion_spark.queries.governance_q import q_quality_classifier

    docs = {
        r.doc_id: r.lang
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    scored = [
        (1 if docs[r.doc_id] == "en" else 0, r.quality_score)
        for r in q_quality_classifier(spark, SF_SMOKE).collect()
    ]
    n_pos = sum(y for y, _ in scored)
    ap = 0.0
    prev_tp = 0
    for k in range(21):
        thr = 1.0 - k / 20
        tp = sum(1 for y, s in scored if s >= thr and y == 1)
        fp = sum(1 for y, s in scored if s >= thr and y == 0)
        if tp + fp > 0:
            ap += (tp - prev_tp) / n_pos * (tp / (tp + fp))
        prev_tp = tp
    got = _rows(spark, "q_average_precision")[0]
    assert got.n_pos == n_pos
    assert abs(got.average_precision - ap) < 1e-6
    assert abs(
        got.prevalence_baseline - n_pos / (got.n_pos + got.n_neg)
    ) < 1e-9


# ---------------------------------------------------------------------------
# Wave 9 (#463-#468)
# ---------------------------------------------------------------------------


def test_stream_hll_matches_pure_python(spark):
    """#463 via a pure-Python hashlib HLL (registers, integer harmonic
    denominator, linear-counting correction), plus a genuinely
    INDEPENDENT accuracy assertion against the exact distinct count —
    a mirrored formula error (round-9 advice: the rank +1 that made
    every estimate ~2x) passes a replica compare but cannot pass the
    exact-count bound."""
    import hashlib

    rows = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "user_id"
    ).collect()
    regs = defaultdict(dict)
    exact = defaultdict(set)
    for r in rows:
        exact[r.event_type].add(r.user_id)
        h = hashlib.md5(f"hll:{r.user_id}".encode()).hexdigest()
        j = int(h[:2], 16)
        # rank = leading zeros in the 52-bit field + 1 = 53 - bitlen(w)
        w = int(h[2:15], 16)
        rank = 53 if w == 0 else 53 - w.bit_length()
        regs[r.event_type][j] = max(regs[r.event_type].get(j, 0), rank)
    got = {r.event_type: r for r in _rows(spark, "q_stream_hll")}
    m = 256
    alpha = 0.7120912956726128
    for et, rg in regs.items():
        used = len(rg)
        v0 = m - used
        zu = sum(1 << (53 - mj) for mj in rg.values())
        e = alpha * m * m * float(1 << 53) / (zu + v0 * float(1 << 53))
        if e <= 2.5 * m and v0 > 0:
            e = m * math.log(m / v0)
        assert got[et].registers_used == used
        assert abs(got[et].hll_estimate - e) < 1e-5 * max(1.0, e)
        assert got[et].exact_distinct == len(exact[et])
        # Independent of any shared formula: the estimate itself must
        # land within the documented bound of the TRUE cardinality
        # (m=256 -> RSE ~6.5%; bound 0.25 ~ 4 sigma).
        rel_err = abs(got[et].hll_estimate - len(exact[et])) / len(exact[et])
        assert rel_err <= 0.25, (et, got[et].hll_estimate, len(exact[et]))
        assert got[et].est_within_bound == 1


def test_burrows_delta_matches_brute(spark):
    """#464 via brute dict z-scores over the same top-30 words."""
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    tok = defaultdict(Counter)
    for r in docs:
        for w in r.text.split(" "):
            if w:
                tok[r.source][w] += 1
    totals = Counter()
    for cnt in tok.values():
        totals.update(cnt)
    top = [w for w, _ in sorted(totals.items(), key=lambda x: (-x[1], x[0]))[:30]]
    sources = sorted(tok)
    rf = {
        (s, w): tok[s][w] / sum(tok[s].values()) for s in sources for w in top
    }
    zs = {}
    for w in top:
        vals = [rf[(s, w)] for s in sources]
        mu = sum(vals) / len(vals)
        sd = math.sqrt(sum(v * v for v in vals) / len(vals) - mu * mu)
        if sd > 0:
            for s in sources:
                zs[(s, w)] = (rf[(s, w)] - mu) / sd
    words_used = {w for (_, w) in zs}
    deltas = {}
    for i, s1 in enumerate(sources):
        for s2 in sources[i + 1 :]:
            ds = [abs(zs[(s1, w)] - zs[(s2, w)]) for w in words_used]
            deltas[(s1, s2)] = sum(ds) / len(ds)
    expected = sorted(deltas.items(), key=lambda x: (round(x[1], 9), x[0]))[:10]
    got = _rows(spark, "q_burrows_delta")
    assert [(r.s1, r.s2) for r in got] == [p for p, _ in expected]
    for r, (_, dl) in zip(got, expected):
        assert abs(r.delta - dl) < 1e-7


def test_odds_ratio_matches_math(spark):
    """#465 via brute 2x2 counts and the Woolf formulas."""
    rows = load_table(spark, SF_SMOKE, "orders").collect()
    a = sum(
        1
        for r in rows
        if r.o_orderpriority == "1-URGENT" and r.o_orderstatus == "F"
    )
    b = sum(
        1
        for r in rows
        if r.o_orderpriority == "1-URGENT" and r.o_orderstatus != "F"
    )
    c = sum(
        1
        for r in rows
        if r.o_orderpriority != "1-URGENT" and r.o_orderstatus == "F"
    )
    d = len(rows) - a - b - c
    orr = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    lo = math.exp(math.log(orr) - 1.959964 * se)
    hi = math.exp(math.log(orr) + 1.959964 * se)
    got = _rows(spark, "q_odds_ratio")[0]
    assert (got.a, got.b, got.c, got.d) == (a, b, c, d)
    assert abs(got.odds_ratio - orr) < 1e-7
    assert abs(got.ci_lo - lo) < 1e-6
    assert abs(got.ci_hi - hi) < 1e-6
    assert got.ci_lo <= got.odds_ratio <= got.ci_hi
    assert got.significant == (lo > 1 or hi < 1)


def test_vocab_jaccard_matches_sets(spark):
    """#466 via brute Python set algebra."""
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    vocab = defaultdict(set)
    for r in docs:
        for w in r.text.split(" "):
            if w:
                vocab[r.source].add(w)
    sources = sorted(vocab)
    scored = []
    for i, s1 in enumerate(sources):
        for s2 in sources[i + 1 :]:
            inter = len(vocab[s1] & vocab[s2])
            if inter:
                jac = inter / len(vocab[s1] | vocab[s2])
                scored.append((round(jac, 12), s1, s2, inter))
    scored.sort(key=lambda x: (-x[0], x[1], x[2]))
    got = _rows(spark, "q_vocab_jaccard")
    assert len(got) == min(15, len(scored))
    for r, (jac, s1, s2, inter) in zip(got, scored):
        assert (r.s1, r.s2, r.n_common) == (s1, s2, inter)
        assert r.v1 == len(vocab[s1]) and r.v2 == len(vocab[s2])
        assert abs(r.jaccard - jac) < 1e-12


def test_gesd_matches_iterative_numpy(spark):
    """#467 via iterative numpy re-estimation (re-scan route, not the
    moment-subtraction route)."""
    ys, days = _daily_dollars(spark)
    pool = list(zip(days, ys))
    expected = []
    for rnd in range(1, 4):
        arr = np.array([y for _, y in pool])
        m, s = arr.mean(), arr.std(ddof=1)
        best = max(pool, key=lambda p: (abs(p[1] - m), p[0]))
        # tie-break on day ascending among equal deviations
        cand = [p for p in pool if abs(p[1] - m) == abs(best[1] - m)]
        best = min(cand, key=lambda p: p[0])
        expected.append((rnd, best[0], int(best[1]), abs(best[1] - m) / s))
        pool.remove(best)
    got = _rows(spark, "q_gesd_outliers")
    for r, (rnd, day, val, rstat) in zip(got, expected):
        assert (r.round, r.outlier_day, r.outlier_value) == (rnd, day, val)
        assert abs(r.r_stat - rstat) < 1e-7


def test_selection_stability_matches_brute_chi2(spark):
    """#468 via brute per-half chi2 dicts and set overlap."""
    import hashlib

    docs = load_table(spark, SF_SMOKE, "documents").collect()
    halves = defaultdict(list)
    for r in docs:
        h = int(hashlib.md5(f"split:{r.doc_id}".encode()).hexdigest()[:13], 16) % 2
        halves[h].append((1 if r.lang == "en" else 0, set(
            w for w in r.text.split(" ") if w
        )))
    tops = {}
    all_feats = set()
    for h, items in halves.items():
        n_pos = sum(y for y, _ in items)
        n_neg = len(items) - n_pos
        df = defaultdict(lambda: [0, 0])
        for y, ws in items:
            for w in ws:
                df[w][y] += 1
        chi = {}
        for w, (dneg, dpos) in df.items():
            n = n_pos + n_neg
            num = dpos * (n_neg - dneg) - dneg * (n_pos - dpos)
            den = (dpos + dneg) * (n - dpos - dneg) * n_pos * n_neg
            chi[w] = round(n * num * num / den, 9)
            all_feats.add(w)
        tops[h] = {
            w
            for w, _ in sorted(chi.items(), key=lambda x: (-x[1], x[0]))[:20]
        }
    overlap = len(tops[0] & tops[1])
    got = _rows(spark, "q_selection_stability")[0]
    assert got.k == 20
    assert got.n_features == len(all_feats)
    assert got.n_overlap == overlap
    assert abs(got.jaccard_stability - overlap / (40 - overlap)) < 1e-9


# ---------------------------------------------------------------------------
# Wave 10 (#469-#474)
# ---------------------------------------------------------------------------


def _daily_demand(spark):
    from pyspark.sql import functions as F

    rows = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy(F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("d"))
        .agg(F.count(F.lit(1)).alias("dem"))
        .collect()
    )
    return [r.dem for r in rows]


def test_newsvendor_matches_brute(spark):
    """#469 via a brute sorted-list quantile and per-q cost loop;
    also checks q* actually minimizes cost on the grid."""
    dem = sorted(_daily_demand(spark))
    n = len(dem)
    # smallest q with F(q) >= 3/4
    import bisect

    qstar = next(q for q in dem if bisect.bisect_right(dem, q) * 4 >= n * 3)

    def cost(q):
        return sum(3 * max(d - q, 0) + 1 * max(q - d, 0) for d in dem)

    got = {r.stock_level: r for r in _rows(spark, "q_newsvendor")}
    grid = {qstar * 9 // 10, qstar, (qstar * 11 + 9) // 10}
    assert set(got) == grid
    for q, r in got.items():
        assert r.total_cost == cost(q)
        served = sum(min(d, q) for d in dem)
        assert abs(r.fill_rate - served / sum(dem)) < 1e-9
    assert got[qstar].total_cost == min(r.total_cost for r in got.values())


def _ntile(rn, n, k):
    big = n % k
    size_big = n // k + 1
    size_small = n // k
    if rn <= big * size_big:
        return (rn - 1) // size_big + 1
    return big + (rn - big * size_big - 1) // size_small + 1


def test_lorenz_points_match_brute_ntile(spark):
    """#470 via a brute sorted NTILE and cumulative sums."""
    rows = load_table(spark, SF_SMOKE, "orders").collect()
    vals = sorted(
        (math.floor(r.o_totalprice * 100 + 0.5), r.o_orderkey) for r in rows
    )
    n = len(vals)
    deciles = defaultdict(lambda: [0, 0])
    for i, (cents, _) in enumerate(vals, start=1):
        t = _ntile(i, n, 10)
        deciles[t][0] += 1
        deciles[t][1] += cents
    total = sum(c for c, _ in vals)
    got = {r.tile: r for r in _rows(spark, "q_lorenz_points")}
    crev = 0
    cn = 0
    for t in range(1, 11):
        cnt, rev = deciles[t]
        crev += rev
        cn += cnt
        assert got[t].n_orders == cnt
        assert got[t].revenue_cents == rev
        assert abs(got[t].cum_revenue_share - crev / total) < 1e-9
        assert abs(got[t].pop_share - cn / n) < 1e-9
    # Lorenz curve is convex: increments non-decreasing
    shares = [got[t].cum_revenue_share for t in range(1, 11)]
    incr = [b - a for a, b in zip([0.0] + shares, shares)]
    assert all(b >= a - 1e-12 for a, b in zip(incr, incr[1:]))
    assert abs(shares[-1] - 1.0) < 1e-9


def test_hoover_palma_matches_brute(spark):
    """#471 via brute nation shares and decile tails."""
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, SF_SMOKE, "customer").collect()
    }
    cells = defaultdict(int)
    for r in orders:
        cells[cust[r.o_custkey]] += math.floor(r.o_totalprice * 100 + 0.5)
    xt = sum(cells.values())
    k = len(cells)
    hoover = sum(abs(x / xt - 1 / k) for x in cells.values()) / 2
    vals = sorted(
        (math.floor(r.o_totalprice * 100 + 0.5), r.o_orderkey) for r in orders
    )
    n = len(vals)
    top10 = sum(
        c for i, (c, _) in enumerate(vals, start=1) if _ntile(i, n, 10) == 10
    )
    bot40 = sum(
        c for i, (c, _) in enumerate(vals, start=1) if _ntile(i, n, 10) <= 4
    )
    got = _rows(spark, "q_hoover_palma")[0]
    assert got.n_nations == k
    assert abs(got.hoover_index - hoover) < 1e-7
    assert got.top10_cents == top10
    assert got.bot40_cents == bot40
    assert abs(got.palma_ratio - top10 / bot40) < 1e-7


def test_pareto_tail_matches_brute_bins(spark):
    """#472 via a brute binned census and float MLE."""
    rows = load_table(spark, SF_SMOKE, "orders").collect()
    xs = [math.floor(r.o_totalprice + 0.5) for r in rows]
    bins = Counter(x // 500 for x in xs)
    n = len(xs)
    cum = 0
    bm = None
    for b in sorted(bins):
        cum += bins[b]
        if cum * 20 >= n * 19:
            bm = b
            break
    tail = {b: c for b, c in bins.items() if b > bm}
    n_tail = sum(tail.values())
    slog = sum(c * math.log((b + 0.5) / (bm + 0.5)) for b, c in tail.items())
    alpha = 1 + n_tail / slog
    got = _rows(spark, "q_pareto_tail")[0]
    assert got.n_orders == n
    assert got.n_tail == n_tail
    assert got.tail_floor_dollars == (bm + 1) * 500
    assert abs(got.alpha - alpha) < 1e-6
    assert got.alpha > 1.0
    assert abs(got.tail_fraction - n_tail / n) < 1e-9


def _nation_values(spark):
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, SF_SMOKE, "customer").collect()
    }
    groups = defaultdict(list)
    for r in orders:
        groups[cust[r.o_custkey]].append(math.floor(r.o_totalprice + 0.5))
    return groups


def test_variance_explained_matches_numpy(spark):
    """#473 via numpy grouped sums of squares."""
    groups = _nation_values(spark)
    allv = np.array([x for v in groups.values() for x in v], dtype=float)
    n, k = len(allv), len(groups)
    gm = allv.mean()
    ssb = sum(len(v) * (np.mean(v) - gm) ** 2 for v in groups.values())
    sst = float(np.sum((allv - gm) ** 2))
    ssw = sst - ssb
    msw = ssw / (n - k)
    eta = ssb / sst
    omega = (ssb - (k - 1) * msw) / (sst + msw)
    got = _rows(spark, "q_variance_explained")[0]
    assert got.n_groups == k and got.n_orders == n
    assert abs(got.eta_sq - eta) < 1e-6
    assert abs(got.omega_sq - omega) < 1e-6
    # omega² ≤ eta² always; omega² < 0 is legitimate when F < 1 (the
    # bias correction overshoots a truly null effect, textbook behavior)
    assert got.omega_sq <= got.eta_sq + 1e-9


def test_design_effect_matches_numpy(spark):
    """#474 via the numpy ANOVA ICC estimator."""
    groups = _nation_values(spark)
    allv = np.array([x for v in groups.values() for x in v], dtype=float)
    n, k = len(allv), len(groups)
    gm = allv.mean()
    ssb = sum(len(v) * (np.mean(v) - gm) ** 2 for v in groups.values())
    ssw = float(np.sum((allv - gm) ** 2)) - ssb
    msb = ssb / (k - 1)
    msw = ssw / (n - k)
    n0 = (n - sum(len(v) ** 2 for v in groups.values()) / n) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    deff = 1 + (n / k - 1) * icc
    got = _rows(spark, "q_design_effect")[0]
    assert got.n_clusters == k and got.n_orders == n
    assert abs(got.adj_cluster_size - n0) < 1e-6
    assert abs(got.icc - icc) < 1e-6
    assert abs(got.deff - deff) < 1e-6
    assert abs(got.effective_n - n / deff) < 1e-2


# ---------------------------------------------------------------------------
# Wave 11 (#475-#479)
# ---------------------------------------------------------------------------


def test_alpha_footprint_matches_brute_traces(spark):
    """#475 via brute per-user sorted traces and pair classification."""
    rows = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    traces = defaultdict(list)
    for r in rows:
        traces[r.user_id].append((r.ts, r.event_id, r.event_type))
    df = Counter()
    types = set()
    for tr in traces.values():
        tr.sort()
        types.update(t for _, _, t in tr)
        for (_, _, a), (_, _, b) in zip(tr, tr[1:]):
            df[(a, b)] += 1
    got = {(r.a, r.b): r for r in _rows(spark, "q_alpha_footprint")}
    ts = sorted(types)
    assert set(got) == {
        (a, b) for i, a in enumerate(ts) for b in ts[i + 1 :]
    }
    for (a, b), r in got.items():
        assert r.n_ab == df.get((a, b), 0)
        assert r.n_ba == df.get((b, a), 0)
        if r.n_ab > 0 and r.n_ba > 0:
            assert r.relation == "parallel"
        elif r.n_ab > 0:
            assert r.relation == "causal_ab"
        elif r.n_ba > 0:
            assert r.relation == "causal_ba"
        else:
            assert r.relation == "choice"


def test_sinkhorn_matches_numpy_uv(spark):
    """#476 via the u/v-vector numpy Sinkhorn (a different route than
    the engines' matrix IPF), with the same per-step quantize; margins
    of the final plan must be near the targets."""
    cust = load_table(spark, SF_SMOKE, "customer")
    nation = load_table(spark, SF_SMOKE, "nation")
    rows = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .select("n_regionkey", "c_mktsegment")
        .collect()
    )
    counts = Counter((r.n_regionkey, r.c_mktsegment) for r in rows)
    regions = sorted({r for r, _ in counts})
    segs = sorted({s for _, s in counts})
    tot = sum(counts.values())
    r_tgt = np.array(
        [sum(c for (rr, _), c in counts.items() if rr == r) / tot for r in regions]
    )
    c_tgt = np.array(
        [sum(c for (_, ss), c in counts.items() if ss == s) / tot for s in segs]
    )
    C = np.abs(
        np.arange(len(regions))[:, None] - np.arange(len(segs))[None, :]
    ).astype(float)
    M = np.floor(np.exp(-C) * 1e12 + 0.5) / 1e12
    for _ in range(6):
        M = np.floor(
            M * (r_tgt / M.sum(axis=1))[:, None] * 1e12 + 0.5
        ) / 1e12
        M = np.floor(
            M * (c_tgt / M.sum(axis=0))[None, :] * 1e12 + 0.5
        ) / 1e12
    got = {(r.region, r.segment): r for r in _rows(spark, "q_sinkhorn_transport")}
    for i, reg in enumerate(regions):
        for j, s in enumerate(segs):
            assert abs(got[(reg, s)].mass - M[i, j]) < 1e-9
    plan = np.array(
        [[got[(reg, s)].mass for s in segs] for reg in regions]
    )
    # 6 rounds end on a column scale; row margins converge to ~1e-3 on
    # this kernel — a convergence check, not a parity one
    assert np.allclose(plan.sum(axis=1), r_tgt, atol=5e-3)
    assert np.allclose(plan.sum(axis=0), c_tgt, atol=1e-9)
    cost = float(np.sum(plan * C))
    assert abs(next(iter(got.values())).transport_cost - cost) < 1e-6


def test_wilson_matches_math(spark):
    """#477 via the closed form, plus the containment properties the
    Wald interval lacks."""
    rows = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_type"
    ).collect()
    conv = defaultdict(int)
    for r in rows:
        if r.event_type == "purchase":
            conv[r.user_id] = 1
        conv.setdefault(r.user_id, 0)
    seg = defaultdict(lambda: [0, 0])
    for u, c in conv.items():
        seg[u % 4][0] += 1
        seg[u % 4][1] += c
    z = 1.959964
    got = {r.cohort: r for r in _rows(spark, "q_wilson_interval")}
    assert set(got) == set(seg)
    for coh, (n, x) in seg.items():
        p = x / n
        rad = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        lo = (p + z * z / (2 * n) - rad) / (1 + z * z / n)
        hi = (p + z * z / (2 * n) + rad) / (1 + z * z / n)
        r = got[coh]
        assert (r.n, r.x) == (n, x)
        assert abs(r.wilson_lo - lo) < 1e-8
        assert abs(r.wilson_hi - hi) < 1e-8
        assert 0.0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1.0


def test_process_capability_matches_numpy(spark):
    """#478 via numpy moments and a brute violation count."""
    ys, _ = _daily_dollars(spark)
    n = len(ys)
    sy = int(ys.sum())
    tgt = sy // n
    lsl, usl = tgt * 6 // 10, tgt * 14 // 10
    mu, s = ys.mean(), ys.std(ddof=1)
    cp = (usl - lsl) / (6 * s)
    cpk = min(usl - mu, mu - lsl) / (3 * s)
    got = _rows(spark, "q_process_capability")[0]
    assert got.n_days == n
    assert (got.lsl, got.usl) == (lsl, usl)
    assert abs(got.cp - cp) < 1e-7
    assert abs(got.cpk - cpk) < 1e-7
    assert got.cpk <= got.cp + 1e-12
    assert got.n_out_of_spec == int(np.sum((ys < lsl) | (ys > usl)))


def test_tukey_hsd_matches_brute(spark):
    """#479 via brute per-nation lists and the studentized-range q."""
    rows = load_table(spark, SF_SMOKE, "customer").collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r.c_nationkey].append(math.floor(r.c_acctbal * 100 + 0.5))
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    ssw = sum(
        sum(x * x for x in v) - sum(v) ** 2 / len(v) for v in groups.values()
    )
    msw = ssw / (n - k)
    qs = []
    for g1 in sorted(groups):
        for g2 in sorted(groups):
            if g1 >= g2:
                continue
            a, b = groups[g1], groups[g2]
            q = abs(sum(a) / len(a) - sum(b) / len(b)) / math.sqrt(
                msw / 2 * (1 / len(a) + 1 / len(b))
            )
            qs.append((round(q, 9), g1, g2))
    qs.sort(key=lambda x: (-x[0], x[1], x[2]))
    got = _rows(spark, "q_tukey_hsd")
    assert [(r.g1, r.g2) for r in got] == [(g1, g2) for _, g1, g2 in qs[:10]]
    for r, (q, _, _) in zip(got, qs[:10]):
        assert abs(r.q_stat - q) < 1e-6
    assert got[0].n_signif == sum(1 for q, _, _ in qs if q > 3.9)


# ---------------------------------------------------------------------------
# Wave 12 (#480-#483)
# ---------------------------------------------------------------------------


def test_energy_distance_matches_brute_pairs(spark):
    """#480 via the brute O(n*m) double loop on raw arrays — the exact
    definition the prefix identities must reproduce."""
    rows = load_table(spark, SF_SMOKE, "orders").collect()
    xs = [
        math.floor(r.o_totalprice + 0.5)
        for r in rows
        if r.o_orderpriority == "1-URGENT"
    ]
    ys = [
        math.floor(r.o_totalprice + 0.5)
        for r in rows
        if r.o_orderpriority == "5-LOW"
    ]
    n, m = len(xs), len(ys)
    ax = np.array(xs, dtype=float)
    ay = np.array(ys, dtype=float)
    sxy = float(np.abs(ax[:, None] - ay[None, :]).sum())
    sxx = float(np.abs(ax[:, None] - ax[None, :]).sum())
    syy = float(np.abs(ay[:, None] - ay[None, :]).sum())
    e = 2 * sxy / (n * m) - sxx / (n * n) - syy / (m * m)
    got = _rows(spark, "q_energy_distance")[0]
    assert (got.n, got.m) == (n, m)
    assert abs(got.energy_dist - e) < 1e-6
    assert abs(got.energy_stat - n * m / (n + m) * e) < 1e-4
    assert got.energy_dist >= -1e-12  # energy distance is nonnegative


def test_mmd_poly_matches_brute_kernel(spark):
    """#481 via the brute kernel-matrix double sums (the O(n²) route
    the moment identities replace)."""
    rows = load_table(spark, SF_SMOKE, "orders").collect()
    xa = np.array(
        [
            math.floor(r.o_totalprice + 0.5)
            for r in rows
            if r.o_orderdate.year == 1995
        ],
        dtype=float,
    )
    xb = np.array(
        [
            math.floor(r.o_totalprice + 0.5)
            for r in rows
            if r.o_orderdate.year == 2000
        ],
        dtype=float,
    )
    s = 1e10

    def k(u, v):
        return (1 + np.outer(u, v) / s) ** 2

    ka = k(xa, xa)
    kb = k(xb, xb)
    kab = k(xa, xb)
    na, nb = len(xa), len(xb)
    mmd = (
        (ka.sum() - np.trace(ka)) / (na * (na - 1))
        + (kb.sum() - np.trace(kb)) / (nb * (nb - 1))
        - 2 * kab.sum() / (na * nb)
    )
    got = _rows(spark, "q_mmd_poly")[0]
    assert (got.n_1995, got.n_2000) == (na, nb)
    assert abs(got.mmd_sq - mmd) < 1e-9 * max(1.0, abs(mmd))


def test_quantile_regression_matches_brute_grid(spark):
    """#482 via a brute python loop over the same slope grid; the
    elected LAD loss must also beat the OLS line's L1 loss."""
    ys, _ = _daily_dollars(spark)
    ys = ys.astype(int)
    t = np.arange(len(ys))
    n = len(ys)
    st, stt = int(t.sum()), int((t * t).sum())
    sy, sty = int(ys.sum()), int((t * ys).sum())
    b0 = math.floor(
        (n * sty - st * sy) / (n * stt - st * st) + 0.5
    )
    step = max(abs(b0) // 8, 1)
    best = None
    for kk in range(-4, 5):
        b = b0 + kk * step
        r = ys - b * t
        a = int(np.sort(r)[(n + 1) // 2 - 1])
        loss = int(np.abs(r - a).sum())
        if best is None or (loss, b) < best[:2]:
            best = (loss, b, a)
    got = _rows(spark, "q_quantile_regression")[0]
    assert got.grid_size == 9
    assert (got.lad_loss, got.lad_slope, got.lad_intercept) == best
    # LAD loss <= L1 loss of the (rounded) OLS line with its own median shift
    r0 = ys - b0 * t
    a0 = int(np.sort(r0)[(n + 1) // 2 - 1])
    assert got.lad_loss <= int(np.abs(r0 - a0).sum())


def test_rank_churn_matches_brute(spark):
    """#483 via brute per-year sorts and set algebra."""
    rows = load_table(spark, SF_SMOKE, "lineitem").collect()
    per = defaultdict(lambda: defaultdict(int))
    for r in rows:
        per[r.l_shipdate.year][r.l_partkey] += math.floor(
            r.l_extendedprice * 100 + 0.5
        )
    tops = {}
    for y, d in per.items():
        ranked = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        tops[y] = {pk: i + 1 for i, (pk, _) in enumerate(ranked)}
    got = {r.y0: r for r in _rows(spark, "q_rank_churn")}
    years = sorted(y for y in tops if y + 1 in tops)
    assert set(got) == set(years)
    for y in years:
        common = set(tops[y]) & set(tops[y + 1])
        foot = sum(abs(tops[y][p] - tops[y + 1][p]) for p in common)
        r = got[y]
        assert r.n_common == len(common)
        assert r.footrule == foot
        assert abs(r.churn - (1 - len(common) / 50)) < 1e-9
        if common:
            assert abs(r.mean_rank_shift - foot / len(common)) < 1e-9


# ---------------------------------------------------------------------------
# Wave 13 (#484-#486)
# ---------------------------------------------------------------------------


def test_gini_mean_diff_matches_brute_and_concentration(spark):
    """#484 via the brute O(n²) pairwise sum; the implied Gini must
    also be a plausible concentration value."""
    xs = np.array(
        [
            math.floor(r.o_totalprice + 0.5)
            for r in load_table(spark, SF_SMOKE, "orders").collect()
        ],
        dtype=float,
    )
    n = len(xs)
    sdd = float(np.abs(xs[:, None] - xs[None, :]).sum())
    gmd = sdd / (n * (n - 1))
    gini = gmd / (2 * xs.mean())
    got = _rows(spark, "q_gini_mean_diff")[0]
    assert got.n == n
    assert abs(got.gmd - gmd) < 1e-6 * gmd
    assert abs(got.gini - gini) < 1e-8
    assert 0.0 < got.gini < 1.0


def test_robust_shape_matches_brute_octiles(spark):
    """#485 via brute sorted-array octile elections."""
    xs = sorted(
        math.floor(r.o_totalprice + 0.5)
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    )
    n = len(xs)

    def oct_k(k):
        # smallest x with ccdf*8 >= n*k over the value census ==
        # smallest x at rank ceil(n*k/8)
        import bisect

        rank = -(-n * k // 8)
        return xs[rank - 1]

    e = {k: oct_k(k) for k in range(1, 8)}
    bowley = (e[6] + e[2] - 2 * e[4]) / (e[6] - e[2])
    moors = ((e[7] - e[5]) + (e[3] - e[1])) / (e[6] - e[2])
    got = _rows(spark, "q_robust_shape")[0]
    assert got.n == n
    assert (got.q1, got.median, got.q3) == (e[2], e[4], e[6])
    assert abs(got.bowley_skew - bowley) < 1e-9
    assert abs(got.moors_kurtosis - moors) < 1e-9
    assert -1.0 <= got.bowley_skew <= 1.0


def test_qq_deciles_match_brute(spark):
    """#486 via brute per-sample sorted decile elections."""
    rows = load_table(spark, SF_SMOKE, "orders").collect()
    xs = sorted(
        math.floor(r.o_totalprice + 0.5)
        for r in rows
        if r.o_orderpriority == "1-URGENT"
    )
    ys = sorted(
        math.floor(r.o_totalprice + 0.5)
        for r in rows
        if r.o_orderpriority == "5-LOW"
    )

    def dec(arr, k):
        rank = -(-len(arr) * k // 10)
        return arr[rank - 1]

    got = {r.decile: r for r in _rows(spark, "q_qq_deciles")}
    assert set(got) == set(range(1, 10))
    gaps = []
    for k in range(1, 10):
        qx, qy = dec(xs, k), dec(ys, k)
        r = got[k]
        assert (r.q_urgent, r.q_low, r.gap) == (qx, qy, qx - qy)
        assert abs(r.qq_ratio - qx / qy) < 1e-9
        gaps.append(abs(qx - qy))
    assert got[1].max_gap == max(gaps)


# ---------------------------------------------------------------------------
# Wave 14 (#487-#489)
# ---------------------------------------------------------------------------


def test_stream_regression_matches_batch_lstsq(spark):
    """#487: the streamed OLS must equal the batch np.lstsq fit on the
    same integer (t, cents) pairs — the exactness claim of
    sufficient-statistic streaming."""
    rows = load_table(spark, SF_SMOKE, "events").select("ts", "value").collect()
    t = np.array(
        [int(r.ts.replace(tzinfo=None).timestamp()) - 1704067200 for r in rows],
        dtype=float,
    )
    x = np.array(
        [math.floor(r.value * 100 + 0.5) for r in rows], dtype=float
    )
    A = np.vstack([np.ones_like(t), t]).T
    (a, b), *_ = np.linalg.lstsq(A, x, rcond=None)
    got = _rows(spark, "q_stream_regression")[0]
    assert got.n == len(rows)
    assert abs(got.slope_cents_per_gigasec - b * 1e9) < 1e-3 * max(
        1.0, abs(b * 1e9)
    )
    assert abs(got.intercept_cents - a) < 1e-4 * max(1.0, abs(a))
    assert abs(got.mean_cents - x.mean()) < 1e-6


def test_empirical_copula_matches_brute_ntile(spark):
    """#488 via brute sorted NTILE on both margins."""
    orders = {
        r.o_orderkey: math.floor(r.o_totalprice * 100 + 0.5)
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    }
    items = Counter(
        r.l_orderkey for r in load_table(spark, SF_SMOKE, "lineitem").collect()
    )
    base = [(k, orders[k], items[k]) for k in orders if k in items]
    n = len(base)
    ux = {}
    for i, (k, _, _) in enumerate(
        sorted(base, key=lambda r: (r[1], r[0])), start=1
    ):
        ux[k] = _ntile(i, n, 5)
    uy = {}
    for i, (k, _, _) in enumerate(
        sorted(base, key=lambda r: (r[2], r[0])), start=1
    ):
        uy[k] = _ntile(i, n, 5)
    grid = Counter((ux[k], uy[k]) for k, _, _ in base)
    got = {(r.ux, r.uy): r for r in _rows(spark, "q_empirical_copula")}
    exp = n / 25
    chi = sum((c - exp) ** 2 / exp for c in grid.values())
    # cells absent from the data are absent from both engines
    assert set(got) == set(grid)
    for cell, c in grid.items():
        assert got[cell].c == c
        assert abs(got[cell].density_ratio - c / exp) < 1e-8
    assert abs(next(iter(got.values())).copula_chi2 - chi) < 1e-5


def test_western_electric_matches_brute_rules(spark):
    """#489 via a brute python pass over the z-score sequence."""
    ys, days = _daily_dollars(spark)
    m, s = ys.mean(), ys.std(ddof=1)
    z = (ys - m) / s
    n = len(z)
    r = {k: [0] * n for k in ("r1", "r2", "r3", "r4")}
    for i in range(n):
        if abs(z[i]) > 3:
            r["r1"][i] = 1
        if i >= 2:
            w = z[i - 2 : i + 1]
            if sum(v > 2 for v in w) >= 2 or sum(v < -2 for v in w) >= 2:
                r["r2"][i] = 1
        if i >= 4:
            w = z[i - 4 : i + 1]
            if sum(v > 1 for v in w) >= 4 or sum(v < -1 for v in w) >= 4:
                r["r3"][i] = 1
        if i >= 7:
            w = z[i - 7 : i + 1]
            if all(v > 0 for v in w) or all(v < 0 for v in w):
                r["r4"][i] = 1
    got = {row.rule: row for row in _rows(spark, "q_western_electric")}
    for rule, col in (
        ("R1_beyond_3sigma", "r1"),
        ("R2_2of3_beyond_2sigma", "r2"),
        ("R3_4of5_beyond_1sigma", "r3"),
        ("R4_8_same_side", "r4"),
    ):
        flags = r[col]
        assert got[rule].n_alarm_days == sum(flags)
        first = next((days[i] for i, f in enumerate(flags) if f), None)
        assert got[rule].first_alarm_day == first
