"""Round-8 independent-reference tests (SURVEY.md §5.4).

Every statistic added in round 8 is recomputed here by a pure-Python
/ numpy implementation that takes a DIFFERENT derivation route than
the engine pair (ECDF integrals instead of integer block algebra,
permutation enumeration instead of the closed Shapley form, brute
O(n^2) neighbor scans instead of grid joins), so a formula error
mirrored into the oracle cannot hide.
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


def test_anderson_darling_matches_ecdf_reference(spark):
    """#405 via the weighted-ECDF-integral route: A2 = sum_j w_j *
    sum_i n_i (F_i(v_j) - H(v_j))^2 / (H(1-H)), floats throughout."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    s0 = sorted(r.x for r in ev if r.user_id % 2 == 0)
    s1 = sorted(r.x for r in ev if r.user_id % 2 == 1)
    pooled = sorted(set(s0) | set(s1))
    n0, n1 = len(s0), len(s1)
    nn = n0 + n1
    a2 = 0.0
    for v in pooled:
        l = sum(1 for x in s0 if x == v) + sum(1 for x in s1 if x == v)
        b = sum(1 for x in s0 if x <= v) + sum(1 for x in s1 if x <= v)
        if b == nn:
            continue
        h = b / nn
        w = l / nn
        for sample, n_i in ((s0, n0), (s1, n1)):
            fi = sum(1 for x in sample if x <= v) / n_i
            a2 += w * n_i * (fi - h) ** 2 / (h * (1 - h))
    got = _rows(spark, "q_anderson_darling")[0]
    assert got.n1 == n1 and got.n2 == n0
    assert abs(got.a2_kn - a2) < 1e-7 * max(1.0, abs(a2))


def test_bradley_terry_matches_float_mm(spark):
    """#402 via unquantized float MM from a Python-rebuilt win matrix."""
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    spend: dict[tuple, int] = {}
    for r in orders:
        key = (r.o_custkey, r.o_orderpriority)
        spend[key] = spend.get(key, 0) + int(round(r.o_totalprice * 100))
    by_cust: dict[int, dict[str, int]] = {}
    for (ck, m), q in spend.items():
        by_cust.setdefault(ck, {})[m] = q
    wins: dict[tuple, int] = {}
    for ck, ms in by_cust.items():
        items = list(ms.items())
        for i in range(len(items)):
            for j in range(len(items)):
                if i != j and items[i][1] > items[j][1]:
                    wins[(items[i][0], items[j][0])] = (
                        wins.get((items[i][0], items[j][0]), 0) + 1
                    )
    players = sorted({p for k in wins for p in k})
    n = {
        (a, b): wins.get((a, b), 0) + wins.get((b, a), 0)
        for a in players
        for b in players
        if a != b
    }
    w = {a: sum(v for (x, _), v in wins.items() if x == a) for a in players}
    p = {a: 1.0 for a in players}
    for _ in range(4):
        p = {
            a: max(
                w[a]
                / sum(
                    n[(a, b)] / (p[a] + p[b])
                    for b in players
                    if b != a and n[(a, b)] > 0
                ),
                1e-12,
            )
            for a in players
        }
    got = {r.player: r for r in _rows(spark, "q_bradley_terry")}
    assert set(got) == set(players)
    for a in players:
        assert got[a].wins == w[a]
        assert abs(got[a].strength - p[a]) < 1e-6 * max(1.0, p[a])
    ranked = sorted(players, key=lambda a: (-p[a], a))
    for rk, a in enumerate(ranked, 1):
        assert got[a].rnk == rk


def test_nelson_aalen_rmst_matches_python(spark):
    """#404: hazard sums, KM product (as a literal running product,
    not exp-sum-ln), and the step-function RMST integral in floats."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        .collect()
    )
    gmax = max(r.t1 for r in ev)
    horizon = gmax.timestamp() - 12 * 3600
    spans = [
        (
            int((r.t1 - r.t0).total_seconds() // 86400),
            1 if r.t1.timestamp() < horizon else 0,
        )
        for r in ev
    ]
    times = sorted({t for t, _ in spans})
    rows = []
    for t in times:
        d = sum(c for tt, c in spans if tt == t)
        n_risk = sum(1 for tt, _ in spans if tt >= t)
        if d > 0:
            rows.append((t, d, n_risk))
    cumhaz = 0.0
    var = 0.0
    surv = 1.0
    ref = {}
    for t, d, n_risk in rows:
        cumhaz += d / n_risk
        var += d / n_risk / n_risk
        surv *= 1 - d / n_risk
        ref[t] = (d, n_risk, cumhaz, var, surv)
    rmst = rows[0][0] if rows else 0.0
    for (t, d, n), (t2, _, _) in zip(rows, rows[1:]):
        rmst += ref[t][4] * (t2 - t)
    got = _rows(spark, "q_nelson_aalen")
    assert len(got) == len(rows)
    for r in got:
        d, n_risk, ch, va, s = ref[r.life_days]
        assert r.n_churned == d and r.n_risk == n_risk
        assert abs(r.na_cumhaz - ch) < 1e-9
        assert abs(r.na_var - va) < 1e-9
        assert abs(r.km_surv - s) < 1e-8
        assert abs(r.rmst - rmst) < 1e-7


def _daily_grids(spark):
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type",
        F.datediff(
            F.col("ts").cast("timestamp").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("d"),
    ).collect()
    mn = min(r.d for r in ev)
    mx = max(r.d for r in ev)
    grids: dict[str, list[int]] = {}
    for et in {r.event_type for r in ev}:
        grids[et] = [0] * (mx - mn + 1)
    for r in ev:
        grids[r.event_type][r.d - mn] += 1
    return grids


def test_hurst_matches_classic_rs(spark):
    """#406 via the textbook float R/S recipe (mean-centered cumsums,
    population std) and numpy-free least squares."""
    grids = _daily_grids(spark)
    got = {r.event_type: r for r in _rows(spark, "q_hurst_exponent")}
    for et, xs in grids.items():
        means = {}
        for sz in (5, 10, 15):
            vals = []
            for b0 in range(0, len(xs) - sz + 1, sz):
                blk = xs[b0 : b0 + sz]
                mu = sum(blk) / sz
                cum, lo, hi, ssq = 0.0, 0.0, 0.0, 0.0
                for x in blk:
                    cum += x - mu
                    lo, hi = min(lo, cum), max(hi, cum)
                    ssq += (x - mu) ** 2
                s = math.sqrt(ssq / sz)
                if s > 0:
                    vals.append((hi - lo) / (s * sz**0.5 * sz**0.5 / sz))
            if vals:
                means[sz] = sum(vals) / len(vals)
        if len(means) < 3:
            assert et not in got
            continue
        xs_l = [math.log(s) for s in means]
        ys_l = [math.log(means[s]) for s in means]
        k = len(xs_l)
        sx, sy = sum(xs_l), sum(ys_l)
        sxy = sum(a * b for a, b in zip(xs_l, ys_l))
        sxx = sum(a * a for a in xs_l)
        slope = (sxy - sx * sy / k) / (sxx - sx * sx / k)
        r = got[et]
        assert abs(r.rs5 - means[5]) < 1e-7
        assert abs(r.rs10 - means[10]) < 1e-7
        assert abs(r.rs15 - means[15]) < 1e-7
        assert abs(r.hurst - slope) < 1e-6


def test_heaps_matches_python_fold(spark):
    """#407 via a direct seen-set fold over docs in id order."""
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("lang", "doc_id", "text")
        .collect()
    )
    by_lang: dict[str, list] = {}
    for r in docs:
        by_lang.setdefault(r.lang, []).append(r)
    got = {r.lang: r for r in _rows(spark, "q_heaps_law")}
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r.doc_id)
        seen: set[str] = set()
        pts = []
        ncum = 0
        m = len(rows)
        for i, r in enumerate(rows, 1):
            toks = [w for w in r.text.split(" ") if w]
            ncum += len(toks)
            seen.update(toks)
            if (i * 20) % m < 20:
                pts.append((math.log(ncum), math.log(len(seen))))
        k = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        beta = (sxy - sx * sy / k) / (sxx - sx * sx / k)
        k_hat = math.exp(sy / k - beta * sx / k)
        g = got[lang]
        assert g.n_checkpoints == k
        assert g.n_tokens == ncum and g.vocab == len(seen)
        assert abs(g.beta - beta) < 1e-7
        assert abs(g.k_hat - k_hat) < 1e-6 * max(1.0, k_hat)


def test_qini_matches_python(spark):
    """#403 recomputed from raw per-user rollups in floats."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
        .collect()
    )
    users = [
        (r.user_id % 2, min(r.c // 20, 4), r.conv) for r in ev
    ]
    bands = sorted({b for _, b, _ in users})
    stats = {}
    for b in bands:
        nt = sum(1 for tr, bb, _ in users if tr == 1 and bb == b)
        ct = sum(c for tr, bb, c in users if tr == 1 and bb == b)
        nc = sum(1 for tr, bb, _ in users if tr == 0 and bb == b)
        cc = sum(c for tr, bb, c in users if tr == 0 and bb == b)
        if nt > 0 and nc > 0:  # both-arms contract
            stats[b] = (nt, ct, nc, cc, ct / nt - cc / nc)
    bands = sorted(stats)
    order = sorted(bands, key=lambda b: (-stats[b][4], b))
    ntc = ctc = ncc = ccc = 0
    qs = []
    for b in order:
        nt, ct, nc, cc, up = stats[b]
        ntc += nt
        ctc += ct
        ncc += nc
        ccc += cc
        qs.append((b, up, ctc - ccc * ntc / ncc, ntc + ncc))
    n_tot = qs[-1][3]
    q_final = qs[-1][2]
    coef = sum(q - q_final * c / n_tot for _, _, q, c in qs) / len(qs)
    got = sorted(_rows(spark, "q_qini_uplift"), key=lambda r: r.rk)
    for r, (b, up, q, _) in zip(got, qs):
        assert r.band == b
        assert abs(r.uplift - up) < 1e-9
        assert abs(r.qini_cum - q) < 1e-7
        assert abs(r.qini_coef - coef) < 1e-7


def test_shapley_matches_permutation_enumeration(spark):
    """#410 via brute-force marginal contributions over all 3! orders."""
    from itertools import permutations

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "text", "n_chars"
    ).collect()
    flags = [
        (
            int(r.n_chars >= 200),
            int(len([w for w in r.text.split(" ") if w]) >= 40),
            int(" the " in r.text),
        )
        for r in docs
    ]
    n = len(flags)

    def removed(subset):
        return n - sum(
            1 for f in flags if all(f[i] for i in subset)
        )

    phi = [0.0, 0.0, 0.0]
    for perm in permutations(range(3)):
        have: set[int] = set()
        for i in perm:
            before = removed(have)
            have.add(i)
            phi[i] += (removed(have) - before) / 6.0
    names = {"min_chars": 0, "min_words": 1, "has_the": 2}
    got = {r.filter: r for r in _rows(spark, "q_shapley_filters")}
    total = removed({0, 1, 2})
    assert abs(sum(phi) - total) < 1e-9  # additivity of the reference
    for name, i in names.items():
        assert abs(got[name].phi - phi[i]) < 1e-9
        assert got[name].removed_solo == removed({i})
        assert abs(got[name].phi_share - phi[i] / total) < 1e-9


def test_dbscan_matches_bruteforce(spark):
    """#409 via O(n^2) neighbor scans on the same md5 sample."""
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()

    def word(vid):
        return int(
            hashlib.md5(f"dbs:{vid}".encode()).hexdigest()[:13], 16
        )

    ranked = sorted(emb, key=lambda r: (word(r.vec_id), r.vec_id))[:4096]
    pts = [
        (r.vec_id, r.label, float(r.embedding[0]), float(r.embedding[1]))
        for r in ranked
    ]
    eps2 = 0.05 * 0.05
    core = set()
    for vid, _, x, y in pts:
        cnt = sum(
            1
            for _, _, x2, y2 in pts
            if (x - x2) ** 2 + (y - y2) ** 2 <= eps2
        )
        if cnt >= 5:
            core.add(vid)
    agg: dict[int, list[int]] = {}
    for vid, lab, x, y in pts:
        bucket = agg.setdefault(lab, [0, 0, 0])
        if vid in core:
            bucket[0] += 1
        elif any(
            v2 in core and (x - x2) ** 2 + (y - y2) ** 2 <= eps2
            for v2, _, x2, y2 in pts
            if v2 != vid
        ):
            bucket[1] += 1
        else:
            bucket[2] += 1
    got = {r.label: r for r in _rows(spark, "q_dbscan_core")}
    for lab, (nc, nb, nn) in agg.items():
        assert (got[lab].n_core, got[lab].n_border, got[lab].n_noise) == (
            nc,
            nb,
            nn,
        )


def test_mixing_weights_matches_python(spark):
    """#412 recomputed with math.pow-free float exp/log."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "source", "text"
    ).collect()
    toks: dict[str, int] = {}
    for r in docs:
        toks[r.source] = toks.get(r.source, 0) + len(
            [w for w in r.text.split(" ") if w]
        )
    total = sum(toks.values())
    got = {(r.source, r.alpha): r for r in _rows(spark, "q_mixing_weights")}
    for alpha in (1.0, 0.7, 0.5, 0.3):
        z = sum(math.exp(alpha * math.log(t)) for t in toks.values())
        for s, t in toks.items():
            w = math.exp(alpha * math.log(t)) / z
            r = got[(s, alpha)]
            assert r.tokens == t
            assert abs(r.weight - w) < 1e-9
            assert abs(r.eff_epochs - w * total / t) < 1e-7


def test_fertility_matches_python_bpe(spark):
    """#411 via a from-scratch Python BPE (3 merges, count desc / pair
    asc tie-break) applied with greedy non-overlapping replacement."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "lang", "text"
    ).collect()
    wf: dict[str, int] = {}
    for r in docs:
        for w in r.text.split(" "):
            if w and w.isalpha() and w.islower() and w.isascii():
                wf[w] = wf.get(w, 0) + 1
    wf = {w: f for w, f in wf.items() if f >= 10}
    vocab = {w: list(w) for w in wf}
    merges = []
    for _ in range(3):
        counts: dict[tuple, int] = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + wf[w]
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        for w, syms in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    stats: dict[str, list[int]] = {}
    for r in docs:
        words = [w for w in r.text.split(" ") if w]
        ntok = 0
        for w in words:
            syms = list(w)
            for a, b in merges:
                out = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            ntok += len(syms)
        st = stats.setdefault(r.lang, [0, 0, 0])
        st[0] += len(words)
        st[1] += ntok
        st[2] += sum(len(w) for w in words)
    got = {r.lang: r for r in _rows(spark, "q_token_fertility")}
    for lang, (nw, nt, nc) in stats.items():
        g = got[lang]
        assert (g.n_words, g.n_tokens, g.n_chars) == (nw, nt, nc)
        assert abs(g.fertility - nt / nw) < 1e-9
        assert abs(g.chars_per_token - nc / nt) < 1e-9


def test_silhouette_bounds_and_partition(spark):
    """#408: the per-cluster means are bounded, sizes partition the
    corpus, and a > 0 implies s in [-1, 1]."""
    rows = _rows(spark, "q_silhouette")
    emb_n = load_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r.n for r in rows) == emb_n
    for r in rows:
        assert -1.0 <= r.mean_sil <= 1.0
        assert r.mean_a >= 0 and r.mean_b >= r.mean_a - 1e-12


def test_smote_capped_in_bucket_nn_bruteforce(spark):
    """q_smote_capped: brute-force the bucket hash and in-bucket 1-NN
    with numpy on the raw minority vectors."""
    import numpy as np

    from zmaxion_spark.queries.pattern7_q import _SMOTE_H, _TWO52

    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    counts: dict[int, int] = {}
    for r in emb:
        counts[r.label] = counts.get(r.label, 0) + 1
    mlab = min(counts, key=lambda k: (counts[k], k))
    mino = [r for r in emb if r.label == mlab]
    buckets: dict[int, list] = {}
    for r in mino:
        v = [float(x) for x in r.embedding]
        code = 0
        for j, h in enumerate(_SMOTE_H):
            acc = 0.0
            for a, b in zip(v, h):
                acc += a * b
            if acc > 0:
                code |= 1 << j
        buckets.setdefault(code, []).append((r.vec_id, v))
    ref = {}
    for code, members in buckets.items():
        if len(members) < 2:
            continue
        for vid, v in members:
            best = None
            for vid2, v2 in members:
                if vid2 == vid:
                    continue
                d2 = 0.0
                for a, b in zip(v, v2):
                    d2 += (a - b) * (a - b)
                key = (round(d2, 9), vid2, d2)
                if best is None or key < best:
                    best = key
            lam = (
                int(hashlib.md5(f"smotec:{vid}".encode()).hexdigest()[:13], 16)
                / _TWO52
            )
            ref[vid] = (code, len(members), best[1], best[2], lam)
    got = {r.vec_id: r for r in _rows(spark, "q_smote_capped")}
    assert set(got) == set(ref)
    for vid, (code, nb, nn_id, d2, lam) in ref.items():
        g = got[vid]
        assert (g.bucket, g.n_bucket, g.nn_id) == (code, nb, nn_id)
        assert abs(g.nn_d2 - d2) < 1e-9
        assert abs(g.lam - lam) < 1e-9
