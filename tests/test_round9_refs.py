"""Round-9 independent-reference tests (SURVEY.md §5.4).

Every statistic added in round 9 is recomputed here by a pure-Python
implementation that takes a DIFFERENT derivation route than the
engine pair (union-find instead of bounded label propagation, brute
per-doc dictionaries instead of census joins, scipy-textbook Welch
and Dunn formulas over raw samples instead of integer cell algebra,
brute O(n²) neighbor scans instead of grid equi-joins), so a formula
error mirrored into the oracle cannot hide.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.registry import REGISTRY


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF_SMOKE).collect()


def _union_find_components(edges):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = defaultdict(set)
    for node in list(parent):
        comps[find(node)].add(node)
    return comps


def _copurchase_edge_list(spark):
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
    return [p for p, c in pair_counts.items() if c >= 2]


def test_connected_components_matches_union_find(spark):
    """#413 via union-find over the same edge list: identical
    component-size census, and the bounded rounds must have converged
    on this fixture (diameter << 8)."""
    edges = _copurchase_edge_list(spark)
    comps = _union_find_components(edges)
    expected = Counter(len(m) for m in comps.values())
    got = _rows(spark, "q_connected_components")
    assert all(r.converged == 1 for r in got)
    assert {r.size: r.n_components for r in got} == dict(expected)


def test_dedup_canonical_matches_union_find_election(spark):
    """#414 via union-find over the engine's own LSH pairs: the
    canonical of each cluster must be its min doc_id and the census
    totals must match."""
    pairs = [
        (r.doc_a, r.doc_b)
        for r in REGISTRY["q_dedup_minhash_lsh"]
        .fn(spark, SF_SMOKE)
        .collect()
    ]
    comps = _union_find_components(pairs)
    expected = {min(m): len(m) for m in comps.values()}
    got = _rows(spark, "q_dedup_canonical")
    assert all(r.converged == 1 for r in got)
    assert all(r.n_clusters == len(expected) for r in got)
    assert all(
        r.n_redundant == sum(s - 1 for s in expected.values()) for r in got
    )
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert [(r.canonical_doc, r.cluster_size) for r in got] == top


def _md5_bucket(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


def test_dsir_importance_matches_dict_reference(spark):
    """#415 via per-doc Python dictionaries: hashed-bigram counts,
    Laplace-smoothed log ratios, float dot products."""
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    tgt = Counter()
    raw = Counter()
    per_doc = []
    for r in docs:
        c = Counter(
            _md5_bucket(r.text[i : i + 2], 256)
            for i in range(len(r.text) - 1)
        )
        per_doc.append((r.source, c))
        raw.update(c)
        if r.lang == "en":
            tgt.update(c)
    tt, tr = sum(tgt.values()), sum(raw.values())
    llr = {
        b: math.log((tgt.get(b, 0) + 1) / (tt + 256))
        - math.log((raw[b] + 1) / (tr + 256))
        for b in raw
    }
    by_source = defaultdict(list)
    for source, c in per_doc:
        by_source[source].append(sum(n * llr[b] for b, n in c.items()))
    got = {r.source: r for r in _rows(spark, "q_dsir_importance")}
    assert set(got) == set(by_source)
    for s, ws in by_source.items():
        assert got[s].n_docs == len(ws)
        assert got[s].n_target_like == sum(1 for w in ws if w > 0)
        assert abs(got[s].mean_weight - sum(ws) / len(ws)) < 1e-5


def test_kneser_ney_matches_dict_reference(spark):
    """#416 via Python dict KN: same split, textbook formula with
    float arithmetic end-to-end."""
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    d_disc = 0.75
    cb = Counter()
    follow = defaultdict(set)
    precede = defaultdict(set)
    hold = []
    for r in docs:
        toks = [t for t in r.text.split(" ")]
        bgs = list(zip(toks, toks[1:]))
        if r.doc_id % 10 == 0:
            hold.extend((r.lang, w1, w2) for w1, w2 in bgs)
        else:
            for w1, w2 in bgs:
                cb[(w1, w2)] += 1
                follow[w1].add(w2)
                precede[w2].add(w1)
    c1 = Counter()
    for (w1, _), c in cb.items():
        c1[w1] += c
    b_tot = len(cb)
    per_lang = defaultdict(lambda: [0, 0, 0.0])  # n, oov, sum_lp
    for lang, w1, w2 in hold:
        st = per_lang[lang]
        st[0] += 1
        if w1 not in c1 or w2 not in precede:
            st[1] += 1
            continue
        p = (
            max(cb.get((w1, w2), 0) - d_disc, 0.0)
            + d_disc * len(follow[w1]) * (len(precede[w2]) / b_tot)
        ) / c1[w1]
        st[2] += math.log(p)
    got = {r.lang: r for r in _rows(spark, "q_kneser_ney")}
    assert set(got) == set(per_lang)
    for lang, (n, oov, slp) in per_lang.items():
        assert got[lang].n_bigrams == n
        assert got[lang].n_oov == oov
        scored = n - oov
        if scored:
            ppl = math.exp(-slp / scored)
            assert abs(got[lang].ppl_kn - ppl) < 1e-6 * ppl


def test_ccnet_buckets_match_sorted_reference(spark):
    """#417 via a Python sort of the engine's own per-doc perplexity:
    tercile membership and token mass must match the integer cut."""
    ppl_rows = REGISTRY["q_lm_perplexity"].fn(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.lang
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    by_lang = defaultdict(list)
    for r in ppl_rows:
        by_lang[docs[r.doc_id]].append((r.ppl, r.doc_id, r.n_bigrams))
    expected = defaultdict(lambda: [0, 0])  # (lang, bucket) -> [docs, toks]
    for lang, rows in by_lang.items():
        rows.sort()
        m = len(rows)
        for rn, (_, _, ntok) in enumerate(rows, start=1):
            b = "head" if rn * 3 <= m else ("middle" if rn * 3 <= 2 * m else "tail")
            expected[(lang, b)][0] += 1
            expected[(lang, b)][1] += ntok
    got = _rows(spark, "q_ccnet_buckets")
    assert {(r.lang, r.bucket): [r.n_docs, r.n_tokens] for r in got} == dict(
        expected
    )


def test_welch_anova_matches_textbook_reference(spark):
    """#418 via the textbook Welch formula over raw float samples."""
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    groups = defaultdict(list)
    for r in orders:
        groups[r.o_orderpriority].append(round(r.o_totalprice * 100) / 100.0)
    k = len(groups)
    stats = []
    for xs in groups.values():
        n = len(xs)
        m = sum(xs) / n
        s2 = sum((x - m) ** 2 for x in xs) / (n - 1)
        stats.append((n, m, n / s2))
    bw = sum(w for _, _, w in stats)
    mt = sum(w * m for _, m, w in stats) / bw
    a = sum(w * (m - mt) ** 2 for _, m, w in stats) / (k - 1)
    lam = sum((1 - w / bw) ** 2 / (n - 1) for n, _, w in stats)
    f = a / (1 + 2.0 * (k - 2) / (k * k - 1) * lam)
    df2 = (k * k - 1) / (3.0 * lam)
    got = _rows(spark, "q_welch_anova")[0]
    assert got.k == k and got.n == sum(n for n, _, _ in stats)
    assert abs(got.f_welch - f) < 1e-6 * max(1.0, abs(f))
    assert abs(got.df2 - df2) < 1e-6 * df2


def test_dunn_posthoc_matches_scipy_style_reference(spark):
    """#419 via float midranks computed by sorting (scipy.rankdata
    style) instead of the integer census."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type", F.expr("CAST(CAST(ts AS TIMESTAMP) AS DATE)"))
        .count()
        .collect()
    )
    samples = defaultdict(list)
    for r in ev:
        samples[r.event_type].append(r["count"])
    pooled = sorted(x for xs in samples.values() for x in xs)
    nn = len(pooled)
    # midrank map by sorting
    first = {}
    for i, v in enumerate(pooled, start=1):
        first.setdefault(v, []).append(i)
    midrank = {v: sum(ix) / len(ix) for v, ix in first.items()}
    tie3 = sum(
        len(ix) ** 3 - len(ix) for ix in first.values() if len(ix) > 1
    )
    sig2 = nn * (nn + 1) / 12 - tie3 / (12 * (nn - 1))
    means = {
        g: sum(midrank[x] for x in xs) / len(xs) for g, xs in samples.items()
    }
    got = _rows(spark, "q_dunn_posthoc")
    assert len(got) == len(samples) * (len(samples) - 1) // 2
    for r in got:
        z = (means[r.grp_a] - means[r.grp_b]) / math.sqrt(
            sig2 * (1 / len(samples[r.grp_a]) + 1 / len(samples[r.grp_b]))
        )
        assert r.n_a == len(samples[r.grp_a])
        assert r.n_b == len(samples[r.grp_b])
        assert abs(r.z - z) < 1e-6 * max(1.0, abs(z))


def test_dbscan_big_matches_bruteforce(spark):
    """#409 scale contract via a brute O(n²) neighbor scan over the
    same md5-jittered points — proves the 3x3-cell equi-join loses no
    neighbor pair at any cell boundary."""
    from zmaxion_spark.queries.round8_q import _DBS_EPS, _DBS_MINPTS

    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    pts = []
    for r in emb:
        for i in range(8):
            jx = (
                int(
                    hashlib.md5(f"djx:{r.vec_id}:{i}".encode()).hexdigest()[:8],
                    16,
                )
                % 4001
                - 2000
            ) / 1000.0 * _DBS_EPS
            jy = (
                int(
                    hashlib.md5(f"djy:{r.vec_id}:{i}".encode()).hexdigest()[:8],
                    16,
                )
                % 4001
                - 2000
            ) / 1000.0 * _DBS_EPS
            pts.append(
                (
                    r.vec_id * 8 + i,
                    r.label,
                    float(r.embedding[0]) + jx,
                    float(r.embedding[1]) + jy,
                )
            )
    eps2 = _DBS_EPS * _DBS_EPS
    core = {}
    for pid, _, x, y in pts:
        n = sum(
            1
            for _, _, x2, y2 in pts
            if (x - x2) ** 2 + (y - y2) ** 2 <= eps2
        )
        core[pid] = n >= _DBS_MINPTS
    expected = defaultdict(lambda: [0, 0, 0])  # label -> core/border/noise
    for pid, label, x, y in pts:
        if core[pid]:
            expected[label][0] += 1
            continue
        is_border = any(
            core[p2]
            and p2 != pid
            and (x - x2) ** 2 + (y - y2) ** 2 <= eps2
            for p2, _, x2, y2 in pts
        )
        expected[label][1 if is_border else 2] += 1
    got = _rows(spark, "q_dbscan_big")
    assert {
        r.label: [r.n_core, r.n_border, r.n_noise] for r in got
    } == dict(expected)
