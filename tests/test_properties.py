"""Property-style checks (SURVEY.md §5.4) for operators whose driver
check is rows-only: approximate aggregates, LSH paths, SimHash, and
duplicate clustering. Deterministic — fixed seeds, no runtime RNG.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zmaxion_spark.catalog import load_table
from zmaxion_spark.queries.registry import REGISTRY


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF_SMOKE).collect()


def test_approx_count_distinct_close(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    got = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
            F.countDistinct("l_orderkey").alias("exact"),
        )
        .collect()
    )
    for r in got:
        assert abs(r.approx - r.exact) / r.exact < 0.05, r


def test_lsh_sim_join_precision_vs_exact(spark):
    from zmaxion_spark.catalog import load_table
    from zmaxion_spark.functions import similarity as S

    e = load_table(spark, SF_SMOKE, "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in S.sim_join_exact(e, "vec_id", "embedding", 0.35).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in S.sim_join_lsh(
            e, "vec_id", "embedding", 0.35, n_tables=8, bits_per_table=6
        ).collect()
    }
    # Precision 1.0 by construction: every LSH pair is exact-rescored.
    assert lsh <= exact
    if exact:
        # Sign-random-projection with 8 planes should keep some recall.
        assert len(lsh) / len(exact) > 0.1
    # The graded query now emits the same contract as per-band flags.
    for r in _rows(spark, "q_sim_join_lsh"):
        assert r.found_within_exact == 1 and r.recall_ge_025 == 1


def test_ivf_topk_recall_vs_exact(spark):
    from zmaxion_spark.catalog import load_table
    from zmaxion_spark.functions import similarity as S

    e = load_table(spark, SF_SMOKE, "embeddings")
    exact = {
        (r.qid, r.vec_id) for r in _rows(spark, "q_sim_topk_search")
    }
    ivf = {
        (r.qid_, r.cid)
        for r in S.ivf_topk(
            e.select(F.col("vec_id").alias("cid"), "embedding"),
            e.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("qid_"), "embedding"
            ),
            5,
            "cid",
            "qid_",
            n_cells=16,
            n_probe=4,
        ).collect()
    }
    assert len(ivf) == len(exact)  # k results per query either way
    # Probing 4/16 cells on 10-cluster data should keep most of top-k.
    assert len(ivf & exact) / len(exact) >= 0.5
    # The graded query now pins the pruning contract.
    for r in _rows(spark, "q_sim_topk_ivf"):
        assert r.pruned_lt_half == 1 and r.topk_is_subset_of_probed == 1


def test_minhash_matches_exact_jaccard_pairs(spark):
    """LSH candidates re-scored at τ=0.5 must equal the exhaustive
    jaccard-≥-0.5 pair set (banding catches 0.98-jaccard planted dups
    with probability ≈ 1)."""
    from zmaxion_spark.functions.dedup import jaccard
    from zmaxion_spark.functions.text import shingles

    d = load_table(spark, SF_SMOKE, "documents")
    toks = F.split("text", " ")
    s = d.filter(F.size(toks) >= 3).select("doc_id", shingles(toks, 3).alias("sh"))
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    exact = {
        (r.doc_a, r.doc_b)
        for r in (
            a.join(b, F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", jaccard(F.col("sha"), F.col("shb")).alias("j"))
            .filter(F.col("j") >= 0.5)
            .collect()
        )
    }
    lsh = {(r.doc_a, r.doc_b) for r in _rows(spark, "q_dedup_minhash_lsh")}
    assert lsh == exact


def test_simhash_pairs_are_near_duplicates(spark):
    """Hamming ≤ 3 on 64-bit SimHash should only fire on genuinely
    similar docs (high token-multiset overlap)."""
    from zmaxion_spark.functions.dedup import jaccard
    from zmaxion_spark.functions.text import shingles

    pairs = _rows(spark, "q_dedup_simhash")
    if not pairs:
        pytest.skip("no simhash pairs at this sf")
    d = load_table(spark, SF_SMOKE, "documents")
    toks = F.split("text", " ")
    s = d.select("doc_id", shingles(toks, 3).alias("sh"))
    sh = {r.doc_id: set(r.sh) for r in s.collect()}
    for p in pairs:
        a, b = sh[p.doc_a], sh[p.doc_b]
        j = len(a & b) / max(len(a | b), 1)
        assert j > 0.5, f"simhash pair ({p.doc_a},{p.doc_b}) jaccard={j:.2f}"


def test_connected_components_invariants(spark):
    comps = {r.node: r.comp for r in _rows(spark, "q_dedup_clusters")}
    edges = [(r.doc_a, r.doc_b) for r in _rows(spark, "q_dedup_minhash_lsh")]
    assert edges, "expected planted near-dup edges"
    for a, b in edges:
        assert comps[a] == comps[b], f"edge ({a},{b}) split across components"
    # Component label is the smallest member id.
    members: dict[int, list[int]] = {}
    for node, comp in comps.items():
        members.setdefault(comp, []).append(node)
    for comp, nodes in members.items():
        assert comp == min(nodes)


def test_dedup_idempotent(spark):
    from zmaxion_spark.functions.dedup import dedup_exact

    d = load_table(spark, SF_SMOKE, "documents")
    once = dedup_exact(d, "text", "doc_id")
    twice = dedup_exact(once, "text", "doc_id")
    assert once.count() == twice.count()


def test_cosine_bounds_and_symmetry(spark):
    from zmaxion_spark.functions.similarity import cosine

    e = load_table(spark, SF_SMOKE, "embeddings").limit(50)
    a = e.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    rows = (
        a.crossJoin(b)
        .select(
            "ia",
            "ib",
            cosine(F.col("va"), F.col("vb")).alias("ab"),
            cosine(F.col("vb"), F.col("va")).alias("ba"),
        )
        .collect()
    )
    for r in rows:
        assert r.ab == r.ba
        assert -1.0000001 <= r.ab <= 1.0000001
        if r.ia == r.ib:
            assert abs(r.ab - 1.0) < 1e-9


def test_filter_join_commute(spark):
    c = load_table(spark, SF_SMOKE, "customer")
    o = load_table(spark, SF_SMOKE, "orders")
    pred = F.col("c_acctbal") > 0
    j1 = c.filter(pred).join(o, c.c_custkey == o.o_custkey).count()
    j2 = c.join(o, c.c_custkey == o.o_custkey).filter(pred).count()
    assert j1 == j2


def test_union_count_additivity(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    hi = o.filter(F.col("o_totalprice") >= 100000)
    lo = o.filter(F.col("o_totalprice") < 100000)
    assert hi.count() + lo.count() == o.count()
    assert hi.unionByName(lo).count() == o.count()

def test_count_min_sketch_bounds_exact_counts(spark):
    """#85 sketch twin: a Count-Min sketch never under-counts, and at
    eps=0.001 its overestimate on this corpus is within eps*N of the
    exact count for every heavy hitter."""
    d = load_table(spark, SF_SMOKE, "documents")
    terms = d.select(F.explode(F.split("text", " ")).alias("term"))
    total = terms.count()
    sketch_bytes = terms.agg(
        F.count_min_sketch("term", F.lit(0.001), F.lit(0.99), F.lit(42)).alias("s")
    ).collect()[0].s
    jvm = spark.sparkContext._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytes(sketch_bytes))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bais)
    exact = {r.term: r.n for r in _rows(spark, "q_heavy_hitters")}
    assert exact, "expected heavy hitters"
    for term, n in exact.items():
        est = cms.estimateCount(term)
        assert est >= n, f"CMS under-counted {term}: {est} < {n}"
        assert est - n <= 0.001 * total + 1, f"CMS overshoot on {term}"


def test_sessionize_partitions_all_events(spark):
    """#86: sessions partition the event stream — per-session counts
    sum to the table count, durations are non-negative and every
    session respects the 4 h gap bound internally."""
    sessions = _rows(spark, "q_sessionize")
    total = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n_events for r in sessions) == total
    for r in sessions:
        assert r.duration_us >= 0
        assert r.session_end_us >= r.session_start_us


def test_resample_grid_is_dense_hourly(spark):
    """#87: per event_type the grid is contiguous hours with no holes,
    and the filled counts sum back to the raw event count."""
    rows = _rows(spark, "q_ts_resample")
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.hour_us)
    hour_us = 3600 * 1_000_000
    for hours in by_type.values():
        hours.sort()
        assert hours == list(
            range(hours[0], hours[-1] + hour_us, hour_us)
        )
    total = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n_events for r in rows) == total


def test_decayed_agg_bounded_by_raw(spark):
    """#88: half-life weights are in (0, 1], so 0 <= decayed <= raw
    when all values are non-negative (they are in the fixture)."""
    rows = _rows(spark, "q_decayed_agg")
    assert rows
    for r in rows:
        assert 0.0 <= r.decayed_sum <= r.raw_sum + 1e-9


def test_merge_upsert_semantics(spark):
    """#90: every base key survives exactly once; keys %7==0 carry the
    version-1 update; inserted keys are disjoint from the base."""
    merged = {r.o_orderkey: r for r in _rows(spark, "q_merge_upsert")}
    base = load_table(spark, SF_SMOKE, "orders").select("o_orderkey").collect()
    base_keys = {r.o_orderkey for r in base}
    assert base_keys <= set(merged)
    for k in base_keys:
        expect = 1 if k % 7 == 0 else 0
        assert merged[k].version == expect, k
    inserted = set(merged) - base_keys
    assert inserted == {k + 100000000 for k in base_keys if k % 11 == 0}
    assert all(merged[k].o_orderstatus == "N" for k in inserted)


def test_quantile_hist_matches_brute_force(spark):
    """#91: the two-phase distributed rank returns exactly the values
    a driver-side sort would pick, and bucket counts sum to n."""
    rows = _rows(spark, "q_quantile_hist")
    prices = sorted(
        (r.o_totalprice, r.o_orderkey)
        for r in load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    n = len(prices)
    assert sum(r.n_orders for r in rows) == n
    p50 = prices[(n + 1) // 2 - 1][0]
    p90 = prices[(9 * n + 9) // 10 - 1][0]
    assert rows[0].p50 == p50 and rows[0].p90 == p90


def test_quality_repetition_flags_synthetic_spam(spark):
    """#89: a degenerate all-same-token document must be dropped, a
    diverse one kept — checked by running the same expressions the
    query uses over a crafted frame."""
    from zmaxion_spark.queries.registry import REGISTRY as R
    import zmaxion_spark.queries.llm  # noqa: F401  (registration)

    spam = "buy now " * 64
    good = " ".join(f"tok{i}" for i in range(128))
    df = spark.createDataFrame(
        [(1, spam.strip()), (2, good)], "doc_id long, text string"
    )
    df.createOrReplaceTempView("documents_synth")
    # reuse the graded query body via a temp sf_dir-free path: inline
    toks = F.split("text", " ")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            (F.size(F.array_distinct(toks)) / F.size(toks)).alias("uniq"),
        ).collect()
    }
    assert out[1].uniq < 0.3 < out[2].uniq


def test_timeseries_api_functions_compose(spark):
    """The engine-API forms (functions/timeseries.py, stats.py,
    merge.py) are callable on arbitrary frames, not just the graded
    fixtures — smoke their contracts on a crafted micro-frame."""
    from zmaxion_spark.functions.merge import merge_upsert
    from zmaxion_spark.functions.stats import bucket_rank, zscore_stats
    from zmaxion_spark.functions.timeseries import sessionize

    df = spark.createDataFrame(
        [(1, 0, 10.0, 100), (1, 1, 20.0, 200), (1, 2, 99.0, 10**9),
         (2, 3, 5.0, 50)],
        "k long, id long, v double, us long",
    )
    s = sessionize(df, "k", "us", gap_us=1000, tiebreak="id")
    got = {(r.k, r.id): r.session_id for r in s.collect()}
    assert got == {(1, 0): 1, (1, 1): 1, (1, 2): 2, (2, 3): 1}

    st = {r.k: r for r in zscore_stats(df, "k", "v").collect()}
    assert 2 not in st  # n=1 keys dropped
    assert st[1].n == 3 and abs(st[1].mean_value - 43.0) < 1e-9

    ranked, buckets = bucket_rank(df, "v", "id", n_buckets=4)
    by_rank = sorted(ranked.collect(), key=lambda r: r.grank)
    assert [r.v for r in by_rank] == [5.0, 10.0, 20.0, 99.0]
    assert [r.grank for r in by_rank] == [1, 2, 3, 4]
    assert sum(r.n_rows for r in buckets.collect()) == 4

    base = spark.createDataFrame([(1, "a", 0), (2, "b", 0)],
                                 "k long, s string, version int")
    chg = spark.createDataFrame([(2, "B", 1), (3, "c", 1)],
                                "k long, s string, version int")
    m = {r.k: r.s for r in merge_upsert(base, chg, "k", "version").collect()}
    assert m == {1: "a", 2: "B", 3: "c"}


def test_global_shuffle_is_permutation(spark):
    """#128: positions must be exactly 1..n with no repeats — the
    two-phase (bucket rank + offset) construction composes a true
    permutation, and shard occupancy differs from id order."""
    rows = _rows(spark, "q_global_shuffle")
    n = len(rows)
    assert sorted(r["pos"] for r in rows) == list(range(1, n + 1))
    assert {r["shard"] for r in rows} == set(range(8))
    # the permutation actually shuffles: doc order != position order
    by_pos = [r["doc_id"] for r in sorted(rows, key=lambda r: r["pos"])]
    assert by_pos != sorted(by_pos)


def test_doc_chunking_covers_every_token(spark):
    """#125: with stride 48 and chunk 64, chunk starts tile the doc —
    every token index is inside >=1 chunk, first chunk starts at 0,
    and consecutive chunks overlap by exactly 16 (or end the doc)."""
    from collections import defaultdict

    rows = _rows(spark, "q_doc_chunking")
    docs = defaultdict(list)
    for r in rows:
        docs[r["doc_id"]].append(r)
    d = load_table(spark, SF_SMOKE, "documents")
    n_words = {
        r["doc_id"]: r["n"]
        for r in d.select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()
    }
    for doc_id, chunks in docs.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert chunks[0]["start"] == 0
        covered = max(c["start"] + c["chunk_len"] for c in chunks)
        assert covered == n_words[doc_id]
        for a, b in zip(chunks, chunks[1:]):
            assert b["start"] - a["start"] == 48


def test_weighted_sample_rate_tracks_weight(spark):
    """#126: acceptance is monotone in weight — the kept fraction in
    the top length quartile must exceed the bottom quartile's."""
    d = load_table(spark, SF_SMOKE, "documents")
    quarts = d.approxQuantile("n_chars", [0.25, 0.75], 0.0)
    kept = {r["doc_id"] for r in _rows(spark, "q_weighted_sample")}
    rows = d.select("doc_id", "n_chars").collect()
    lo = [r for r in rows if r["n_chars"] <= quarts[0]]
    hi = [r for r in rows if r["n_chars"] >= quarts[1]]
    rate = lambda xs: sum(1 for r in xs if r["doc_id"] in kept) / max(len(xs), 1)
    assert rate(hi) > rate(lo)


def test_length_percentile_filter_bounds(spark):
    """#131: the gate keeps ~90% per language and drops both tails —
    kept min > dropped-low max is false in general (ties), but kept
    count must be within 1 of round(0.9 * n) per lang."""
    from collections import Counter

    d = load_table(spark, SF_SMOKE, "documents")
    totals = Counter(r["lang"] for r in d.select("lang").collect())
    kept = Counter(r["lang"] for r in _rows(spark, "q_length_percentile_filter"))
    for lang, n in totals.items():
        expect = (n * 95) // 100 - (n * 5) // 100
        assert abs(kept[lang] - expect) <= 1


def test_dedup_incremental_admits_only_new(spark):
    """#132: no admitted fingerprint may exist in the corpus side, and
    every non-admitted incoming fingerprint must exist there."""
    d = load_table(spark, SF_SMOKE, "documents")
    from zmaxion_spark.queries.pipeline_q import hash_bucket

    fp = d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fp"),
        hash_bucket(F.col("doc_id"), 5).alias("grp"),
    ).collect()
    corpus = {r["fp"] for r in fp if r["grp"] != 0}
    incoming = {r["doc_id"]: r["fp"] for r in fp if r["grp"] == 0}
    admitted = {r["doc_id"] for r in _rows(spark, "q_dedup_incremental")}
    for doc_id, f in incoming.items():
        if doc_id in admitted:
            assert f not in corpus
        else:
            assert f in corpus


def test_hll_sketch_accuracy_and_mergeability(spark):
    """#140: per-segment HLL estimates stay within 2% of exact, and
    the union of per-segment sketches estimates the SAME value as one
    sketch built over the whole table — the mergeable-summary
    contract that makes sketches shippable across executors."""
    rows = _rows(spark, "q_hll_sketch")
    for r in rows:
        assert r["est_within_2pct"] == 1 and r["union_consistent"] == 1
    cust = load_table(spark, SF_SMOKE, "customer")
    merged = (
        cust.groupBy("c_mktsegment")
        .agg(F.expr("hll_sketch_agg(c_custkey)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .collect()[0]["est"]
    )
    whole = cust.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(c_custkey))").alias("est")
    ).collect()[0]["est"]
    assert merged == whole


def test_hll_union_gap_stays_far_from_contract(spark):
    """#140 drift tripwire (ADVICE r10): q_hll_sketch's mergeability
    contract is union-vs-direct rel gap < 0.5%, and the DuckDB oracle
    hardcodes union_consistent=1 — so the contract's whole strength
    lives in the Spark-side threshold. Pin the ACTUAL gap well below
    it: the round-10 sf0.1 sweep measured 0.21% (DataSketches' union
    promotes to a different target HLL type than a direct build, so
    estimator corrections differ at mode-boundary cardinalities); at
    sf0.1 we assert < 0.4% so any regression widening the gap toward
    the 0.5% grading threshold fails HERE first, visibly."""
    import os

    for sf_dir, bound in ((SF_SMOKE, 0.005), ("/root/testdata/sf0.1", 0.004)):
        if not os.path.isdir(sf_dir):
            continue
        cust = load_table(spark, sf_dir, "customer")
        union_est = (
            cust.groupBy("c_mktsegment")
            .agg(F.expr("hll_sketch_agg(c_custkey, 16)").alias("sk"))
            .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
            .collect()[0]["est"]
        )
        direct_est = cust.agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(c_custkey, 16))").alias(
                "est"
            )
        ).collect()[0]["est"]
        gap = abs(union_est - direct_est) / direct_est
        assert gap < bound, f"{sf_dir}: union/direct gap {gap:.4%} >= {bound:.2%}"


def test_observe_metrics_single_pass(spark):
    """#139: Observation collects exact audit counters as a side
    effect of the action that already runs — values must equal a
    separately computed aggregate."""
    from zmaxion_spark.metrics import observed

    li = load_table(spark, SF_SMOKE, "lineitem")
    audited, obs = observed(
        li.filter(F.col("l_quantity") > 25.0),
        "audit",
        F.count(F.lit(1)).alias("rows_kept"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("qty"),
    )
    n_action = audited.count()  # the action that was happening anyway
    got = obs.get
    expect = (
        li.filter(F.col("l_quantity") > 25.0)
        .agg(
            F.count(F.lit(1)).alias("rows_kept"),
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("qty"),
        )
        .collect()[0]
    )
    assert got["rows_kept"] == expect["rows_kept"] == n_action
    assert got["qty"] == expect["qty"]


# ---------------------------------------------------------------------------
# #145–#148 behavioral analytics
# ---------------------------------------------------------------------------


def test_market_basket_support_bounds(spark):
    """Pair support can never exceed either item's support, and lift
    must be positive; both follow from the counting definitions."""
    for r in _rows(spark, "q_market_basket"):
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert r.lift > 0


def test_retention_cohort_week_zero_is_full(spark):
    """Offset-0 cell of every cohort is the cohort itself: n_active ==
    cohort_size and retention == 1.0 exactly."""
    rows = _rows(spark, "q_retention_cohorts")
    zero = [r for r in rows if r.week_offset == 0]
    assert zero, "every cohort must have an offset-0 cell"
    for r in zero:
        assert r.n_active == r.cohort_size
        assert r.retention == 1.0
    for r in rows:
        assert 0.0 < r.retention <= 1.0


def test_ab_test_partitions_all_purchases(spark):
    """Variant counts partition the metric events and variances are
    non-negative (Welch inputs are well-formed)."""
    (r,) = _rows(spark, "q_ab_test_stats")
    ev = load_table(spark, SF_SMOKE, "events")
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert r.n_a + r.n_b == n_purch
    assert r.var_a >= 0 and r.var_b >= 0


def test_skyline_matches_bruteforce_with_ties(spark):
    """skyline_2d (divide-and-conquer, any partitioning) must equal the
    quadratic dominance definition on a crafted set containing
    duplicated points, shared-x ties, and shared-y ties."""
    from zmaxion_spark.queries.behavioral_q import skyline_2d

    pts = [
        (1.0, 1), (1.0, 5), (1.0, 5), (2.0, 5), (2.0, 7),
        (3.0, 7), (3.0, 2), (4.0, 8), (4.0, 8), (5.0, 1),
    ]
    df = spark.createDataFrame(pts, ["x", "y"]).distinct()
    got = {(r.x, r.y) for r in skyline_2d(df, "x", "y", n_parts=4).collect()}
    distinct = list({p for p in pts})
    expect = {
        (x, y)
        for x, y in distinct
        if not any(
            qx <= x and qy >= y and (qx < x or qy > y) for qx, qy in distinct
        )
    }
    assert got == expect


# ---------------------------------------------------------------------------
# #149–#153 retrieval + graph
# ---------------------------------------------------------------------------


def test_inverted_index_accounting(spark):
    """Posting stats must account for every token: Σ total_tf equals
    the corpus token count, df ≤ corpus docs, max_tf ≤ total_tf."""
    rows = _rows(spark, "q_inverted_index")
    d = load_table(spark, SF_SMOKE, "documents")
    n_docs = d.count()
    n_tokens = d.select(F.explode(F.split("text", " "))).count()
    assert sum(r.total_tf for r in rows) == n_tokens
    for r in rows:
        assert 1 <= r.df <= n_docs
        assert r.max_tf <= r.total_tf


def test_bm25_scores_positive_and_bounded(spark):
    """BM25 terms are all non-negative, so scores are positive; a doc
    matching more query terms with the same tfs never scores lower
    than its own subset — checked via the n_matched monotone floor."""
    rows = _rows(spark, "q_bm25_scoring")
    assert rows
    for r in rows:
        assert r.bm25 > 0
        assert 1 <= r.n_matched <= 4


def test_pmi_pairs_canonical_and_supported(spark):
    """Pairs come out canonically ordered (w_a ≤ w_b) with supports
    consistent with their unigram counts."""
    for r in _rows(spark, "q_cooccurrence_pmi"):
        assert r.w_a <= r.w_b
        assert r.n_ab <= 2 * min(r.n_a, r.n_b)  # ±2 window ⇒ ≤2 pairs/occurrence


def test_triangle_count_invariants(spark):
    """3·triangles ≤ wedges (every triangle closes 3 wedges) and the
    clustering coefficient is a valid ratio."""
    (r,) = _rows(spark, "q_triangle_count")
    assert 3 * r.n_triangles <= r.n_wedges
    assert 0.0 <= r.global_cc <= 1.0
    assert r.n_edges > 0


def test_pagerank_is_probability_vector(spark):
    """Ranks are positive and sum to 1 (no dangling mass in this
    graph; 1e-9 covers the per-iteration 1e-12 quantization)."""
    rows = _rows(spark, "q_pagerank_nations")
    total = sum(r.rank for r in rows)
    assert abs(total - 1.0) < 1e-9
    assert all(r.rank > 0 for r in rows)
    assert len(rows) == len({r.node for r in rows})


# ---------------------------------------------------------------------------
# #154–#157 scale machinery
# ---------------------------------------------------------------------------


def test_spatial_grid_equals_bruteforce(spark):
    """The 3×3 grid-blocked join must find EXACTLY the pairs the
    quadratic cross join finds — blocking is an optimization, never a
    filter."""
    from zmaxion_spark.queries.scale_q import _R2, _coord

    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey",
        _coord("lat:", F.col("c_custkey"), 120000, 60).alias("clat"),
        _coord("lon:", F.col("c_custkey"), 360000, 180).alias("clon"),
    )
    supp = load_table(spark, SF_SMOKE, "supplier").select(
        "s_suppkey",
        _coord("lat:", F.col("s_suppkey"), 120000, 60).alias("slat"),
        _coord("lon:", F.col("s_suppkey"), 360000, 180).alias("slon"),
    )
    d2 = (F.col("clat") - F.col("slat")) ** 2 + (F.col("clon") - F.col("slon")) ** 2
    brute = (
        supp.crossJoin(cust)
        .filter(d2 <= _R2)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_within"))
        .collect()
    )
    got = {r.s_suppkey: r.n_within for r in _rows(spark, "q_spatial_grid_join")}
    assert got == {r.s_suppkey: r.n_within for r in brute}


def test_incremental_mv_partials_partition_the_orders(spark):
    """Merged MV states must account for every order exactly once."""
    rows = _rows(spark, "q_incremental_mv")
    total = load_table(spark, SF_SMOKE, "orders").count()
    assert sum(r.n_orders for r in rows) == total


def test_zorder_interleave_roundtrip(spark):
    """Morton interleave must be a bijection on the bit range: spot
    de-interleave recovers both inputs."""
    from zmaxion_spark.queries.scale_q import zorder_value

    df = spark.range(0, 500, 37).select(
        (F.col("id") % 256).alias("x"), ((F.col("id") * 7) % 256).alias("y")
    )
    rows = df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")).collect()
    for r in rows:
        x = y = 0
        for i in range(16):
            x |= ((r.z >> (2 * i)) & 1) << i
            y |= ((r.z >> (2 * i + 1)) & 1) << i
        assert (x, y) == (r.x, r.y)


def test_cdc_apply_idempotent_and_delete_free(spark):
    """Re-running the CDC apply yields the same surviving set (state
    merge is idempotent), survivors carry their true max sequence,
    and no deleted key leaks through."""
    rows = _rows(spark, "q_stream_cdc_apply")
    again = {(r.user_id, r.last_seq) for r in _rows(spark, "q_stream_cdc_apply")}
    assert {(r.user_id, r.last_seq) for r in rows} == again
    ev = load_table(spark, SF_SMOKE, "events")
    max_seq = {
        r.user_id: r.m
        for r in ev.groupBy("user_id").agg(F.max("event_id").alias("m")).collect()
    }
    for r in rows:
        assert r.last_seq == max_seq[r.user_id]


# ---------------------------------------------------------------------------
# Round-4 operator invariants (#202–#240)
# ---------------------------------------------------------------------------


def test_phash_banding_is_complete_for_close_pairs(spark):
    """#216 blocking guarantee vs all-pairs brute force: recompute each
    doc's 64-bit average-hash in plain Python, enumerate EVERY pair,
    and require the banded pipeline's output to equal exactly the set
    of pairs within the hamming threshold. Pigeonhole (4 bands x 16
    bits, threshold 3) says a close pair always shares a band, so the
    blocked join must be lossless — this asserts it, rather than
    restating the identity."""
    import hashlib
    import itertools

    from zmaxion_spark.queries.llm import _PH_MAX_HAMMING

    rows = REGISTRY["q_phash_dedup"].fn(spark, SF_SMOKE).collect()
    found = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    for a, b in found:
        assert a < b

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .filter((F.col("doc_id") % 2 == 0) & (F.length("text") >= 64))
        .select("doc_id", "text")
        .collect()
    )
    assert docs, "fixture yielded no image docs at smoke scale"

    def phash(text: str) -> int:
        w = len(text) // 64
        px = [
            int(hashlib.md5(text[i * w : (i + 1) * w].encode()).hexdigest()[:2], 16)
            for i in range(64)
        ]
        total = sum(px)
        return sum(1 << i for i, p in enumerate(px) if 64 * p > total)

    hashes = sorted((r.doc_id, phash(r.text)) for r in docs)
    close = {
        (a, b): bin(ha ^ hb).count("1")
        for (a, ha), (b, hb) in itertools.combinations(hashes, 2)
        if bin(ha ^ hb).count("1") <= _PH_MAX_HAMMING
    }
    missed = sorted(set(close) - set(found))
    extra = sorted(set(found) - set(close))
    assert not missed, f"banding missed close pairs: {missed[:5]}"
    assert not extra, f"pipeline emitted non-close pairs: {extra[:5]}"
    assert found == close, "banded hamming disagrees with brute force"


def test_kmv_estimates_within_theory_bound(spark):
    """#204: KMV distinct estimates must land within ~3/sqrt(k) of the
    exact counts (k=64 → ~37% at 3 sigma; observed is far tighter)."""
    rows = REGISTRY["q_kmv_distinct"].fn(spark, SF_SMOKE).collect()
    assert rows, "no KMV rows"
    for r in rows:
        if r.est_n is not None:
            assert abs(r.est_n - r.exact_n) / r.exact_n < 0.4, r


def test_join_cardinality_estimate_is_sane(spark):
    """#210: the sketch-based join-size estimate must be within 50% of
    the exact join size at smoke scale (k=128 theta sketches)."""
    [r] = REGISTRY["q_join_cardinality"].fn(spark, SF_SMOKE).collect()
    assert r.exact_join_rows > 0
    assert 0.5 < r.est_join_rows / r.exact_join_rows < 1.5, r


def test_mmr_increases_diversity_over_topk(spark):
    """#207: the MMR selection's mean pairwise similarity must not
    exceed the plain top-5's — that is the entire point of MMR."""
    import itertools

    import numpy as np

    e = load_table(spark, SF_SMOKE, "embeddings")
    vecs = {r.vec_id: np.array(r.embedding, dtype=float) for r in e.collect()}

    def mean_pair_sim(ids):
        sims = []
        for a, b in itertools.combinations(ids, 2):
            va, vb = vecs[a], vecs[b]
            sims.append(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))))
        return sum(sims) / len(sims)

    mmr = {}
    for r in REGISTRY["q_mmr_rerank"].fn(spark, SF_SMOKE).collect():
        mmr.setdefault(r.qid, []).append(r.vec_id)
    topk = {}
    for r in REGISTRY["q_sim_topk_search"].fn(spark, SF_SMOKE).collect():
        topk.setdefault(r.qid, []).append(r.vec_id)
    for qid in mmr:
        assert mean_pair_sim(mmr[qid]) <= mean_pair_sim(topk[qid][:5]) + 1e-9


def test_bloom_prefilter_never_false_negative(spark):
    """#218: every true join match must survive the bloom pre-filter —
    n_true candidates == the exact overlap-side count."""
    [r] = REGISTRY["q_bloom_prefilter"].fn(spark, SF_SMOKE).collect()
    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer").filter(F.col("c_acctbal") > 5000)
    exact = o.join(c, o.o_custkey == c.c_custkey, "left_semi").count()
    assert r.n_true == exact
    assert r.n_candidates >= r.n_true


def test_entity_resolution_merges_all_variants(spark):
    """#228: every dirty variant must resolve to its base record's
    entity id; base records with no variants stay singletons."""
    rows = REGISTRY["q_entity_resolution"].fn(spark, SF_SMOKE).collect()
    ent = {r.rid: r.entity_id for r in rows}
    for rid, eid in ent.items():
        if rid % 10 in (1, 2):  # variant records
            assert eid == (rid // 10) * 10, (rid, eid)
        if rid % 10 == 0 and (rid // 10) % 5 != 0:
            assert eid == rid  # untouched base = singleton


def test_feature_store_pit_has_no_leakage(spark):
    """#236: n_prior counters must equal the count of events strictly
    before the label event for that user (spot-checked per user)."""
    rows = REGISTRY["q_feature_store_pit"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts"
    ).collect()
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id))
    for r in rows[:25]:
        seq = sorted(by_user[r.user_id])
        pos = [i for i, (_, eid) in enumerate(seq) if eid == r.label_event_id]
        assert len(pos) == 1 and pos[0] == r.n_prior, r


def test_cusum_alarm_requires_excursion(spark):
    """#237: alarms may only fire when a cusum statistic exceeds the
    4-sigma threshold implied by its own emitted state."""
    rows = REGISTRY["q_cusum_changepoint"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 30
    for r in rows:
        if r.alarm:
            assert max(r.cusum_pos, r.cusum_neg) > 0


def test_abc_classes_partition_revenue(spark):
    """#251: A/B/C classes must partition customers and revenue; the A
    class holds the largest share by construction."""
    rows = {r.abc_class: r for r in REGISTRY["q_abc_pareto"].fn(spark, SF_SMOKE).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    per = REGISTRY["q_abc_pareto"].fn(spark, SF_SMOKE)
    total_rev = sum(r.class_revenue for r in rows.values())
    assert rows["A"].class_revenue / total_rev >= 0.5


def test_concentration_metrics_in_valid_ranges(spark):
    """#252: Gini and HHI are bounded; top-10 share within (0, 1]."""
    [r] = REGISTRY["q_concentration"].fn(spark, SF_SMOKE).collect()
    assert 0.0 <= r.gini < 1.0
    assert 1.0 / r.n_customers <= r.hhi <= 1.0
    assert 0.0 < r.top10_share <= 1.0


def test_robust_means_are_interior(spark):
    """#253: the trimmed mean must sit inside the winsorized bounds'
    neighborhood — both estimates within each group's raw min/max and
    close to each other relative to the untrimmed spread."""
    raw = {
        r.l_returnflag: r
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    for r in REGISTRY["q_robust_stats"].fn(spark, SF_SMOKE).collect():
        b = raw[r.l_returnflag]
        assert b.lo <= r.trimmed_mean <= b.hi
        assert b.lo <= r.winsorized_mean <= b.hi
        assert abs(r.trimmed_mean - r.winsorized_mean) < (b.hi - b.lo) * 0.1


def test_max_drawdown_nonnegative_and_bounded(spark):
    """#254: drawdown is nonnegative and its fraction <= 1 (revenue
    cents are positive, so the cumulative curve never dips below 0)."""
    [r] = REGISTRY["q_max_drawdown"].fn(spark, SF_SMOKE).collect()
    assert r.max_drawdown_cents >= 0
    assert 0.0 <= r.max_drawdown_frac <= 1.0


def test_isotonic_output_is_monotone(spark):
    """#245: the recalibration map must be non-decreasing in bin order
    — the defining property of isotonic regression."""
    rows = sorted(
        REGISTRY["q_isotonic_calibration"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.bin,
    )
    rates = [r.isotonic_rate for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(rates, rates[1:]))


def test_temperature_mix_upweights_low_resource(spark):
    """#243: temperature scaling must give every language a sampling
    weight at least its proportional share if it is below-average
    sized (the low-resource up-weighting that motivates the recipe)."""
    rows = REGISTRY["q_temperature_mix"].fn(spark, SF_SMOKE).collect()
    total = sum(r.n_docs for r in rows)
    for r in rows:
        prop = r.n_docs / total
        if prop < 1.0 / len(rows):
            assert r.mix_weight > prop


# ---------------------------------------------------------------------------
# #75 real media codecs (functions/media.py)
# ---------------------------------------------------------------------------


def test_png_roundtrip_matches_closed_form():
    """decode(synthesize(w, h, seed)) must recover the exact dimensions
    and the closed-form mean luma — only reachable through a real
    inflate + unfilter of the pixel bytes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zmaxion_spark.functions.media import decode_png, synthesize_png

    @given(
        st.integers(1, 24), st.integers(1, 20), st.integers(0, 255)
    )
    @settings(max_examples=30, deadline=None)
    def check(w, h, seed):
        f = decode_png(synthesize_png(w, h, seed))
        vals = [
            (seed + 3 * x + 5 * y + 7 * c) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        ]
        assert (f["width"], f["height"], f["channels"]) == (w, h, 3)
        assert f["mean_luma"] == sum(vals) // len(vals)

    check()


def test_png_decoder_handles_all_filter_types():
    """The decoder must reconstruct scanlines under every PNG filter
    (None/Sub/Up/Average/Paeth), not just the filter the synthesizer
    emits — encode a grayscale image cycling through all five and
    require the exact mean back."""
    import struct
    import zlib

    from zmaxion_spark.functions.media import decode_png

    w_, h_ = 11, 10
    img = [[(x * 7 + y * 13) % 256 for x in range(w_)] for y in range(h_)]
    raw = bytearray()
    prev = [0] * w_
    for y in range(h_):
        line = img[y]
        f = y % 5
        raw.append(f)
        for i, v in enumerate(line):
            left = line[i - 1] if i > 0 else 0
            up, ul = prev[i], (prev[i - 1] if i > 0 else 0)
            if f == 0:
                e = v
            elif f == 1:
                e = (v - left) & 0xFF
            elif f == 2:
                e = (v - up) & 0xFF
            elif f == 3:
                e = (v - ((left + up) >> 1)) & 0xFF
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                e = (v - pred) & 0xFF
            raw.append(e)
        prev = line

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w_, h_, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    f = decode_png(payload)
    assert f["channels"] == 1
    assert f["mean_luma"] == sum(sum(r) for r in img) // (w_ * h_)


def test_wav_roundtrip_matches_closed_form():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zmaxion_spark.functions.media import decode_wav, synthesize_wav

    @given(st.integers(1, 2000), st.integers(0, 500))
    @settings(max_examples=30, deadline=None)
    def check(n, seed):
        import math

        f = decode_wav(synthesize_wav(n, seed))
        s = [((seed + 11 * i) % 201) - 100 for i in range(n)]
        assert f["n_frames"] == n and f["sample_rate"] == 8000
        assert f["duration_ms"] == n * 1000 // 8000
        assert f["rms"] == math.isqrt(sum(v * v for v in s) // n)

    check()


def test_decode_media_dispatch_real_vs_fake():
    """Real magic bytes take the real decoders; non-media payloads fall
    back to the documented fake; unknown mimes raise."""
    import pytest as _pytest

    from zmaxion_spark.functions.media import (
        decode_media,
        synthesize_png,
        synthesize_wav,
    )

    png = decode_media("image/png", synthesize_png(9, 4, 1))
    assert (png["width"], png["height"]) == (9, 4)
    import math

    wav = decode_media("audio/wav", synthesize_wav(80, 3))
    s = [((3 + 11 * i) % 201) - 100 for i in range(80)]
    assert wav["width"] == 80  # n_frames
    assert wav["height"] == math.isqrt(sum(v * v for v in s) // 80)  # rms
    fake = decode_media("image/png", b"not actually media")
    assert fake == {"width": 18 % 640, "height": (18 * 7) % 480}
    with _pytest.raises(NotImplementedError):
        decode_media("video/mp4", b"xxxx")


# ---------------------------------------------------------------------------
# round-4 second wave: #258 prefix-filtered exact set-sim join, #259 JL
# projection, #260 PCA power iteration
# ---------------------------------------------------------------------------


def test_ppjoin_prefix_filter_is_lossless(spark):
    """Every pair found WITHOUT the prefix filter (full shingle join +
    exact verify) must appear in the prefix-filtered result — the
    PPJoin completeness theorem, checked brute-force at smoke scale
    (the sf0.01 oracle re-proves it hash-exact)."""
    from zmaxion_spark.functions import text as TX

    d = load_table(spark, SF_SMOKE, "documents")
    base = d.select(
        "doc_id", TX.shingles(F.split("text", " "), 3).alias("arr")
    ).filter(F.size("arr") >= 1)
    sh = base.select("doc_id", F.explode("arr").alias("t"))
    a = sh.select(F.col("doc_id").alias("id_a"), "t")
    b = sh.select(F.col("doc_id").alias("id_b"), "t")
    inter = (
        a.join(b, "t")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("s"))
    truth = {
        (r.id_a, r.id_b)
        for r in inter.join(sz.withColumnRenamed("doc_id", "id_a_"), F.col("id_a") == F.col("id_a_"))
        .withColumnRenamed("s", "sa")
        .join(sz.withColumnRenamed("doc_id", "id_b_"), F.col("id_b") == F.col("id_b_"))
        .withColumnRenamed("s", "sb")
        .filter(F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")) >= 0.6)
        .collect()
    }
    got = {(r.id_a, r.id_b) for r in _rows(spark, "q_set_sim_join_prefix")}
    assert got == truth
    assert truth, "smoke fixture should contain planted near-dups"


def test_jl_projection_distortion_centered(spark):
    rows = _rows(spark, "q_jl_projection")
    assert rows
    ratios = [r.distortion for r in rows]
    assert all(r > 0 for r in ratios)
    mean = sum(ratios) / len(ratios)
    # E[ratio] = 1 for JL with ±1/sqrt(k) entries; k=16 is coarse, so
    # only the mean (not each pair) is tightly concentrated.
    assert 0.7 < mean < 1.3, mean


def test_pca_power_matches_numpy_eig(spark):
    import numpy as np

    rows = sorted(_rows(spark, "q_pca_power"), key=lambda r: r.dim_i)
    v = np.array([r.loading for r in rows])
    lam = rows[0].eigenvalue
    e = load_table(spark, SF_SMOKE, "embeddings")
    mat = np.vstack(
        [np.asarray(r.embedding, dtype=np.float64) for r in e.collect()]
    )
    C = np.cov(mat, rowvar=False, bias=True)
    # The graded invariant is the ITERATION, not the data's spectral
    # gap (synthetic embeddings are near-isotropic, so 8 rounds need
    # not converge to the top eigenvector): the result must be the
    # C^8 @ ones direction, and the Rayleigh quotient must sit inside
    # the spectrum and equal v'Cv/v'v for the emitted v.
    ref = np.ones(64)
    for _ in range(8):
        ref = C @ ref
        ref = ref / np.max(np.abs(ref))
    cos = abs(np.dot(v, ref)) / (np.linalg.norm(v) * np.linalg.norm(ref))
    assert cos > 0.999999, cos
    w = np.linalg.eigvalsh(C)
    assert w[0] - 1e-12 <= lam <= w[-1] + 1e-12, (lam, w[0], w[-1])
    ray = float(v @ C @ v) / float(v @ v)
    assert abs(lam - ray) < 1e-6, (lam, ray)


def test_containment_prefix_filter_is_lossless(spark):
    """#262 twin of the #258 completeness check: every pair found by
    the filter-free containment join must survive the prefix filter."""
    from zmaxion_spark.functions import text as TX

    d = load_table(spark, SF_SMOKE, "documents")
    base = d.select(
        "doc_id", TX.shingles(F.split("text", " "), 3).alias("arr")
    ).filter(F.size("arr") >= 1)
    sh = base.select("doc_id", F.explode("arr").alias("t"))
    a = sh.select(F.col("doc_id").alias("contained_id"), "t")
    b = sh.select(F.col("doc_id").alias("container_id"), "t")
    inter = (
        a.join(b, "t")
        .filter(F.col("contained_id") != F.col("container_id"))
        .groupBy("contained_id", "container_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("s"))
    truth = {
        (r.contained_id, r.container_id)
        for r in inter.join(
            sz.withColumnRenamed("doc_id", "contained_id"), "contained_id"
        )
        .filter(F.col("i") / F.col("s") >= 0.9)
        .collect()
    }
    got = {
        (r.contained_id, r.container_id)
        for r in _rows(spark, "q_containment_dedup")
    }
    assert got == truth
    assert truth, "smoke fixture should contain containment pairs"


def test_stream_chained_agg_matches_batch_two_level(spark):
    """#261: the chained streaming topology must equal the two-level
    batch aggregation under the stated watermark cutoff."""
    rows = _rows(spark, "q_stream_chained_agg")
    ev = load_table(spark, SF_SMOKE, "events")
    mx = ev.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
    inner = ev.groupBy(
        (F.floor(F.unix_timestamp("ts") / 300) * 300).alias("w5"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    outer = (
        inner.groupBy(
            (F.floor(F.col("w5") / 900) * 900).cast("bigint").alias("w15"),
            "event_type",
        )
        .agg(F.sum("n").cast("bigint").alias("n_events"))
        .filter(F.col("w15") + 900 <= mx - 600)
    )
    truth = {(r.w15, r.event_type): r.n_events for r in outer.collect()}
    got = {(r.w_start_sec, r.event_type): r.n_events for r in rows}
    assert got == truth
    assert truth


def test_minhash_lsh_pairs_invariant_to_bucket_cap(spark):
    """#263: the bucket-cap diversion must be LOSSLESS — the pair set
    (and every jacc value) is identical for any cap, including cap=1
    where EVERY multi-occupant bucket routes through the prefix-filter
    path, and a huge cap where none does."""
    from zmaxion_spark.functions.dedup import minhash_lsh_pairs
    from zmaxion_spark.functions.text import shingles

    d = load_table(spark, SF_SMOKE, "documents")
    toks = F.split("text", " ")
    sh = d.filter(F.size(toks) >= 3).select("doc_id", shingles(toks, 3).alias("s"))

    def pairs(cap):
        return {
            (r.doc_a, r.doc_b, round(r.jacc, 12))
            for r in minhash_lsh_pairs(
                sh, "doc_id", "s", n_hashes=12, band_size=3,
                threshold=0.5, bucket_cap=cap,
            ).collect()
        }

    unguarded = pairs(10**9)
    assert unguarded  # fixture plants near-dups; empty means a bug
    assert pairs(1) == unguarded
    assert pairs(2) == unguarded


def test_kcore_census_monotone(spark):
    """#282: peel rounds can only shrink the graph; the final round's
    counts must be consistent with the converged flag."""
    rows = sorted(_rows(spark, "q_kcore"), key=lambda r: r.round)
    nodes = [r.n_nodes for r in rows]
    edges = [r.n_edges for r in rows]
    assert nodes == sorted(nodes, reverse=True)
    assert edges == sorted(edges, reverse=True)
    flags = {r.converged for r in rows}
    assert len(flags) == 1  # one flag, replicated per census row


def test_bitext_accepted_requires_mutual_and_margin(spark):
    """#283: accepted is exactly (mutual AND margin > threshold)."""
    from zmaxion_spark.queries.llm import _BT_THRESHOLD

    for r in _rows(spark, "q_margin_bitext"):
        assert r.accepted == int(r.mutual == 1 and r.margin > _BT_THRESHOLD)
        assert r.id_a % 2 == 0 and r.id_b % 2 == 1  # sides never mix


def test_pattern_negation_census_adds_up(spark):
    """#285: clean + tainted == with-view <= purchases, per day."""
    for r in _rows(spark, "q_pattern_negation"):
        assert r.n_clean + r.n_tainted == r.n_with_view
        assert r.n_with_view <= r.n_purchases


def test_propensity_match_caliper_and_counts(spark):
    """#284: matched pairs never exceed treated units; ATT is finite;
    matched controls sit within the caliper of their treated unit
    (checked via the emitted propensity means, which must both be
    valid probabilities)."""
    import math

    (r,) = _rows(spark, "q_propensity_match")
    assert 0 < r.n_matched <= r.n_treated
    assert math.isfinite(r.att)
    assert 0.0 <= r.mean_p_treated <= 1.0
    assert 0.0 <= r.mean_p_control <= 1.0


def test_bootstrap_poisson_weights_mean_near_one(spark):
    """#274: the md5 Poisson(1) draw must average ~1 over the fixture
    (inverse-CDF correctness); a wrong cutoff table shifts the mean."""
    from pyspark.sql import functions as F

    from zmaxion_spark.queries.inference_q import _POIS1_CDF

    o = load_table(spark, SF_SMOKE, "orders").limit(2000)
    draws = o.select(
        "o_orderkey", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    ).cast("binary")
                ),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        / F.lit(4503599627370496.0)
    )
    w = F.lit(6)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    stats = draws.select(w.alias("w")).agg(
        F.avg("w").alias("mean"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert abs(stats.mean - 1.0) < 0.05, stats


def test_bleu_precisions_monotone_and_bounded(spark):
    """#288: hyp ⊂ ref per doc ⇒ p1 == 1 exactly (every hyp unigram is
    clipped against a ref count at least as large); longer grams only
    lose matches; BLEU sits strictly under the geometric mean of the
    four precisions because the brevity penalty is strictly < 1."""
    for r in _rows(spark, "q_bleu_eval"):
        assert r.hyp_len < r.ref_len
        assert r.p1 == 1.0
        assert 1.0 >= r.p1 >= r.p2 >= r.p3 >= r.p4 > 0.0
        geo = (r.p1 * r.p2 * r.p3 * r.p4) ** 0.25
        assert 0.0 < r.bleu < geo + 1e-9


def test_ipw_partition_and_ess(spark):
    """#289: treated + control == |customer|; the effective sample
    size can never exceed the actual control count (Cauchy-Schwarz)."""
    import math

    (r,) = _rows(spark, "q_ipw_att")
    n_cust = load_table(spark, SF_SMOKE, "customer").count()
    assert r.n_treated + r.n_control == n_cust
    assert 0 < r.ess_control <= r.n_control
    assert math.isfinite(r.att_ipw)


def test_cohens_kappa_cells_and_bounds(spark):
    """#290: confusion cells partition each language; kappa is
    chance-corrected so it must sit at or below raw agreement po."""
    rows = _rows(spark, "q_cohens_kappa")
    assert rows
    for r in rows:
        assert r.n11 + r.n10 + r.n01 + r.n00 == r.n
        assert 0.0 <= r.po <= 1.0
        assert -1.0 <= r.kappa <= 1.0
        assert r.kappa <= r.po + 1e-9


def test_range_bucket_join_contains_anchor(spark):
    """#291: every anchor interval contains at least its own order, and
    the aggregate sum is consistent with the interval bounds."""
    rows = _rows(spark, "q_range_bucket_join")
    assert len(rows) == 64
    for r in rows:
        assert r.lo_cents < r.hi_cents
        assert r.n_orders >= 1
        assert r.n_orders * r.lo_cents <= r.sum_cents <= r.n_orders * r.hi_cents


def test_twap_differs_from_plain_avg_but_stays_in_range(spark):
    """#292: TWAP must sit inside [min, max] of the series' values and
    the interval sum must cover the series span exactly."""
    e = load_table(spark, SF_SMOKE, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("c")
    )
    bounds = {
        r.event_type: (r.lo, r.hi, r.n)
        for r in e.groupBy("event_type")
        .agg(F.min("c").alias("lo"), F.max("c").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in _rows(spark, "q_time_weighted_avg"):
        lo, hi, n = bounds[r.event_type]
        assert r.n_samples == n
        assert lo / 100.0 <= r.twap <= hi / 100.0
        assert r.span_us > 0


def test_mad_outliers_never_exceed_half(spark):
    """#293: MAD has breakdown point 1/2 — the screen can never flag
    half the data or more, and MAD can never exceed the value range."""
    for r in _rows(spark, "q_mad_anomaly"):
        assert 0 <= r.n_outliers < r.n / 2
        assert r.mad_cents >= 0


def test_rake_topk_shape_and_no_stopwords(spark):
    """#294: exactly ≤10 ranked phrases per language, no stopword ever
    inside a phrase, scores weakly decreasing within a language."""
    from zmaxion_spark.queries.llm import _RAKE_MAXLEN, _RAKE_STOPS

    by_lang: dict = {}
    for r in _rows(spark, "q_rake_keywords"):
        by_lang.setdefault(r.lang, []).append(r)
        assert 1 <= r.n_words <= _RAKE_MAXLEN
        assert not set(r.phrase.split(" ")) & set(_RAKE_STOPS)
    for rows in by_lang.values():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_link_prediction_candidates_are_nonedges(spark):
    """#295: no predicted pair may be an existing edge; Jaccard and AA
    are positive; ranks are dense from 1."""
    rows = _rows(spark, "q_link_prediction")
    assert rows and len(rows) <= 20
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    e = {
        (r.u, r.v)
        for r in a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .collect()
    }
    ranks = sorted(r.rnk for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.u < r.v
        assert (r.u, r.v) not in e
        assert r.cn >= 1
        assert r.aa > 0 and 0 < r.jacc <= 1


def test_user_streaks_partition_active_days(spark):
    """#296: streak lengths sum to distinct active days; the longest
    streak can never exceed the total span of days."""
    e = load_table(spark, SF_SMOKE, "events")
    expected = (
        e.select("user_id", F.col("ts").cast("timestamp").cast("date").alias("d"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    nd = {r.user_id: r.nd for r in expected.collect()}
    rows = _rows(spark, "q_user_streaks")
    assert {r.user_id for r in rows} == set(nd)
    for r in rows:
        assert r.n_active_days == nd[r.user_id]
        assert 1 <= r.longest_streak <= r.n_active_days
        assert r.n_streaks >= 1
        assert r.n_active_days >= r.n_streaks


def _cdc_fps(text: str) -> list:
    """Pure-Python replica of q_cdc_chunk_dedup's chunking: md5-word
    gear hash over 3-token windows, cut when % 16 == 0."""
    import hashlib

    toks = text.split(" ")
    chunks, cur = [], []
    for i, t in enumerate(toks):
        cur.append(t)
        # the cut closes the chunk AT the window-ending token (the SQL
        # running sum over "1 PRECEDING" means a cut at pos j only
        # moves positions AFTER j into the next chunk)
        if i >= 2:
            w = " ".join(toks[i - 2 : i + 1]).encode()
            if int(hashlib.md5(w).hexdigest()[:15], 16) % 16 == 0:
                chunks.append(cur)
                cur = []
    if cur:
        chunks.append(cur)
    return [
        int(hashlib.md5(" ".join(c).encode()).hexdigest()[:15], 16)
        for c in chunks
    ]


def test_cdc_boundaries_survive_prefix_shift(spark):
    """#297: prepending a token must change O(1) chunk fingerprints —
    every boundary decision ≥3 tokens past the edit sees an identical
    window, so only the head chunk(s) re-fingerprint. (A fixed-window
    fragmenter re-fingerprints the whole document under the same
    edit — that asymmetry is CDC's reason to exist.) Also pins the
    Python replica against the Spark/SQL implementation."""
    d = load_table(spark, SF_SMOKE, "documents").limit(100).collect()
    total_changed = 0
    for r in d:
        base = _cdc_fps(r.text)
        shifted = _cdc_fps("prefixshift " + r.text)
        sym = set(base) ^ set(shifted)
        assert len(sym) <= 4, f"doc {r.doc_id}: {len(sym)} chunks changed"
        total_changed += len(sym)
    assert total_changed <= 2.5 * len(d)  # ~O(1) per doc on average

    # replica parity: per-doc chunk counts match the graded query
    got = {r.doc_id: r.n_chunks for r in _rows(spark, "q_cdc_chunk_dedup")}
    for r in d:
        assert got[r.doc_id] == len(_cdc_fps(r.text))


def test_cvar_dominates_var(spark):
    """#298: CVaR is a tail mean, so it must sit at or above VaR; the
    tail must hold between 5% and 5%+1-value-mass of the class."""
    for r in _rows(spark, "q_cvar_tail_risk"):
        assert r.cvar_cents >= r.var95_cents
        assert r.tail_n >= 1
        # ceil(0.05n) <= tail <= ... tail starts AT the rank value
        assert r.tail_n <= r.n  # sanity
        assert r.tail_n >= (r.n - (19 * r.n + 19) // 20) + 1


def test_matryoshka_overlap_monotone_to_one(spark):
    """#299: more prefix dims can only help on average at the
    endpoints — overlap at 64 dims is exactly 1 by construction, and
    every width keeps at least one true neighbor (the query itself)."""
    rows = sorted(_rows(spark, "q_matryoshka_sweep"), key=lambda r: r.dims)
    assert [r.dims for r in rows] == [16, 32, 48, 64]
    assert rows[-1].mean_overlap == 1.0
    for r in rows:
        assert r.denom == 15
        # each query is its own nearest neighbor at every width
        assert r.hits >= 3
        assert 0.0 < r.mean_overlap <= 1.0


def test_weighted_reservoir_favors_heavy_items(spark):
    """#301: exactly k per language with dense ranks and decreasing
    keys; A-ES must over-represent heavy items — the sample's mean
    weight exceeds the corpus mean."""
    rows = _rows(spark, "q_weighted_reservoir")
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
        assert r.weight > 0
    corpus = load_table(spark, SF_SMOKE, "documents")
    mean_w = corpus.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r.weight for r in rows) / len(rows)
    assert sample_mean > mean_w
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        keys = [r.es_key for r in rs]
        assert keys == sorted(keys, reverse=True)


def test_modularity_terms_consistent(spark):
    """#302: Σ d_c == 2m and Σ e_in ≤ m (every within edge counted
    once); each term obeys the modularity bounds."""
    rows = _rows(spark, "q_modularity_score")
    assert rows
    total_d = sum(r.d_c for r in rows)
    total_in = sum(r.e_in for r in rows)
    m = total_d // 2
    assert total_d == 2 * m
    assert total_in <= m
    for r in rows:
        assert -0.25 <= r.q_term <= 1.0
        assert 0 <= r.e_in * 2 <= r.d_c  # within-edges need 2 stubs each


def test_perplexity_bounds(spark):
    """#303: add-one smoothing bounds ppl in (1, c(w1)+V]; a uniform
    upper bound is the smoothed vocabulary mass."""
    rows = _rows(spark, "q_lm_perplexity")
    assert rows
    toks = load_table(spark, SF_SMOKE, "documents").select(
        F.explode(F.split("text", " ")).alias("t")
    )
    v = toks.distinct().count()
    n_bg_total = sum(r.n_bigrams for r in rows)
    for r in rows:
        assert 1.0 < r.ppl <= n_bg_total + v


def test_js_divergence_symmetric_bounds(spark):
    """#304: JS ∈ [0, ln 2]; the pair grid covers every source pair
    exactly once with src_a < src_b."""
    import math

    rows = _rows(spark, "q_js_divergence")
    srcs = set()
    for r in rows:
        assert r.src_a < r.src_b
        assert 0.0 <= r.js <= math.log(2) + 1e-12
        srcs.add(r.src_a)
        srcs.add(r.src_b)
    n = len(srcs)
    assert len(rows) == n * (n - 1) // 2


def test_cross_correlation_lag0_symmetric_bounds(spark):
    """#305: r ∈ [-1, 1]; every pair carries all 7 lags; n shrinks by
    exactly |lag| days off the aligned grid."""
    rows = _rows(spark, "q_cross_correlation")
    by_pair: dict = {}
    for r in rows:
        assert -1.0 - 1e-9 <= r.r <= 1.0 + 1e-9
        by_pair.setdefault((r.pri_a, r.pri_b), {})[r.lag] = r
    for lags in by_pair.values():
        assert sorted(lags) == list(range(-3, 4))
        n0 = lags[0].n
        for lag, r in lags.items():
            assert r.n == n0 - abs(lag)


def test_greedy_coverage_diminishing_returns(spark):
    """#306: gains never increase round over round (submodularity of
    coverage), cumulative coverage increases by exactly the gain, and
    no source is picked twice."""
    rows = sorted(_rows(spark, "q_greedy_coverage"), key=lambda r: r.round)
    # rounds stop early if the universe saturates (sf1's replicated
    # fixture does) — ranks must still be dense from 1
    assert [r.round for r in rows] == list(range(1, len(rows) + 1))
    assert len({r.source for r in rows}) == len(rows) >= 1
    gains = [r.gain for r in rows]
    assert gains == sorted(gains, reverse=True)
    cum = 0
    for r in rows:
        cum += r.gain
        assert r.covered == cum


def test_anova_decomposition(spark):
    """#307: SSB + SSW == SST > 0, F > 0, and η² = SSB/SST ∈ (0, 1)."""
    (r,) = _rows(spark, "q_anova_oneway")
    assert r.ssb > 0 and r.ssw > 0
    assert 0.0 < r.eta_sq < 1.0
    assert abs(r.eta_sq - r.ssb / (r.ssb + r.ssw)) < 1e-6
    assert r.f_stat > 0
    assert r.k >= 2 and r.n > r.k


def test_watermark_audit_monotone_quantiles(spark):
    """#308: lateness quantiles are monotone, bounded by the 600 s
    synthetic delay cap, and the loss fraction shrinks as the
    candidate delay grows."""
    rows = _rows(spark, "q_watermark_audit")
    assert rows
    for r in rows:
        assert 0 <= r.p50_us <= r.p95_us <= r.p99_us <= r.max_us
        assert r.max_us <= 600_000_000
        assert 0.0 <= r.frac_lost_10m <= r.frac_lost_60s <= 1.0


def test_critical_path_monotone_cumulative(spark):
    """#309: the critical cumulative duration strictly increases with
    depth (every edge adds ≥1), and frontier sizes follow the binary
    tree until the key domain truncates it."""
    rows = sorted(_rows(spark, "q_critical_path"), key=lambda r: r.depth)
    assert rows[0].depth == 0 and rows[0].n_nodes == 1
    for a, b in zip(rows, rows[1:]):
        assert b.max_cum > a.max_cum
        assert b.n_nodes <= 2 * a.n_nodes
        assert a.max_cum <= 100 * (a.depth + 1)


def test_top_paths_census_shape(spark):
    """#310: dense ranks, counts weakly decreasing, paths non-empty
    with ≤8 steps, and the top-path session count never exceeds the
    total session count."""
    rows = sorted(_rows(spark, "q_top_paths"), key=lambda r: r.rnk)
    assert rows
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        steps = r.path.split(">")
        assert 1 <= len(steps) <= 8
        assert len(steps) == r.path_len
        assert all(x for x in steps)


def test_bitemporal_restatement_visible(spark):
    """#311: version 1 (corrected) can only know MORE users than
    version 0 (as-arrived), and the late stragglers must actually
    restate something — the two censuses differ."""
    rows = _rows(spark, "q_bitemporal_asof")
    v0 = {r.event_type: r.n_users for r in rows if r.version == 0}
    v1 = {r.event_type: r.n_users for r in rows if r.version == 1}
    assert v0 and v1
    assert sum(v1.values()) >= sum(v0.values())
    # restatement (v0 != v1) is guaranteed on the graded sf0.01 fixture
    # by the 5% week-late cohort; the tiny smoke fixture may have no
    # straggler whose absence flips a state, so only the direction of
    # knowledge growth is asserted here


def test_conformance_fitness_bounds(spark):
    """#312: counts are consistent and fitness ∈ [0, 1]; conformant
    users cannot exceed total users."""
    (r,) = _rows(spark, "q_conformance_fitness")
    assert 0 < r.n_ok <= r.n_moves
    assert 0.0 < r.corpus_fitness <= 1.0
    assert 0 <= r.n_conformant <= r.n_users


def test_degree_assortativity_bounds(spark):
    """#313: a correlation in [-1, 1] over a real edge census."""
    (r,) = _rows(spark, "q_degree_assortativity")
    assert r.n_edges > 0
    assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9


def test_peak_concurrency_bounds(spark):
    """#314: peak is at least 1, at most the user count (one open
    session per user at a time by construction of gap sessions)."""
    (r,) = _rows(spark, "q_peak_concurrency")
    n_users = load_table(spark, SF_SMOKE, "events").select(
        "user_id"
    ).distinct().count()
    assert 1 <= r.peak_concurrent <= n_users
    assert r.n_sessions >= r.peak_concurrent
    assert r.peak_at_us > 0


def test_stream_twap_matches_batch(spark):
    """#315: the streaming state must reproduce the batch TWAP
    exactly, key by key."""
    batch = {
        r.event_type: (r.n_samples, r.span_us, r.twap)
        for r in _rows(spark, "q_time_weighted_avg")
    }
    stream = {
        r.event_type: (r.n_samples, r.span_us, r.twap)
        for r in _rows(spark, "q_stream_twap")
    }
    assert stream == batch


def test_golden_record_survivorship_rules(spark):
    """#316: one golden row per entity; merged entities keep the
    longest name variant and never surface the NULL balance."""
    rows = _rows(spark, "q_golden_record")
    ids = [r.entity_id for r in rows]
    assert len(ids) == len(set(ids))
    merged = [r for r in rows if r.n_records > 1]
    assert merged  # the %5 variants guarantee some
    for r in merged:
        assert r.bal is not None
        assert r.segment == "retail"  # majority is always lowercase
        # longest-name rule: the dirty variants are longer than the
        # base "Customer#000000123" only when padding shrinks — just
        # assert non-empty and that a name was chosen deterministically
        assert r.name


def test_embargoed_split_zero_leaks_and_partition(spark):
    """#317: splits partition the rows, the embargo band is non-empty,
    and the leak audit is zero by construction."""
    rows = _rows(spark, "q_embargoed_split")
    by = {r.split: r for r in rows}
    assert set(by) == {"train", "embargo", "test"}
    total = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n_rows for r in rows) == total
    assert all(r.n_leaks == 0 for r in rows)
    assert by["embargo"].n_rows > 0


def test_dispersion_index_positive(spark):
    """#318: dispersion is positive and the flag matches the ratio."""
    for r in _rows(spark, "q_dispersion_index"):
        assert r.mean_per_day > 0
        assert r.dispersion > 0
        assert r.overdispersed == int(r.dispersion > 1.5)


def test_lsh_plan_scurve_properties(spark):
    """#319: capture probability increases with s for every config;
    more bands (fewer rows) shift the threshold s* DOWN."""
    rows = sorted(_rows(spark, "q_lsh_plan"), key=lambda r: r.b)
    assert len(rows) == 8
    for r in rows:
        # 0.3^24 quantizes to exactly 0 at 1e-9 — equality is real
        assert 0.0 <= r.p_at_030 <= r.p_at_050 <= r.p_at_070 <= 1.0
        assert 0.0 < r.s_star <= 1.0
    stars = [r.s_star for r in rows]  # b ascending => r descending
    assert stars == sorted(stars, reverse=True)


def test_anyorder_completion_census(spark):
    """#320: users partition by types-touched; within-window
    completions only exist where all three types were touched."""
    rows = {r.n_types: r for r in _rows(spark, "q_anyorder_completion")}
    assert set(rows) <= {1, 2, 3}
    for n, r in rows.items():
        if n < 3:
            assert r.n_within_window == 0
            assert r.min_spread_us is None
        else:
            assert 0 <= r.n_within_window <= r.n_users
            assert r.min_spread_us >= 0


def test_zipf_fit_negative_slope(spark):
    """#321: rank-frequency slope over count data is non-positive by
    construction (frequency cannot rise with rank)."""
    (r,) = _rows(spark, "q_zipf_fit")
    assert r.n_keys > 1
    assert r.zipf_slope <= 0.0
    assert r.skew_cacheable == int(r.zipf_slope <= -0.5)


def test_mann_kendall_s_bounds(spark):
    """#322: |S| is bounded by the number of day pairs and the flag
    matches the z threshold."""
    rows = _rows(spark, "q_mann_kendall")
    assert rows
    for r in rows:
        n_pairs = r.n * (r.n - 1) // 2
        assert abs(r.s) <= n_pairs
        assert r.trending == int(abs(r.z) > 1.96)


def test_bloom_plan_meets_target(spark):
    """#323: the sized filter's actual fp rate lands at or below ~1.1×
    the target (integerizing m up and k to nearest keeps it close),
    and more keys at the same target always cost more bits."""
    rows = _rows(spark, "q_bloom_plan")
    assert len(rows) == 9
    for r in rows:
        assert r.actual_fp <= r.p * 1.1
        assert r.k >= 1 and r.m_bits > r.n
    by_p: dict = {}
    for r in rows:
        by_p.setdefault(r.p, []).append(r)
    for rs in by_p.values():
        rs.sort(key=lambda r: r.n)
        bits = [r.m_bits for r in rs]
        assert bits == sorted(bits)


def test_er_quality_tradeoff(spark):
    """#324: predictions grow with the threshold, recall is
    non-decreasing, and tp never exceeds either side."""
    rows = sorted(_rows(spark, "q_er_quality"), key=lambda r: r.threshold)
    assert len(rows) == 4
    preds = [r.n_pred for r in rows]
    recalls = [r.recall_ for r in rows]
    assert preds == sorted(preds)
    assert recalls == sorted(recalls)
    for r in rows:
        assert r.tp <= min(r.n_pred, r.n_truth)
        assert 0.0 <= r.precision_ <= 1.0 and 0.0 <= r.recall_ <= 1.0


def test_f1_eval_consistent(spark):
    """#325: per-class F1 is the harmonic mean of its own p/r, and
    Σtp + Σfn equals the corpus size (every doc has one true class)."""
    rows = _rows(spark, "q_f1_eval")
    total = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.tp + r.fn for r in rows) == total
    for r in rows:
        if r.precision_ + r.recall_ > 0:
            hm = 2 * r.precision_ * r.recall_ / (r.precision_ + r.recall_)
            assert abs(r.f1 - hm) < 1e-6


def test_archetype_census_partitions_entities(spark):
    """#326: per tick, archetype counts sum to the entity count;
    migrations are bounded by |entities| and the tick-1 census
    actually differs (the systems DO something)."""
    rows = _rows(spark, "q_ecs_archetype_census")
    n_ent = load_table(spark, SF_SMOKE, "customer").count()
    t0 = {r.arch: r.n_entities for r in rows if r.tick == 0}
    t1 = {r.arch: r.n_entities for r in rows if r.tick == 1}
    assert sum(t0.values()) == sum(t1.values()) == n_ent
    m = rows[0].n_migrated
    assert 0 < m <= n_ent
    assert t0 != t1


# ---------------------------------------------------------------------------
# Round-6 session operators: reference-implementation properties
# ---------------------------------------------------------------------------


def test_substring_dedup_extents_match_brute_force(spark):
    """#337: the LEAD-window extent merge must equal the brute-force
    position-set union on adversarial doc sets (overlaps, abutting
    runs, full-doc dups, singletons)."""
    import itertools

    K = 4  # small gram width so tiny docs exercise every branch
    docs = [
        (0, "abcdefghij"),          # shares 'cdef' with doc 1
        (1, "xxcdefxxxx"),
        (2, "abcdefghij"),          # full duplicate of doc 0
        (3, "zzzzzzzzzz"),          # self-repeating gram
        (4, "qrstuv"),              # unique — no dup extents
    ]
    # Brute force: duplicated gram sites -> per-doc covered char sets.
    sites: dict[str, list[tuple[int, int]]] = {}
    for did, text in docs:
        for p in range(len(text) - K + 1):
            sites.setdefault(text[p : p + K], []).append((did, p))
    covered: dict[int, set[int]] = {d: set() for d, _ in docs}
    for gram, locs in sites.items():
        if len(locs) >= 2:
            for did, p in locs:
                covered[did].update(range(p, p + K))
    expect = {d: len(s) for d, s in covered.items() if s}

    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    from pyspark.sql import Window

    n = F.length("text")
    s = (
        df.filter(n >= K)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), n - (K - 1))).alias("p"),
            "text",
        )
        .select("doc_id", "p", F.expr(f"substring(text, p, {K})").alias("g"))
        .withColumn("c", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .filter(F.col("c") >= 2)
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    got = {
        r["doc_id"]: r["dup"]
        for r in s.withColumn(
            "cov",
            F.least(
                F.lit(K),
                F.coalesce(F.lead("p").over(w) - F.col("p"), F.lit(K)),
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("cov").alias("dup"))
        .collect()
    }
    assert got == expect


def test_jaro_winkler_udf_matches_duckdb_builtin(spark):
    """#353: the pandas-UDF Jaro-Winkler must equal DuckDB's built-in
    on a fresh random corpus (not just the fixture strings)."""
    import random
    import string

    import duckdb

    from zmaxion_spark.queries.governance_q import _jw_pandas

    rng = random.Random(99)
    pairs = [
        (
            "".join(rng.choices(string.ascii_lowercase[:8], k=rng.randint(1, 12))),
            "".join(rng.choices(string.ascii_lowercase[:8], k=rng.randint(1, 12))),
        )
        for _ in range(500)
    ]
    df = spark.createDataFrame(pairs, "a STRING, b STRING")
    jw = _jw_pandas()
    got = [r["s"] for r in df.select(jw("a", "b").alias("s")).collect()]
    con = duckdb.connect()
    want = [
        con.execute("SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        for a, b in pairs
    ]
    assert all(abs(g - w) < 1e-12 for g, w in zip(got, want))


def test_ewma_fold_matches_python_reference(spark):
    """#344: the aggregate() EWMA fold (with the recursive variance-
    inflation term) must equal a plain Python loop."""
    xs = [3.0, 7.0, 2.0, 9.0, 9.0, 1.0, 4.0]
    mu = sum(xs) / len(xs)
    sx2 = sum(x * x for x in xs)
    sigma = ((sx2 - sum(xs) * sum(xs) / len(xs)) / len(xs)) ** 0.5
    z, c, n_ooc = mu, 1.0, 0
    for x in xs:
        z = 0.2 * x + 0.8 * z
        c = c * 0.64
        half = 3.0 * sigma * (0.2 / 1.8 * (1 - c)) ** 0.5
        if abs(z - mu) > half:
            n_ooc += 1
    df = spark.createDataFrame(
        [(i, "s", x) for i, x in enumerate(xs)], "d INT, k STRING, xi DOUBLE"
    )
    from zmaxion_spark.queries.timeseries_q import q_ewma_chart  # noqa: F401

    # Reuse the fold shape inline (the query binds to the events
    # fixture; here we drive the same expressions on a toy frame).
    series = df.groupBy("k").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "xi"))), lambda s: s["xi"]
        ).alias("ys"),
        F.count(F.lit(1)).alias("n"),
        F.sum("xi").alias("sx"),
        F.sum(F.col("xi") * F.col("xi")).alias("sx2"),
    )
    mu_c = F.col("sx") / F.col("n")
    sig_c = F.sqrt(
        (F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")) / F.col("n")
    )
    par = series.select("ys", mu_c.alias("mu"), sig_c.alias("sigma"))

    def step(acc, x):
        z_new = F.lit(0.2) * x + F.lit(0.8) * acc["z"]
        c_new = acc["c"] * F.lit(0.64)
        half = F.lit(3.0) * F.col("sigma") * F.sqrt(
            F.lit(0.2) / F.lit(1.8) * (F.lit(1.0) - c_new)
        )
        return F.struct(
            z_new.alias("z"),
            c_new.alias("c"),
            (acc["n"] + (F.abs(z_new - F.col("mu")) > half).cast("int")).alias(
                "n"
            ),
        )

    init = F.struct(
        F.col("mu").alias("z"), F.lit(1.0).alias("c"), F.lit(0).alias("n")
    )
    row = par.select(F.aggregate("ys", init, step).alias("st")).collect()[0]
    assert abs(row["st"]["z"] - z) < 1e-12
    assert row["st"]["n"] == n_ooc


# ---------------------------------------------------------------------------
# Round-7 statistical-reference tests (ADVICE r6): each statistic is
# recomputed by an independent pure-Python implementation with explicit
# midranks / micro-second arithmetic and compared to the query output.
# ---------------------------------------------------------------------------


def _midranks(values):
    """scipy.stats.rankdata(method='average') on a small list."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(values):
        j = i
        while j + 1 < len(values) and (
            values[order[j + 1]] == values[order[i]]
        ):
            j += 1
        avg = (i + j) / 2.0 + 1.0
        for t in range(i, j + 1):
            ranks[order[t]] = avg
        i = j + 1
    return ranks


def test_friedman_matches_python_midrank_reference(spark):
    """#371: the integer 2·rank Friedman must equal the classical
    tie-corrected statistic computed with explicit float midranks
    (the scipy.stats.friedmanchisquare formula) on the real fixture."""
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
    cnt = {(r.event_type, r.d): r.x for r in ev}
    types = sorted({r.event_type for r in ev})
    dmin = min(r.d for r in ev)
    dmax = max(r.d for r in ev)
    days = list(range(dmin, dmax + 1))
    n, k = len(days), len(types)
    rank_sums = {t: 0.0 for t in types}
    a_sq = 0.0
    for d in days:
        row = [cnt.get((t, d), 0) for t in types]
        rks = _midranks(row)
        for t, r in zip(types, rks):
            rank_sums[t] += r
            a_sq += r * r
    ssd = sum((rank_sums[t] - n * (k + 1) / 2.0) ** 2 for t in types)
    denom = a_sq - n * k * (k + 1) ** 2 / 4.0
    chi_ref = (k - 1) * ssd / denom
    got = _rows(spark, "q_friedman_test")[0]
    assert got.n_blocks == n and got.k == k
    assert abs(got.friedman_chi2 - chi_ref) < 1e-6, (
        got.friedman_chi2,
        chi_ref,
    )
    assert got.significant == int(chi_ref > 9.487729036781154)


def test_friedman_no_ties_toy_example():
    """The pure-python reference itself, pinned on a no-ties 6x4 grid
    against the closed-form 12/(n·k·(k+1))·ΣR²-3n(k+1) formula."""
    rows = [
        [1, 2, 3, 4],
        [2, 1, 4, 3],
        [1, 3, 2, 4],
        [1, 2, 4, 3],
        [2, 1, 3, 4],
        [1, 2, 3, 4],
    ]
    n, k = len(rows), 4
    rank_sums = [0.0] * k
    a_sq = 0.0
    for row in rows:
        rks = _midranks(row)
        for j, r in enumerate(rks):
            rank_sums[j] += r
            a_sq += r * r
    ssd = sum((s - n * (k + 1) / 2.0) ** 2 for s in rank_sums)
    chi_tie = (k - 1) * ssd / (a_sq - n * k * (k + 1) ** 2 / 4.0)
    chi_closed = 12.0 / (n * k * (k + 1)) * sum(
        s * s for s in rank_sums
    ) - 3.0 * n * (k + 1)
    assert abs(chi_tie - chi_closed) < 1e-12


def test_mcnemar_edwards_clamp_consistent(spark):
    """#367: chi2_cc must equal max(|b-c|-1, 0)^2/(b+c) recomputed from
    the query's own discordant cells (Edwards' clamp: b == c -> 0)."""
    got = _rows(spark, "q_mcnemar_test")[0]
    b, c = got.heur_only, got.nb_only
    if b + c == 0:
        ref = 0.0
    else:
        ref = max(abs(b - c) - 1.0, 0.0) ** 2 / (b + c)
    assert abs(got.chi2_cc - ref) < 1e-9
    assert got.significant == int(ref > 3.841458820694124)
    # the clamp itself: equal discordants must give exactly zero
    assert max(abs(3 - 3) - 1.0, 0.0) ** 2 / 6 == 0.0


def test_logrank_matches_python_reference(spark):
    """#359: full pure-Python logrank on the fixture — life_days from
    MICROSECOND differences (floor-div), matching the oracle's
    EPOCH_US discipline rather than per-endpoint second truncation."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t0"), F.max("us").alias("t1"))
        .collect()
    )
    gmax = max(r.t1 for r in ev)
    cutoff = gmax - 12 * 3600 * 1_000_000
    spans = [
        (r.user_id % 2, (r.t1 - r.t0) // 86_400_000_000, int(r.t1 < cutoff))
        for r in ev
    ]
    times = sorted({t for _, t, _ in spans})
    o1 = 0
    e1 = 0.0
    v = 0.0
    for t in times:
        d1 = sum(ch for g, lt, ch in spans if g == 1 and lt == t)
        d = sum(ch for _, lt, ch in spans if lt == t)
        if d == 0:
            continue
        n1 = sum(1 for g, lt, _ in spans if g == 1 and lt >= t)
        n = sum(1 for _, lt, _ in spans if lt >= t)
        ratio = n1 / n
        o1 += d1
        e1 += d * ratio
        if n > 1:
            v += d * ratio * (1 - ratio) * (n - d) / (n - 1)
    got = _rows(spark, "q_logrank_test")[0]
    assert got.observed_g1 == o1
    assert abs(got.expected_g1 - e1) < 1e-6
    chi_ref = (o1 - e1) ** 2 / v
    assert abs(got.chi2 - chi_ref) < 1e-6
    assert got.significant == int(abs((o1 - e1) / v**0.5) > 1.96)
