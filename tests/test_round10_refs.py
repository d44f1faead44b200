"""Round-10 reference tests — the blocked pair operator and the
q_semdedup_big scale contract (verdict r9 #4)."""

from __future__ import annotations

from itertools import combinations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE
from zmaxion_spark.functions.dedup import blocked_cluster_pairs
from zmaxion_spark.queries import REGISTRY


def test_blocked_cluster_pairs_matches_naive(spark):
    """The blocked triangle join must enumerate EXACTLY the naive
    within-cluster pair set, each unordered pair once — cluster sizes
    straddle the block size so diagonal and off-diagonal cells are
    both exercised."""
    rows = [
        (cid, cid * 1000 + i, [float(cid), float(i)])
        for cid, n in [(0, 1), (1, 3), (2, 7), (3, 16)]
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "cluster int, vec_id long, v array<double>")
    got = {
        (r.cluster, min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in blocked_cluster_pairs(df, block=4).collect()
    }
    want = {
        (cid, min(a, b), max(a, b))
        for cid, n in [(0, 1), (1, 3), (2, 7), (3, 16)]
        for a, b in combinations([cid * 1000 + i for i in range(n)], 2)
    }
    assert got == want
    # Each unordered pair exactly once (no diagonal double-emit).
    all_rows = blocked_cluster_pairs(df, block=4).collect()
    assert len(all_rows) == len(want)


def test_blocked_cluster_pairs_plan_has_no_hot_cluster_key(spark):
    """The pair join must run on the composite (cluster, _bi, _bj)
    key, not the bare cluster key — grep the executed plan for the
    block columns in the join and assert no CartesianProduct."""
    df = spark.createDataFrame(
        [(0, i, [float(i)]) for i in range(40)],
        "cluster int, vec_id long, v array<double>",
    )
    plan = (
        blocked_cluster_pairs(df, block=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "_bi" in plan and "_bj" in plan


def test_semdedup_big_exercises_multi_block_clusters(spark):
    """The scale contract is only a contract if blocks are LIVE: with
    k=32 over the amplified cloud, cluster sizes must exceed the pair
    block so multi-block triangle cells actually run (at every sf)."""
    from zmaxion_spark.queries.round10_q import _SDB_BLOCK, _SDB_K, _SDB_REPL

    out = REGISTRY["q_semdedup_big"].fn(spark, SF_SMOKE).collect()
    by_cluster = {r.cluster: r.n_vecs for r in out}
    assert len(by_cluster) == _SDB_K
    n_total = sum(by_cluster.values())
    assert n_total == 500 * _SDB_REPL  # every replica assigned once
    assert max(by_cluster.values()) > _SDB_BLOCK, (
        "largest cluster fits one block — the contract isn't exercising "
        "the multi-block path; shrink _SDB_BLOCK or grow _SDB_REPL"
    )
    # Drop census sanity: monotone non-increasing in tau per cluster,
    # and replicas guarantee drops exist at the lowest tau somewhere.
    for cid in by_cluster:
        drops = {
            r.tau_pct: r.n_dropped for r in out if r.cluster == cid
        }
        taus = sorted(drops)
        assert all(
            drops[taus[i]] >= drops[taus[i + 1]] for i in range(len(taus) - 1)
        )
        assert all(drops[t] < by_cluster[cid] for t in taus)
    assert sum(r.n_dropped for r in out) > 0
