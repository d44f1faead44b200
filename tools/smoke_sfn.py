"""Time registry queries against a scaled fixture (Spark side only).

Usage: python tools/smoke_sfn.py <sf_dir> [budget_sec] [name ...]

One warm session, sequential execution, per-query watchdog: a query
that exceeds the budget has its jobs cancelled and is reported as
CANCELLED rather than wedging the sweep (replication fixtures make
dedup-family candidate pairs grow quadratically in the duplication
factor, which is adversarial by construction). Prints one line per
query and a JSON summary; pair with SCALE.md's measured-decade table.
"""

from __future__ import annotations

import json
import sys
import threading
import time

sys.path.insert(0, ".")

from zmaxion_spark.queries import REGISTRY  # noqa: E402
from zmaxion_spark.session import get_spark  # noqa: E402

_DEFAULT = [
    "q01_pricing_summary",
    "q_approx_bounds",
    "q_embedding_covariance",
    "q_recursive_bom",
    "q_corpus_to_shards",
    "q21_blocking_suppliers",
    "q_shortest_path",
    "q_triangle_count",
    "q_pagerank_nations",
    "q_join_salted",
    "q_ecs_schedule",
    "q_media_decode",
    "q_sim_topk_search",
    "q_sim_join_exact",
    "q_bpe_train",
    "q_sessionize",
    "q_stream_tumbling",
    "q_dedup_minhash_lsh",
    "q_dedup_threshold_sweep",
]


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    sf_dir = args[0]
    budget = float(args[1]) if len(args) > 1 else 600.0
    names = args[2:] or _DEFAULT
    spark = get_spark("smoke-sfn")
    sc = spark.sparkContext
    out: dict[str, float | str] = {}
    for name in names:
        cancel = threading.Timer(budget, sc.cancelAllJobs)
        cancel.start()
        t0 = time.time()
        try:
            n = REGISTRY[name].fn(spark, sf_dir).count()
            dt = time.time() - t0
            out[name] = round(dt, 1)
            print(f"OK        {name}: {n} rows in {dt:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            dt = time.time() - t0
            if dt >= budget - 1:
                out[name] = f"cancelled@{budget:.0f}s"
                print(f"CANCELLED {name} after {dt:.1f}s", flush=True)
            else:
                out[name] = f"error: {type(e).__name__}"
                print(f"ERROR     {name}: {type(e).__name__}: {e}", flush=True)
        finally:
            cancel.cancel()
    print(json.dumps({"sf_dir": sf_dir, "sec": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
