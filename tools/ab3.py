"""Three-state alternating A/B (old/mid/new via ZMX_AB), min-of-N.

Usage: python tools/ab3.py <query> [cycles]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zmaxion_spark.queries import REGISTRY  # noqa: E402
from zmaxion_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STATES = os.environ.get("ZMX_AB3_STATES", "old,mid,new").split(",")


def run_one(spark, name: str) -> float:
    t0 = time.time()
    REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    name = sys.argv[1]
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab3")
    os.environ["ZMX_AB"] = STATES[0]
    run_one(spark, name)  # warm-up
    times = {s: [] for s in STATES}
    for c in range(cycles):
        for s in STATES:
            os.environ["ZMX_AB"] = s
            spark.sparkContext.setJobDescription(f"ab3 {s}#{c} {name}")
            times[s].append(run_one(spark, name))
        print(
            f"cycle {c}: "
            + " ".join(f"{s} {times[s][-1]:.2f}s" for s in STATES),
            flush=True,
        )
    for s in STATES:
        ts = times[s]
        print(f"{s:>5}: min {min(ts):.2f}s  {[round(t, 2) for t in ts]}")


if __name__ == "__main__":
    main()
