"""Alternating same-session A/B timer (round-12 protocol).

Usage: python tools/ab.py <query> [cycles]

Requires the query function to read os.environ["ZMX_AB"] ("old"/"new")
at BUILD time (a temporary toggle inserted while the experiment runs;
removed once a winner is kept). Each cycle times old then new with the
noop sink in one session, so JVM/codegen/footer warm-up cancels out.
Prints per-cycle pairs and the min-of-N verdict.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zmaxion_spark.queries import REGISTRY  # noqa: E402
from zmaxion_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_one(spark, name: str) -> float:
    t0 = time.time()
    REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    if len(sys.argv) < 2:
        print("usage: python tools/ab.py <query> [cycles]", file=sys.stderr)
        sys.exit(2)
    name = sys.argv[1]
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if name not in REGISTRY:
        print(f"ab: unknown query {name}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark("ab")
    spark.sparkContext.setJobDescription(f"ab-warmup {name}")
    os.environ["ZMX_AB"] = "old"
    run_one(spark, name)  # warm-up, untimed
    olds, news = [], []
    for c in range(cycles):
        os.environ["ZMX_AB"] = "old"
        spark.sparkContext.setJobDescription(f"ab old#{c} {name}")
        olds.append(run_one(spark, name))
        os.environ["ZMX_AB"] = "new"
        spark.sparkContext.setJobDescription(f"ab new#{c} {name}")
        news.append(run_one(spark, name))
        print(f"cycle {c}: old {olds[-1]:.2f}s new {news[-1]:.2f}s", flush=True)
    mo, mn = min(olds), min(news)
    verdict = "NEW WINS" if mn < mo else "OLD WINS"
    print(
        f"{name}: old min {mo:.2f}s {[round(x, 2) for x in olds]} | "
        f"new min {mn:.2f}s {[round(x, 2) for x in news]} -> {verdict}"
    )


if __name__ == "__main__":
    main()
