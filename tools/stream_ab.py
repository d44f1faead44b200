"""Streaming state-store lever A/B (round-12, VERDICT r11 item 2).

Usage: python tools/stream_ab.py <query> [cycles]

Levers that CANNOT change results (same topology, same watermark, same
emitted rows): state-store provider (HDFS-backed vs RocksDB), the
ZMX_STREAM_SHUFFLE state partition count, and RocksDB changelog
checkpointing. Alternates all configs within each cycle so host drift
cancels; verifies the final result rows are identical across configs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zmaxion_spark.queries import REGISTRY  # noqa: E402
from zmaxion_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)

ALL_CONFIGS = [
    ("hdfs-8", HDFS, "8", None),
    ("hdfs-4", HDFS, "4", None),
    ("hdfs-16", HDFS, "16", None),
    ("hdfs-32", HDFS, "32", None),
    ("rocks-8", ROCKS, "8", "false"),
    ("rocks-chlog-8", ROCKS, "8", "true"),
    ("rocks-chlog-4", ROCKS, "4", "true"),
    ("hdfs-2", HDFS, "2", None),
    ("hdfs-6", HDFS, "6", None),
]
_sel = os.environ.get("ZMX_STREAM_AB_CONFIGS")
CONFIGS = (
    [c for c in ALL_CONFIGS if c[0] in _sel.split(",")] if _sel else ALL_CONFIGS[:6]
)


def run_one(spark, name: str):
    t0 = time.time()
    df = REGISTRY[name].fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    rows = sorted(map(tuple, df.collect()))
    return dt, rows


def main() -> None:
    if len(sys.argv) < 2:
        print("usage: python tools/stream_ab.py <query> [cycles]", file=sys.stderr)
        sys.exit(2)
    name = sys.argv[1]
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("stream-ab")
    base_rows = None
    times: dict[str, list[float]] = {k: [] for k, *_ in CONFIGS}
    # warm-up with the current default, untimed
    os.environ["ZMX_STREAM_SHUFFLE"] = "8"
    run_one(spark, name)
    for c in range(cycles):
        for tag, provider, shuffle_n, chlog in CONFIGS:
            spark.conf.set(PROVIDER_KEY, provider)
            os.environ["ZMX_STREAM_SHUFFLE"] = shuffle_n
            if chlog is not None:
                spark.conf.set(CHANGELOG_KEY, chlog)
            spark.sparkContext.setJobDescription(f"{name} {tag} #{c}")
            dt, rows = run_one(spark, name)
            times[tag].append(dt)
            if base_rows is None:
                base_rows = rows
            elif rows != base_rows:
                print(f"RESULT MISMATCH under {tag}!", file=sys.stderr)
                sys.exit(1)
            print(f"cycle {c} {tag}: {dt:.2f}s", flush=True)
    spark.conf.set(PROVIDER_KEY, HDFS)
    os.environ["ZMX_STREAM_SHUFFLE"] = "8"
    print(f"== {name} (rows identical across configs: {len(base_rows)}) ==")
    for tag, *_ in CONFIGS:
        ts = times[tag]
        print(f"{tag:>14}: min {min(ts):.2f}s  {[round(t, 2) for t in ts]}")


if __name__ == "__main__":
    main()
