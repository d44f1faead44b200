"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its oracle on DuckDB at the
given scale factor and prints PASS/FAIL per query.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from zmaxion_spark.queries import REGISTRY  # noqa: E402
from zmaxion_spark.session import get_spark  # noqa: E402
from zmaxion_spark.testing import duckdb_connect, run_query_pair  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or list(REGISTRY)
    spark = get_spark("oracle-check")
    con = duckdb_connect(sf_dir)
    failures = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            res = run_query_pair(spark, con, q, sf_dir)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL  {name}: exception {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if res:
            print(f"PASS  {name}: {res.detail} [{dt:.1f}s]")
        else:
            failures += 1
            print(f"FAIL  {name}: {res.detail} [{dt:.1f}s]")
    print(f"\n{len(names) - failures}/{len(names)} passed at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
