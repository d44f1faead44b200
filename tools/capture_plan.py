"""Capture one query's .explain("formatted") to plans/<round>/<q>_<tag>.txt.

Usage: python tools/capture_plan.py <tag> <query> [query ...]
The round subdir defaults to r12 (override with ZMX_PLAN_ROUND).
Optimization evidence (guide §1.2/§7.2): the judge checks plan
claims (Exchange counts, join strategy, pushdown) against these files.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zmaxion_spark.queries import REGISTRY  # noqa: E402
from zmaxion_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("ZMX_PLAN_ROUND", "r12"),
)


def main() -> None:
    if len(sys.argv) < 3:
        print("usage: python tools/capture_plan.py <tag> <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    tag = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"capture_plan: unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plan-capture")
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
