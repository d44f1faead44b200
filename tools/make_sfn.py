"""Scale a fixture directory N× by FK-consistent replication.

Usage: python tools/make_sfn.py [N] [src_sf_dir] [dst_dir]
Defaults: 10 /root/testdata/sf0.1 .scratch/sf1

Each copy i offsets every key column by i * (max_key + 1) of its
domain, so join fan-outs and group cardinalities scale linearly the
way a real bigger TPC-H generation would (nation/region stay fixed —
they are bounded dims at every scale). This is the measured decade
between the graded sf0.1 bench and SCALE.md's 100 TB arguments:
queries must hold their plan shape and scale near-linearly on data
10× past anything the driver runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zmaxion_spark.session import get_spark  # noqa: E402

# table -> columns that carry each key domain
_DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}
_COPY_AS_IS = ["nation", "region"]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else ".scratch/sf1"
    os.makedirs(dst, exist_ok=True)
    spark = get_spark("make-sfn")

    # Per-domain stride = max+1, computed once from the source.
    table_cols: dict[str, list[tuple[str, int]]] = {}
    strides: dict[str, int] = {}
    for dom, sites in _DOMAINS.items():
        t0, c0 = sites[0]
        df = spark.read.parquet(f"{src}/{t0}.parquet")
        strides[dom] = int(df.agg(F.max(c0)).collect()[0][0]) + 1
        for t, c in sites:
            table_cols.setdefault(t, []).append((c, strides[dom]))

    for t in _COPY_AS_IS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"{t}: copied")

    for t, cols in table_cols.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        parts = []
        for i in range(n):
            df = base
            for c, stride in cols:
                df = df.withColumn(c, (F.col(c) + F.lit(i * stride)).cast("long"))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: x{n} -> {out.count()} rows")

    spark.stop()


if __name__ == "__main__":
    main()
