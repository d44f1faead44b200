"""Round-12 optimization parity tests.

Same discipline as test_opt_r11: every optimization that rewires an
operator's internals gets a focused bit-parity test — the fast path
must produce byte-identical results to the expression tree it
replaced (the driver's oracle gate hashes packed doubles).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_dot_arrow_bit_parity(spark):
    """dot_arrow must match the interpreted zip_with/aggregate left
    fold bit-for-bit, including on fold-order-sensitive vectors where
    a pairwise (numpy-sum-style) order would diverge."""
    from zmaxion_spark.functions import similarity as S

    dim = 8
    rows = []
    # deterministic pseudo-random pairs
    for i in range(257):
        va = [float(((i * 31 + j * 17) % 13) - 6) / 3.0 for j in range(dim)]
        vb = [float(((i * 7 + j * 29) % 11) - 5) / 7.0 for j in range(dim)]
        rows.append((i, va, vb))
    # fold-order-sensitive: big/small cancellation — ((0+1e16)+1)-1e16
    # loses the 1, a pairwise order may not. Parity requires the SAME
    # loss on both paths.
    rows.append((1000, [1e16, 1.0, -1e16, 1.0, 0.0, 0.0, 0.0, 0.0],
                 [1.0] * dim))
    rows.append((1001, [1.0, 1e16, 1.0, -1e16, 0.0, 0.0, 0.0, 0.0],
                 [1.0] * dim))
    # signed zero first element: fold starts at +0.0, 0.0 + (-0.0) = +0.0
    rows.append((1002, [-0.0] * dim, [1.0] * dim))
    # subnormals
    rows.append((1003, [5e-324, 5e-324] + [0.0] * (dim - 2), [1.0] * dim))
    df = spark.createDataFrame(
        rows, "id long, va array<double>, vb array<double>"
    )
    both = df.select(
        "id",
        S.dot(F.col("va"), F.col("vb")).alias("slow"),
        S.dot_arrow(F.col("va"), F.col("vb")).alias("fast"),
    ).collect()
    for r in both:
        # bit-equality (covers -0.0 vs +0.0), not just ==
        assert math.copysign(1.0, r["slow"]) == math.copysign(1.0, r["fast"])
        assert r["slow"] == r["fast"], (r["id"], r["slow"], r["fast"])
