"""Round-11 optimization parity tests.

Every optimization that rewires an operator's internals gets a focused
bit-parity test here: the fast path must produce byte-identical results
to the expression tree it replaced (not just "close" — the driver's
oracle gate hashes packed doubles).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _hof_best(cents: dict[int, list[float]]):
    """The pre-r11 interpreted shape: k zip_with/aggregate trees and an
    array_min over (dist, cluster) structs."""
    cands = []
    for cid in sorted(cents):
        lit_vec = F.array(*[F.lit(x) for x in cents[cid]])
        terms = F.zip_with(F.col("v"), lit_vec, lambda x, y: (x - y) * (x - y))
        dist = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
        cands.append(F.struct(dist.alias("dist"), F.lit(cid).alias("cluster")))
    return F.array_min(F.array(*cands))


def _mk_vecs(spark, n=257, dim=7, with_ties=True):
    """Deterministic float vectors, plus exact-tie rows (integer-valued
    doubles make equal distances reproducible) to pin the tie-break."""
    rows = []
    for i in range(n):
        rows.append((i, [float(((i * 31 + j * 17) % 13) - 6) / 3.0 for j in range(dim)]))
    if with_ties:
        # exactly equidistant from the two integer centroids below
        rows.append((n, [0.5] * dim))
        rows.append((n + 1, [0.5] * dim))
    return spark.createDataFrame(rows, "id long, v array<double>")


def test_lloyd_assign_udf_bit_parity(spark):
    from zmaxion_spark.functions import similarity as S

    df = _mk_vecs(spark)
    dim = 7
    # ADVICE r11: the _mk_vecs [0.5]*7 rows are NOT an argmin tie here
    # (centroid 2 is strictly nearer than the 0/1 pair) — add rows
    # exactly equidistant from the two NEAREST centroids (1 and 2,
    # |0.625-0.25| = |1.0-0.625| = 0.375 exact in binary) so the
    # argmin tie-break (smaller cluster id wins) is really exercised.
    ties = spark.createDataFrame(
        [(1000, [0.625] * dim), (1001, [0.625] * dim)], "id long, v array<double>"
    )
    df = df.unionByName(ties)
    cents = {
        0: [0.0] * dim,
        1: [1.0] * dim,  # ties with 2 at v=[0.625]*dim -> cluster 1 must win
        2: [0.25] * dim,
        3: [-2.0] * dim,
    }
    slow = df.select("id", _hof_best(cents).alias("b")).select(
        "id", F.col("b.dist").alias("dist"), F.col("b.cluster").alias("cluster")
    )
    fast_b = S.lloyd_assign_udf(cents)(F.col("v"))
    fast = df.select("id", fast_b.getField("dist").alias("dist"),
                     fast_b.getField("cluster").alias("cluster"))
    a = {r["id"]: (r["dist"], r["cluster"]) for r in slow.collect()}
    b = {r["id"]: (r["dist"], r["cluster"]) for r in fast.collect()}
    assert a == b  # exact doubles, exact tie-break


def test_lloyd_top2_udf_bit_parity(spark):
    from zmaxion_spark.functions import similarity as S

    df = _mk_vecs(spark)
    dim = 7
    cents = {
        0: [0.0] * dim,
        1: [1.0] * dim,
        2: [0.25] * dim,
        3: [-2.0] * dim,
        4: [0.75] * dim,
    }
    cands = []
    for cid in sorted(cents):
        lit_vec = F.array(*[F.lit(x) for x in cents[cid]])
        terms = F.zip_with(F.col("v"), lit_vec, lambda x, y: (x - y) * (x - y))
        dist = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
        cands.append(F.struct(dist.alias("dist"), F.lit(cid).alias("cluster")))
    sorted_c = F.array_sort(F.array(*cands))
    slow = df.select(
        "id",
        F.element_at(sorted_c, 1).getField("cluster").alias("cluster"),
        F.element_at(sorted_c, 1).getField("dist").alias("da"),
        F.element_at(sorted_c, 2).getField("dist").alias("db"),
    )
    t2 = S.lloyd_top2_udf(cents)(F.col("v"))
    fast = df.select(
        "id",
        t2.getField("cluster").alias("cluster"),
        t2.getField("da").alias("da"),
        t2.getField("db").alias("db"),
    )
    a = {r["id"]: (r["cluster"], r["da"], r["db"]) for r in slow.collect()}
    b = {r["id"]: (r["cluster"], r["da"], r["db"]) for r in fast.collect()}
    assert a == b


def test_spread_fans_out_then_noops(spark):
    """catalog.spread: repartitions a below-parallelism plan to the
    target, leaves an already-spread plan untouched (no extra
    exchange), and never changes row content."""
    from zmaxion_spark.catalog import spread

    par = spark.sparkContext.defaultParallelism
    one = spark.createDataFrame([(i,) for i in range(100)], "x long").coalesce(1)
    sp = spread(one)
    assert sp.rdd.getNumPartitions() == par
    assert sorted(r.x for r in sp.collect()) == list(range(100))
    # already at target: spread must add no second round-robin exchange
    assert spread(sp) is sp
