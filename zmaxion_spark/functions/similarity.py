"""Vector-similarity column functions — SURVEY.md §2.11 #71–#73.

Cosine/dot products are pure SQL higher-order lambdas (left-fold over
the zipped arrays) so they stay JVM-side AND match a DuckDB
``list_reduce`` oracle bit-for-bit (same fold order → same IEEE
result). The LSH scale path uses deterministic random hyperplanes
derived from md5 at plan-build time — no runtime randomness, so runs
are reproducible and testable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _d(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product (bit-exact parity with list_reduce)."""
    prods = F.zip_with(_d(a), _d(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe on zero vectors."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 random hyperplanes from md5(seed:plane:dim).

    Plan-time constants — every run, every engine, every executor sees
    identical planes (required for LSH bucket joins to be stable)."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()
            row.append(1.0 if h[0] < 128 else -1.0)
        planes.append(row)
    return planes


def lsh_signature(vec: Column, n_planes: int = 16, dim: int = 64, seed: int = 42) -> Column:
    """Sign-random-projection bit signature as a BIGINT bucket id.

    At 100 TB this is the candidate-pruning key: a self-join on the
    signature touches only same-bucket pairs instead of n² pairs."""
    bits = []
    for j, plane in enumerate(hyperplanes(n_planes, dim, seed)):
        p = F.array(*[F.lit(v) for v in plane])
        proj = dot(vec, p)
        bits.append(F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("bigint")


def sim_join_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_tables: int = 8,
    bits_per_table: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Similarity self-join with multi-table LSH (OR-amplification).

    L independent sign-random-projection tables of b bits each; a pair
    is a candidate if it collides in ANY table, then exact cosine
    re-scores it (precision 1.0; recall = 1-(1-p^b)^L with
    p = 1-θ/π). At 100 TB each table is one equi-join on a small int
    bucket — candidates ∝ Σ bucket², never n²."""
    buckets = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        *[
            lsh_signature(F.col(vec_col), bits_per_table, dim, seed + 1000 * t).alias(f"_t{t}")
            for t in range(n_tables)
        ],
    )
    cand = None
    for t in range(n_tables):
        a = buckets.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col(f"_t{t}").alias("bk"))
        b = buckets.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col(f"_t{t}").alias("bk"))
        p = a.join(b, "bk").filter(F.col("id_a") < F.col("id_b")).drop("bk")
        cand = p if cand is None else cand.unionByName(p)
    return (
        cand.dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def topk_neighbors(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    query_vec: str,
    corpus_vec: str,
    k: int,
    query_id: str,
    corpus_id: str,
) -> DataFrame:
    """Brute-force exact top-k cosine neighbors.

    The query side is broadcast (small by construction); the corpus is
    scanned once with the cosine evaluated in codegen; ranking is a
    per-query window. Scale path: wrap corpus with an LSH bucket filter
    first (see lsh_signature) to prune candidates."""
    joined = corpus_df.crossJoin(F.broadcast(queries_df))
    scored = joined.withColumn("cos_sim", cosine(F.col(query_vec), F.col(corpus_vec)))
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop(query_vec, corpus_vec)
    )
