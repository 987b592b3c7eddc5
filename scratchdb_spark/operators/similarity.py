"""Similarity search over embedding columns (array<float>).

Two paths:

- brute-force cosine top-k: exact; the query side is broadcast so the
  big side streams — cost is one pass over the corpus per batch of
  queries (this is the correctness baseline and is fine whenever the
  query set is small);
- random-hyperplane LSH: deterministic pseudo-random planes hashed from
  (plane, dim) pairs, sign-bit bucket key, candidates = bucket
  collisions (equi-join, shuffle on bucket key), exact cosine only on
  candidates. The scale path: no cross product, bucket key join
  partitions like any other join, multi-probe = more plane sets.

Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM codegen, no
Python. Embeddings cast to double before accumulating.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


# NB (measured at sf0.1): unrolling the dot product into a flat
# element_at chain is SLOWER than the higher-order-function form — the
# 64-term expression blows past codegen method limits and falls back to
# the interpreted path. Keep HOF dots; the win that matters is hoisting
# the per-vector norms out of the quadratic pair stage.


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cos_sim, rank). Self-matches are
    excluded. Ties order by neighbor id (deterministic).
    """
    # norms are per-vector, not per-pair: compute each side's norm once
    # (linear) so the quadratic stage pays only one dot per pair
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs_above(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_id: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, id_a < id_b.
    Quadratic — bound the input (max_id) or use lsh_topk at scale."""
    base = df
    if max_id is not None:
        base = base.filter(F.col(id_col) < max_id)
    # per-vector norm precomputed (linear); the quadratic join pays one
    # dot product per pair instead of a dot + two norms
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes. Components are
    derived from a splitmix64-style integer hash of (plane, dim) mapped
    to [-1, 1] — reproducible across runs/engines with no RNG state."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            x = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9) % (2**64)
            x = (x ^ (x >> 31)) * 0x94D049BB133111EB % (2**64)
            x = x ^ (x >> 29)
            row.append((x % 2_000_001) / 1_000_000.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_key(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id (bigint) for one plane set."""
    key = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = _dot(vec_col, F.array(*[F.lit(x) for x in plane]))
        bit = F.when(d >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        key = key.bitwiseOR(F.shiftleft(bit, i))
    return key


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 4,
    num_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates are corpus vectors sharing an LSH
    bucket with the query in ANY of ``num_tables`` plane sets, then
    exact cosine + rank on candidates only.

    Tuning: P(candidate) = 1 - (1 - p^planes)^tables with
    p = 1 - angle/pi. Weakly similar corpora (neighbor cosine ~0.4 ->
    p ~ 0.63) need FEW planes per table: the 4x8 default gives ~0.7
    capture there; raise num_planes for high-similarity workloads to
    cut candidate counts."""
    # distinct plane sets per table: offset the plane index space
    def table_planes(t: int) -> list[list[float]]:
        all_planes = _hyperplanes(num_planes * num_tables, dim)
        return all_planes[t * num_planes : (t + 1) * num_planes]

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    cand = None
    for t in range(num_tables):
        planes = table_planes(t)
        qb = q.withColumn("bucket", lsh_bucket_key(F.col("q_vec"), planes))
        cb = c.withColumn("bucket", lsh_bucket_key(F.col("c_vec"), planes))
        part = qb.join(cb, "bucket").select(
            "query_id", "q_vec", "neighbor_id", "c_vec"
        )
        cand = part if cand is None else cand.unionByName(part)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
