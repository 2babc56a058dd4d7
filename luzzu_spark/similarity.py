"""Embedding similarity search: brute-force cosine top-k + LSH variant.

Baseline: broadcast the (small) query set, compute cosine with built-in
array ops (zip_with + aggregate — JVM-side, no Python), rank per query
with a window. Scale path: random-hyperplane LSH buckets restrict each
query to one bucket's candidates — the bucket join replaces the full
cross product (same blocking idea as dedup.lsh_candidate_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Fixed hyperplane seeds for the LSH variant (no RNG at run time).
LSH_PLANES = 8


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y:
                                  x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a, b) -> F.Column:
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Top-k cosine neighbors for each query vector.

    queries: (query_id, embedding). Scale: broadcast queries (the small
    side), one pass over the corpus, per-query top-k via window — the
    shuffle carries (query_id, vec_id, sim) triples only."""
    q = F.broadcast(queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec")))
    scored = (embeddings.alias("e").crossJoin(q)
              .where(F.col("query_id") != F.col(id_col))
              .select("query_id", F.col(id_col).alias("neighbor_id"),
                      cosine_expr(F.col("qvec"),
                                  F.col(vec_col)).alias("sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= k)
            .orderBy("query_id", "rnk"))


def hyperplane_bucket(vec_col: str = "embedding",
                      planes: int = LSH_PLANES) -> F.Column:
    """Sign-of-projection LSH bucket id from `planes` pseudo-random
    hyperplanes. Plane p's component j = deterministic hash-derived
    value in [-1,1): no stored model, identical on every executor."""
    v = F.col(vec_col)

    # Factory closure (not a default-arg lambda): keeps the HOF binder
    # seeing a single-parameter lambda, so `p` stays a Python constant.
    def plane_weight(p: int):
        return lambda j: (
            F.pmod(F.xxhash64(j.cast("long") * 1315423911 + p),
                   F.lit(2000)) - 1000).cast("double") / 1000.0

    bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(F.sequence(F.lit(0), F.size(v) - 1),
                            plane_weight(p)),
                lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append((proj > 0).cast("long") * F.lit(1 << p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Recall < 1 by design; the scale win is that each query
    scores one bucket (corpus/2^planes docs) instead of the corpus."""
    emb_b = embeddings.withColumn("bucket", hyperplane_bucket(vec_col))
    q = F.broadcast(
        queries.withColumn("bucket", hyperplane_bucket(vec_col))
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("qvec"), "bucket"))
    scored = (emb_b.join(q, "bucket")
              .where(F.col("query_id") != F.col(id_col))
              .select("query_id", F.col(id_col).alias("neighbor_id"),
                      cosine_expr(F.col("qvec"),
                                  F.col(vec_col)).alias("sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= k)
            .orderBy("query_id", "rnk"))


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ t).

    Scale path: LSH-bucket self-join as the blocking stage (near-dup
    vectors land in the same hyperplane-sign bucket with high
    probability), exact cosine as the verify stage — the same
    block-then-verify shape as MinHash→Jaccard in dedup.py. The
    self-join is per bucket (corpus/2^planes rows), never corpus².
    Recall < 1 by design (sign-LSH misses some near-pairs across a
    plane); raise `planes` bands or multi-probe for higher recall."""
    b = embeddings.withColumn("bucket", hyperplane_bucket(vec_col))
    left = b.select(F.col(id_col).alias("id_a"),
                    F.col(vec_col).alias("vec_a"), "bucket")
    right = b.select(F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("vec_b"), "bucket")
    return (left.join(right, "bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("sim", cosine_expr(F.col("vec_a"),
                                           F.col("vec_b")))
            .where(F.col("sim") >= threshold)
            .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
            .orderBy("id_a", "id_b"))
