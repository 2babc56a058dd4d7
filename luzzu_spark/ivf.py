"""IVF (inverted-file) approximate nearest-neighbor search.

The second ANN scale path next to hyperplane LSH (similarity.py):
partition the corpus into `n_lists` Voronoi cells around k-means
centroids, then answer each query by scanning only its `nprobe`
nearest cells — per-query work drops from |corpus| to
~|corpus| * nprobe / n_lists.

Scale design (the FAISS-style split, re-expressed for Spark):

* **Train on a sample, on the driver.** k-means needs a few thousand
  vectors per centroid, not the corpus: we hash-sample
  (xxhash64(vec_id) — deterministic, uniform, no RNG) up to
  `max_train` vectors to the driver and run spherical-k-means Lloyd
  iterations in numpy. At 100 TB the sample is still bounded
  (max_train * dim * 8 bytes); the corpus is never collected.
* **Broadcast the model.** The centroid matrix is (n_lists, dim)
  float64 — kilobytes — captured by the scoring pandas UDFs, so every
  executor assigns/probes locally with one numpy matmul per Arrow
  batch (no interpreted higher-order functions, CLAUDE.md rule 1).
* **Search is a bucket join, never a cross product.** Queries explode
  to their nprobe cell ids and broadcast; the corpus side keeps its
  `list_id` from indexing, so the join touches only probed cells and
  the shuffle carries (query_id, neighbor_id, sim) triples.

Exactness knob: with nprobe == n_lists every cell is probed and IVF
degenerates to exact brute force — the property the correctness test
pins (tests/test_dedup_similarity.py). With nprobe << n_lists recall
is < 1 by design; the planted-twin test pins the approximate contract.

Determinism: sampling, seeding, and iteration count are all fixed
functions of the input — two runs (any parallelism) build the same
index and return the same neighbors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, IntegerType

from luzzu_spark.similarity import _mat, _splitmix64_vec

N_LISTS = 16
KMEANS_ITERS = 10
MAX_TRAIN = 65536


def _unit_rows(M: np.ndarray) -> np.ndarray:
    """Rows scaled to unit L2 norm (zero rows left as zeros)."""
    n = np.sqrt((M * M).sum(axis=1, keepdims=True))
    return np.divide(M, n, out=np.zeros_like(M), where=n > 0)


def _decollide_seeds(seed_idx: np.ndarray, n: int) -> list[int]:
    """Deterministic k-means seed de-collision: wrap each colliding
    index forward past the taken ones. Shared by the IVF coarse
    quantizer and the PQ sub-space trainer (review r05: the block was
    duplicated line-for-line in pq.py)."""
    seen: set[int] = set()
    seeds = []
    for i in seed_idx:
        j = int(i)
        while j in seen:
            j = (j + 1) % n
        seen.add(j)
        seeds.append(j)
    return seeds


def sample_training_matrix(embeddings: DataFrame, max_train: int = MAX_TRAIN,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> np.ndarray:
    """Deterministic bounded sample of corpus vectors for training:
    the max_train globally-smallest xxhash64(id) values — a uniform
    sample independent of storage order and partitioning.

    ONE job, no count() (VERDICT r02 item 7): each partition first
    prunes itself to its local max_train smallest hashes inside
    mapInPandas (vectorized nsmallest per Arrow batch — every element
    of the global top-max_train is necessarily in its partition's
    top-max_train, so the union is a provable superset regardless of
    how rows are partitioned), then one TakeOrdered trims the ≤
    partitions × max_train survivors to exactly max_train. Same
    survivor set as the old count()+cutoff path, one job shorter, and
    still partitioning-independent."""
    sel = embeddings.select(F.col(vec_col).alias("v"),
                            F.xxhash64(F.col(id_col)).alias("h"))

    def local_topk(batches):
        best = None
        for pdf in batches:
            cand = pdf if best is None else pd.concat((best, pdf),
                                                      ignore_index=True)
            best = cand.nsmallest(max_train, "h")
        if best is not None and len(best):
            yield best

    pruned = sel.mapInPandas(local_topk, schema=sel.schema)
    rows = pruned.orderBy("h").limit(max_train).collect()
    return np.array([r["v"] for r in rows], dtype=np.float64)


def train_centroids(train: np.ndarray, n_lists: int = N_LISTS,
                    iters: int = KMEANS_ITERS) -> np.ndarray:
    """Spherical k-means (cosine) on the training matrix — pure numpy,
    driver-side, deterministic (splitmix64-derived seed rows, fixed
    iteration count). Returns (n_lists, dim) unit-norm centroids."""
    X = _unit_rows(train)
    n = X.shape[0]
    if n == 0:
        raise ValueError("empty training sample")
    k = min(n_lists, n)
    with np.errstate(over="ignore"):
        seed_idx = (_splitmix64_vec(np.arange(k, dtype=np.uint64))
                    % np.uint64(n)).astype(np.int64)
    C = X[_decollide_seeds(seed_idx, n)].copy()
    for _ in range(iters):
        # assign: argmax cosine == argmax dot (all unit rows)
        assign = (X @ C.T).argmax(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _unit_rows(C)
        # a centroid with an empty cell keeps its previous position
        dead = (C == 0).all(axis=1)
        if dead.any():
            C[dead] = X[[seeds[i] for i in np.where(dead)[0]]]
            C[dead] = _unit_rows(C[dead])
    return C


def _assign_udf(centroids: np.ndarray):
    """list_id = argmax cosine(v, centroid) — one matmul per batch."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)

    @pandas_udf(IntegerType())
    def f(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=np.int32)
        V = _unit_rows(_mat(v))
        return pd.Series((V @ C.T).argmax(axis=1).astype(np.int32))
    return f.asNondeterministic()


def _probe_udf(centroids: np.ndarray, nprobe: int):
    """nprobe nearest cell ids per query vector (ascending distance)."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    p = min(nprobe, C.shape[0])

    @pandas_udf(ArrayType(IntegerType()))
    def f(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        V = _unit_rows(_mat(v))
        sims = V @ C.T
        # top-p cells by similarity, deterministic tie-break on cell id
        order = np.lexsort((np.arange(C.shape[0])[None, :]
                            .repeat(len(V), 0), -sims), axis=1)[:, :p]
        return pd.Series([row.astype(np.int32).tolist() for row in order])
    return f.asNondeterministic()


def build_index(embeddings: DataFrame, n_lists: int = N_LISTS,
                id_col: str = "vec_id", vec_col: str = "embedding",
                centroids: np.ndarray | None = None,
                ) -> tuple[DataFrame, np.ndarray]:
    """Assign every corpus vector to its Voronoi cell.

    Returns (indexed_frame, centroids); indexed_frame adds `list_id`.
    Persist with persist_index(...) for the production layout where
    searches (ivf_topk_over_index) prune cells at SCAN time; the
    in-memory path prunes at join time instead."""
    if centroids is None:
        centroids = train_centroids(
            sample_training_matrix(embeddings, id_col=id_col,
                                   vec_col=vec_col), n_lists)
    indexed = embeddings.withColumn(
        "list_id", _assign_udf(centroids)(F.col(vec_col)))
    return indexed, centroids


def _probed_queries(queries: DataFrame, centroids: np.ndarray,
                    nprobe: int, id_col: str,
                    vec_col: str) -> DataFrame:
    return (queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("qvec"))
            .withColumn("list_id", F.explode(
                _probe_udf(centroids, nprobe)(F.col("qvec")))))


def _score_probed(indexed: DataFrame, q: DataFrame, k: int,
                  id_col: str, vec_col: str) -> DataFrame:
    from luzzu_spark.similarity import cosine_expr, topk_per_query
    scored = (indexed.join(F.broadcast(q), "list_id")
              .where(F.col("query_id") != F.col(id_col))
              .select("query_id", F.col(id_col).alias("neighbor_id"),
                      cosine_expr(F.col("qvec"),
                                  F.col(vec_col)).alias("sim")))
    # unsorted: the catalog wrapper owns the deterministic order
    return topk_per_query(scored, k, sort=False)


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             nprobe: int = 4, n_lists: int = N_LISTS,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: np.ndarray | None = None) -> DataFrame:
    """IVF approximate top-k cosine neighbors.

    Each query scans only its `nprobe` nearest cells. nprobe == n_lists
    probes everything (exact == brute_force_topk). Unsorted — the
    deterministic sort lives in the catalog wrapper."""
    indexed, centroids = build_index(embeddings, n_lists, id_col, vec_col,
                                     centroids)
    q = _probed_queries(queries, centroids, nprobe, id_col, vec_col)
    return _score_probed(indexed, q, k, id_col, vec_col)


def persist_index(indexed: DataFrame, path: str) -> None:
    """Write the indexed corpus PARTITIONED BY list_id — the production
    layout (VERDICT r02 item 6): each Voronoi cell is its own
    partition directory, so a search against the persisted index reads
    only its nprobe cell directories (partition pruning at SCAN time —
    the 100 TB win the join-time pruning path only approximates).
    One-time cost: the write shuffles on list_id (fixed-width int)."""
    indexed.write.mode("overwrite").partitionBy("list_id").parquet(path)


def ivf_topk_over_index(spark, index_path: str, queries: DataFrame,
                        centroids: np.ndarray, k: int = 5,
                        nprobe: int = 4, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Search a persisted IVF index with scan-time cell pruning.

    The probe lists come from the (small) query set: one bounded
    collect of ≤ n_queries × nprobe cell ids — kilobytes, the same
    driver-side budget class as the centroid matrix — pushed into the
    scan as a `list_id IN (…)` partition filter, so only the probed
    cell DIRECTORIES are opened (PartitionFilters in the plan; pinned
    in tests/test_plans.py). Results are identical to ivf_topk with
    the same centroids/nprobe — only the pruning moves from join time
    to scan time."""
    # materialize the probe frame ONCE: the collect below and the
    # scoring join must see the SAME probe rows — without this, a
    # nondeterministic queries input (e.g. an unordered .limit()) can
    # re-evaluate differently and a probed cell missing from `lists`
    # silently scans zero candidates (review r05). Bounded:
    # n_queries × nprobe rows.
    q = _probed_queries(queries, centroids, nprobe, id_col,
                        vec_col).localCheckpoint(eager=True)
    lists = sorted({r["list_id"]
                    for r in q.select("list_id").distinct().collect()})
    corpus = (spark.read.parquet(index_path)
              .where(F.col("list_id").isin(lists)))
    return _score_probed(corpus, q, k, id_col, vec_col)
