"""IVF-PQ: product-quantized approximate nearest-neighbor search.

The third ANN path, and the one that actually pays for itself at
100 TB: the corpus embedding column (dim × 4-8 bytes per vector) is
compressed to `m` BYTES per vector (m=8 on dim=64 → 32×), so the
searchable index for a 10^12-vector corpus fits in a few TB instead of
a few hundred, and every probe streams codes instead of floats.

FAISS's IVFPQ split, re-expressed for Spark (public algorithm:
Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011):

* **Train driver-side on the bounded hash-sample** (reuses
  ivf.sample_training_matrix — max_train vectors, ONE job, no corpus
  collect). Two models come out of the same sample: the IVF coarse
  centroids (Voronoi cells) and, per subspace j, a k-means codebook of
  ≤ 2^nbits codewords over the RESIDUAL x − centroid[cell(x)] of the
  unit-normalized vector — the FAISS IVFPQ split. On clustered corpora
  (the regime real embedding tables live in, and the premise of IVF
  itself) the coarse centroid absorbs each cluster's shared direction,
  so the codeword budget covers a much smaller residual ball: measured
  ≈ 0.58× the raw-vector scheme's reconstruction distortion at 32
  tight clusters (pinned in tests/test_dedup_similarity.py). On
  structure-free uniform-random vectors the two schemes are within
  ~1.3× of each other — the fixture ADC error bound is pinned either
  way.
* **Encode where the vectors live.** ONE Series→Struct pandas UDF per
  vector batch fuses cell assignment and residual quantization: assign
  the coarse cell (one matmul), subtract its centroid, quantize each
  residual subvector (one matmul/argmin per subspace). The index frame
  carries (vec_id, list_id, m-byte code) ONLY; the float vector column
  is dropped before anything shuffles.
* **Search = probe + ADC + optional refine.** Queries explode to
  their nprobe cells and broadcast (ivf._probed_queries); candidates
  in probed cells score by asymmetric distance computation — approx
  cosine = q·centroid[list] + q·decode(residual code); the query stays
  a float vector, the candidate is its cell centroid plus a codeword
  gather (two fancy-index gathers + einsums per Arrow batch). With
  refine > 0 the top k*refine ADC candidates join back to the
  embeddings table BY ID (a small equi-join, never a corpus scan) and
  re-rank by exact cosine, so reported sims are true cosines.

Exactness knob (pinned in tests/test_dedup_similarity.py): with
nprobe == n_lists and a refine shortlist covering the whole corpus,
IVF-PQ degenerates to exact brute force — ADC only selects the
shortlist, the refine pass scores it exactly.

Determinism: sampling, codebook seeding, and iteration counts are all
fixed functions of the input; ties in argmin resolve to the lowest
codeword id (numpy argmin contract), so two runs at any parallelism
encode identical codes and return identical neighbors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, DoubleType

from luzzu_spark.ivf import (N_LISTS, _probed_queries, _unit_rows,
                             sample_training_matrix, train_centroids)
from luzzu_spark.similarity import _mat, _splitmix64_vec

PQ_M = 8          # subquantizers (code bytes per vector)
PQ_NBITS = 8      # ≤ 2^nbits codewords per subspace (byte codes: ≤ 8)
PQ_KMEANS_ITERS = 10


def _kmeans_1d(X: np.ndarray, k: int, iters: int,
               seed_salt: int) -> np.ndarray:
    """Plain (euclidean) k-means on a (n, dsub) matrix — driver-side
    numpy, deterministic splitmix64-derived seeds. Returns (k', dsub)
    with k' = min(k, n)."""
    n = X.shape[0]
    k = min(k, n)
    with np.errstate(over="ignore"):
        seed_idx = (_splitmix64_vec(
            np.arange(k, dtype=np.uint64)
            + np.uint64(seed_salt * 0x9E3779B9)) % np.uint64(n)
        ).astype(np.int64)
    from luzzu_spark.ivf import _decollide_seeds
    C = X[_decollide_seeds(seed_idx, n)].copy()
    for _ in range(iters):
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
        d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
            # empty cell keeps its previous codeword (deterministic)
    return C


def _assign_rows(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Coarse cell per unit row: argmax cosine == argmax dot."""
    return (X @ C.T).argmax(axis=1)


def train_pq_codebooks(train: np.ndarray, centroids: np.ndarray,
                       m: int = PQ_M, nbits: int = PQ_NBITS,
                       iters: int = PQ_KMEANS_ITERS) -> np.ndarray:
    """Per-subspace codebooks over RESIDUALS of unit-normalized
    training vectors against their coarse centroid (the FAISS IVFPQ
    split: residuals are far smaller than raw vectors, so the same
    codeword budget buys much lower distortion).

    Returns (m, k, dsub) with k = min(2^nbits, n_train); dim must be
    divisible by m."""
    X = _unit_rows(np.ascontiguousarray(train, dtype=np.float64))
    n, dim = X.shape
    if n == 0:
        raise ValueError("empty training sample")
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if nbits > 8:
        # codes persist as one uint8 per subspace — a larger codebook
        # would silently wrap codeword ids modulo 256 at encode time
        # (review r05: wrong gathers, no error)
        raise ValueError(f"nbits={nbits} > 8: codes are byte-packed "
                         "(<= 256 codewords per subspace)")
    R = X - centroids[_assign_rows(X, centroids)]
    dsub = dim // m
    k = min(1 << nbits, n)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        books[j] = _kmeans_1d(R[:, j * dsub:(j + 1) * dsub], k, iters,
                              seed_salt=j + 1)
    return books


def _assign_encode_udf(centroids: np.ndarray, codebooks: np.ndarray):
    """vector → (list_id, m-byte residual PQ code) in ONE Arrow pass:
    assign the coarse cell, subtract its centroid, quantize each
    residual subvector to its nearest codeword. One matmul for the
    assignment + one matmul/argmin per subspace per batch."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, _, dsub = B.shape

    @pandas_udf(StructType([StructField("list_id", IntegerType()),
                            StructField("code", BinaryType())]))
    def f(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"list_id": pd.Series([], dtype=np.int32),
                                 "code": pd.Series([], dtype=object)})
        V = _unit_rows(_mat(v))
        assign = _assign_rows(V, C)
        R = (V - C[assign]).reshape(len(v), m, dsub)
        codes = np.empty((len(v), m), dtype=np.uint8)
        for j in range(m):
            d = (-2.0 * (R[:, j, :] @ B[j].T)
                 + (B[j] * B[j]).sum(axis=1)[None, :])
            codes[:, j] = d.argmin(axis=1).astype(np.uint8)
        return pd.DataFrame({
            "list_id": assign.astype(np.int32),
            "code": [row.tobytes() for row in codes]})
    return f.asNondeterministic()


def _adc_udf(codebooks: np.ndarray, centroids: np.ndarray):
    """Asymmetric distance with residual decoding: approx cosine =
    q·centroid[list] + Σ_j q_sub·codeword_j — the query stays float,
    the candidate is its cell centroid plus a codeword gather.
    Vectorized per Arrow batch: two fancy-index gathers + two
    einsums."""
    Bk = np.ascontiguousarray(codebooks, dtype=np.float64)
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    m, _, dsub = Bk.shape

    @pandas_udf(DoubleType())
    def f(qv: pd.Series, code: pd.Series,
          list_id: pd.Series) -> pd.Series:
        n = len(qv)
        if n == 0:
            return pd.Series([], dtype=np.float64)
        Q = _unit_rows(_mat(qv))
        lid = list_id.to_numpy(dtype=np.int64)
        coarse = np.einsum("nd,nd->n", Q, C[lid])
        codes = np.frombuffer(b"".join(code.tolist()),
                              dtype=np.uint8).reshape(n, m)
        CW = Bk[np.arange(m)[None, :], codes]          # (n, m, dsub)
        fine = np.einsum("nmd,nmd->n", Q.reshape(n, m, dsub), CW)
        return pd.Series(coarse + fine)
    return f.asNondeterministic()


def train_ivfpq(embeddings: DataFrame, n_lists: int = N_LISTS,
                m: int = PQ_M, nbits: int = PQ_NBITS,
                id_col: str = "vec_id", vec_col: str = "embedding",
                ) -> tuple[np.ndarray, np.ndarray]:
    """One bounded sample job → both models (coarse centroids, PQ
    codebooks). Returns (centroids (n_lists, dim), codebooks
    (m, k, dsub)) — kilobytes, broadcast by UDF capture."""
    train = sample_training_matrix(embeddings, id_col=id_col,
                                   vec_col=vec_col)
    centroids = train_centroids(train, n_lists)
    return centroids, train_pq_codebooks(train, centroids,
                                         m=m, nbits=nbits)


def build_pq_index(embeddings: DataFrame, centroids: np.ndarray,
                   codebooks: np.ndarray, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(vec_id, list_id, code) — the compressed searchable index.

    The float vector column is dropped HERE, before any shuffle or
    sink: what persists/moves per corpus vector is one int + m bytes.
    Persist partitioned by list_id (ivf.persist_index) for scan-time
    cell pruning at production scale."""
    s = _assign_encode_udf(centroids, codebooks)(F.col(vec_col))
    return (embeddings.select(F.col(id_col), s.alias("s"))
            .select(id_col, F.col("s.list_id").alias("list_id"),
                    F.col("s.code").alias("code")))


def ivfpq_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
               nprobe: int = 4, n_lists: int = N_LISTS, m: int = PQ_M,
               nbits: int = PQ_NBITS, refine: int = 3,
               id_col: str = "vec_id", vec_col: str = "embedding",
               models: tuple[np.ndarray, np.ndarray] | None = None,
               ) -> DataFrame:
    """IVF-PQ approximate top-k cosine neighbors.

    refine > 0: top k*refine ADC candidates per query re-rank by exact
    cosine fetched BY ID from the embeddings table (small equi-join;
    the corpus is never rescanned) — reported `sim` is then the true
    cosine. refine == 0 reports raw ADC scores as `sim`.
    Unsorted — the deterministic sort lives in the catalog wrapper."""
    if models is None:
        models = train_ivfpq(embeddings, n_lists, m, nbits,
                             id_col, vec_col)
    centroids, codebooks = models
    index = build_pq_index(embeddings, centroids, codebooks,
                           id_col, vec_col)
    q = _probed_queries(queries, centroids, nprobe, id_col, vec_col)
    return _score_pq(index, q, embeddings, codebooks, centroids, k,
                     refine, id_col, vec_col)


def ivfpq_topk_over_index(spark, index_path: str, queries: DataFrame,
                          models: tuple[np.ndarray, np.ndarray],
                          embeddings: DataFrame, k: int = 5,
                          nprobe: int = 4, refine: int = 3,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Search a PERSISTED PQ index with scan-time cell pruning — the
    production layout: build_pq_index → ivf.persist_index(…, path)
    writes the (id, list_id, m-byte code) frame partitioned by
    list_id, and a search pushes its probe list into the scan as a
    `list_id IN (…)` partition filter, so only the probed cell
    DIRECTORIES of the compressed index are opened (same
    PartitionFilters contract as ivf_topk_over_index, pinned in
    tests/test_plans.py). `embeddings` serves the refine stage only
    (exact vectors fetched BY ID for the shortlist); with refine=0 it
    is never read. Results are identical to ivfpq_topk with the same
    models/nprobe/refine."""
    centroids, codebooks = models
    # one materialization feeds BOTH the collected partition filter and
    # the scoring join (review r05: a nondeterministic queries input
    # could otherwise re-evaluate into cells missing from `lists` and
    # silently scan zero candidates); bounded n_queries × nprobe rows
    q = _probed_queries(queries, centroids, nprobe, id_col,
                        vec_col).localCheckpoint(eager=True)
    lists = sorted({r["list_id"]
                    for r in q.select("list_id").distinct().collect()})
    index = (spark.read.parquet(index_path)
             .where(F.col("list_id").isin(lists)))
    return _score_pq(index, q, embeddings, codebooks, centroids, k,
                     refine, id_col, vec_col)


def _score_pq(index: DataFrame, q: DataFrame, embeddings: DataFrame,
              codebooks: np.ndarray, centroids: np.ndarray, k: int,
              refine: int, id_col: str, vec_col: str) -> DataFrame:
    """Shared ADC + optional exact-refine scoring over probed cells.

    Shuffle discipline (review r05): the ADC rank exchange carries
    (query_id, neighbor_id, adc) triples ONLY — the dim×8-byte float
    query vector is dropped before the window and re-attached to the
    tiny shortlist from the broadcast query side; the refine fetch
    BROADCASTS the shortlist so the 100 TB embeddings table is probed
    in place, never hash-partitioned by neighbor_id."""
    from luzzu_spark.similarity import cosine_expr
    adc = (index.join(F.broadcast(q), "list_id")
           .where(F.col("query_id") != F.col(id_col))
           .select("query_id", F.col(id_col).alias("neighbor_id"),
                   _adc_udf(codebooks, centroids)(
                       F.col("qvec"), F.col("code"),
                       F.col("list_id")).alias("adc")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id"))
    if refine <= 0:
        return (adc.withColumn("rnk",
                               F.row_number().over(w).cast("long"))
                .where(F.col("rnk") <= k)
                .select("query_id", "neighbor_id",
                        F.col("adc").alias("sim"), "rnk"))
    # q is exploded per probe — one qvec row per query for re-attach
    qvecs = q.select("query_id", "qvec").dropDuplicates(["query_id"])
    shortlist = (adc.withColumn("arnk", F.row_number().over(w))
                 .where(F.col("arnk") <= k * refine)
                 .select("query_id", "neighbor_id")
                 .join(F.broadcast(qvecs), "query_id"))
    exact = (embeddings.select(F.col(id_col).alias("neighbor_id"),
                               F.col(vec_col).alias("nvec"))
             .join(F.broadcast(shortlist), "neighbor_id")
             .select("query_id", "neighbor_id",
                     cosine_expr(F.col("qvec"),
                                 F.col("nvec")).alias("sim")))
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (exact.withColumn("rnk", F.row_number().over(w2).cast("long"))
            .where(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "sim", "rnk"))
