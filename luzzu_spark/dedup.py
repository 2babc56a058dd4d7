"""Corpus deduplication operators — the training-pipeline core.

All variants are expressed as DataFrame transforms whose shuffles are on
small fixed-width keys (64-bit hashes / band signatures), never on
document text:

- exact:      hash-groupBy on content hash (one shuffle of (hash,id));
- 13-gram:    explode shingle hashes → semi/anti join against documents
              sharing a shingle (BASELINE.json:6);
- MinHash+LSH: shingles → k minhashes → bands → bucket join; candidate
              pairs verified by exact Jaccard on signatures;
- SimHash:    64-bit signature; near-dups = identical signature buckets
              (band-rotated for ≤k-bit differences).

Determinism: every hash is xxhash64 (seeded, content-only); every
"first wins" is a row_number over explicit (hash, doc_id) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from luzzu_spark.rules import spec
from luzzu_spark.rules.heuristics import ngram_hashes, with_token_hashes

# MinHash parameters (frozen): k permutations in b bands of r rows.
MINHASH_K = 32
LSH_BANDS = 8
LSH_ROWS = MINHASH_K // LSH_BANDS
# (a*x + b) mod p universal-hash family, constants fixed (no RNG).
# p = 2^31-1 keeps a*x' + b < 2^38 — no int64 overflow under ANSI mode.
_MERSENNE_P = (1 << 31) - 1
_HASH_A = [2 * i + 1 for i in range(1, MINHASH_K + 1)]          # odd
_HASH_B = [(i * i * 0x9E3779B9) % _MERSENNE_P
           for i in range(1, MINHASH_K + 1)]

SHINGLE_N = 5  # word-shingle width for minhash/simhash


def shingle_hashes(df: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """Attach `shingles: array<long>` (xxhash64 of n-word shingles)."""
    from luzzu_spark.fixtures import spread
    if "token_hashes" not in df.columns:
        df = with_token_hashes(spread(df))
    return df.withColumn("shingles", ngram_hashes(n))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep the first doc (lowest id) per exact content hash.

    Scale: shuffles (hash,id) pairs only; text never moves — the kept
    ids semi-join back against the corpus."""
    hashed = docs.select(F.xxhash64(text_col).alias("h"),
                         F.col(id_col))
    w = Window.partitionBy("h").orderBy(F.asc(id_col))
    keep_ids = (hashed.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1).select(id_col))
    return docs.join(keep_ids, id_col, "left_semi")


def minhash_signatures(df: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """(id, sig: array<long>) — k minhashes over shingle hashes.

    Pure Catalyst, explode-then-aggregate: one pass over the exploded
    (id, shingle) rows with k `min` aggregate columns. This stays in
    whole-stage-codegen hash agg (k array `transform` folds in a single
    projection would blow the codegen size limit and fall back to
    interpreted lambdas — O(k·S) per row). Map-side partial agg
    collapses each doc to one row before the shuffle, so the shuffle is
    |docs| rows of k longs regardless of shingle count. Docs with no
    shingles are excluded (nothing to compare): plain explode() emits no
    rows for an empty array, so no pre-filter is needed — an explicit
    `where(size(shingles) > 0)` gets predicate-pushed below the
    projection and re-evaluates the whole tokenize→hash→shingle
    expression inline (measured 3× slowdown)."""
    sh = shingle_hashes(df)
    exploded = sh.select(F.col(id_col), F.explode("shingles").alias("sh"))
    x = F.pmod(F.col("sh"), F.lit(_MERSENNE_P))
    aggs = [F.min(F.pmod(a * x + F.lit(b), F.lit(_MERSENNE_P)))
            .alias(f"mh{i}")
            for i, (a, b) in enumerate(zip(_HASH_A, _HASH_B))]
    mins = exploded.groupBy(id_col).agg(*aggs)
    sig = F.array(*[F.col(f"mh{i}") for i in range(MINHASH_K)])
    return mins.select(F.col(id_col), sig.alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Band the signatures and self-join buckets → candidate pairs
    (id_a < id_b) with estimated Jaccard from full signatures.

    Scale: the self-join is per (band, band_hash) bucket — cardinality
    bounded by bucket size, not corpus size; banding IS the blocking."""
    bands = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.xxhash64(F.concat_ws(
                     ",", *[F.col("sig")[i * LSH_ROWS + r].cast("string")
                            for r in range(LSH_ROWS)])).alias("bh"))
        for i in range(LSH_BANDS)])
    exploded = (sigs.withColumn("b", F.explode(bands))
                .select(F.col(id_col), "sig",
                        F.col("b.band"), F.col("b.bh")))
    left = exploded.select(F.col(id_col).alias("id_a"),
                           F.col("sig").alias("sig_a"), "band", "bh")
    right = exploded.select(F.col(id_col).alias("id_b"),
                            F.col("sig").alias("sig_b"), "band", "bh")
    pairs = (left.join(right, ["band", "bh"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sig_a", "sig_b")
             .dropDuplicates(["id_a", "id_b"]))
    matches = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
        lambda x: x))
    return (pairs.withColumn(
        "est_jaccard",
        F.try_divide(matches.cast("double"), F.lit(MINHASH_K)))
        .select("id_a", "id_b", "est_jaccard"))


def minhash_dedup_pairs(docs: DataFrame, threshold: float = 0.5,
                        id_col: str = "doc_id") -> DataFrame:
    sigs = minhash_signatures(docs, id_col)
    return (lsh_candidate_pairs(sigs, id_col)
            .where(F.col("est_jaccard") >= threshold)
            .orderBy("id_a", "id_b"))


def simhash_signatures(docs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over shingle hashes, pure Catalyst.

    bit b of simhash = majority vote of bit b across shingle hashes.
    Explode-then-aggregate (same rationale as minhash_signatures): one
    codegen'd hash agg with 63 bit-sum columns over exploded
    (id, shingle) rows; 63 `F.aggregate` array folds in one projection
    would run interpreted at O(63·S) per row. Bit 63 excluded so the
    result stays positive. No-shingle docs drop out via plain explode()
    (no pre-filter — see minhash_signatures on the pushdown trap)."""
    sh = shingle_hashes(docs)
    exploded = sh.select(F.col(id_col), F.explode("shingles").alias("h"))
    aggs = [F.sum(F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1)))
            .alias(f"b{b}") for b in range(63)]
    counted = exploded.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n"), *aggs)
    bits = [(F.col(f"b{b}") * 2 > F.col("n")).cast("long") * F.lit(1 << b)
            for b in range(63)]
    out = bits[0]
    for bcol in bits[1:]:
        out = out + bcol
    return counted.select(F.col(id_col), out.alias("simhash"))


def simhash_bucket_pairs(docs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Exact-signature collision pairs (Hamming distance 0 blocking);
    k-bit tolerance → simhash_near_pairs."""
    sigs = simhash_signatures(docs, id_col)
    a = sigs.select(F.col(id_col).alias("id_a"),
                    F.col("simhash"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col("simhash"))
    return (a.join(b, "simhash")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "simhash")
            .orderBy("id_a", "id_b"))


SIMHASH_BANDS = 4  # pigeonhole blocking: dist ≤ BANDS-1 ⇒ ≥1 equal band


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       id_col: str = "doc_id") -> DataFrame:
    """Hamming-tolerant near-dup pairs via banded pigeonhole blocking.

    The 63-bit signature splits into SIMHASH_BANDS contiguous bands; two
    signatures within Hamming distance ≤ SIMHASH_BANDS-1 must agree on
    at least one whole band (pigeonhole), so the candidate join is per
    (band index, band value) bucket — never corpus². Candidates are then
    verified exactly with bit_count(a XOR b) ≤ max_hamming. Complete
    (recall 1.0) whenever max_hamming ≤ SIMHASH_BANDS-1.

    Scale: same blocking shape as MinHash LSH banding; shuffle keys are
    (int, long) pairs, signatures 1 long per side."""
    if max_hamming > SIMHASH_BANDS - 1:
        raise ValueError(
            f"pigeonhole completeness needs max_hamming <= "
            f"{SIMHASH_BANDS - 1}; raise SIMHASH_BANDS for more")
    sigs = simhash_signatures(docs, id_col)
    width = 63 // SIMHASH_BANDS + 1  # 16 bits/band over 63 bits
    bands = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned("simhash", i * width)
             .bitwiseAND(F.lit((1 << width) - 1)).alias("bv"))
        for i in range(SIMHASH_BANDS)])
    exploded = (sigs.withColumn("b", F.explode(bands))
                .select(F.col(id_col), "simhash",
                        F.col("b.band"), F.col("b.bv")))
    left = exploded.select(F.col(id_col).alias("id_a"),
                           F.col("simhash").alias("sh_a"), "band", "bv")
    right = exploded.select(F.col(id_col).alias("id_b"),
                            F.col("simhash").alias("sh_b"), "band", "bv")
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (left.join(right, ["band", "bv"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", dist.alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .dropDuplicates(["id_a", "id_b"])
            .orderBy("id_a", "id_b"))


def ngram_jaccard_pairs(docs: DataFrame, candidates: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (the verify stage after
    LSH blocking): joins each side's shingle SET, computes
    |∩|/|∪| with array ops."""
    sh = (shingle_hashes(docs)
          .select(F.col(id_col),
                  F.array_distinct("shingles").alias("sset")))
    a = sh.select(F.col(id_col).alias("id_a"),
                  F.col("sset").alias("set_a"))
    b = sh.select(F.col(id_col).alias("id_b"),
                  F.col("sset").alias("set_b"))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size(F.array_union("set_a", "set_b"))
    return (candidates.join(a, "id_a").join(b, "id_b")
            .withColumn("jaccard",
                        F.try_divide(inter.cast("double"), union))
            .select("id_a", "id_b", "jaccard"))


def near_dup_survivors(docs: DataFrame, threshold: float = 0.5,
                       id_col: str = "doc_id") -> DataFrame:
    """The corpus after near-dup removal: for every LSH-confirmed pair,
    the higher id drops (lowest-id-wins cluster head approximation).

    One anti-join against the distinct id_b side — transitive-closure
    clustering would need iterative connected components; dropping every
    doc that loses at least one pairwise comparison is the standard
    single-pass approximation (over-drops only inside chains a<b<c where
    (a,c) was never a candidate — harmless for training-data pruning).
    Scale: pairs are bounded by LSH bucket sizes; the anti-join
    broadcasts when the loser set is small, else shuffles on id."""
    losers = (minhash_dedup_pairs(docs, threshold, id_col)
              .select(F.col("id_b").alias(id_col)).distinct())
    return docs.join(losers, id_col, "left_anti")
