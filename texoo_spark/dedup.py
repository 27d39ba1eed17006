"""Deduplication operators for web-scale training-data pipelines.

Spark-first designs (each returns/consumes DataFrames):
- exact duplicates: hash-groupBy on normalized text (one shuffle, map-side
  partial aggregation; at 100 TB this is the cheapest possible plan)
- MinHash + LSH near-dup: shingle -> minhash signature (pandas UDF, numpy
  vectorized) -> band buckets (posexplode) -> groupBy band bucket ->
  candidate pairs only within buckets (no quadratic self-join)
- SimHash: 64-bit signature; banding over 4x16-bit chunks for candidates,
  hamming verify
- n-gram Jaccard verify on candidate pairs
All hashes are deterministic FNV/md5 derivatives: results are stable across
executors, retries and cluster sizes (required for resumable manifests).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window

from texoo_spark.textquality import fnv1a64

_MASK64 = (1 << 64) - 1
_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """One row per duplicated text: (text_hash, n_copies, keep_id).

    keep_id = min id (deterministic survivor). Single hash-shuffle;
    Catalyst does map-side partial agg automatically."""
    return (df
            .withColumn("text_hash", F.sha2(F.col(text_col), 256))
            .groupBy("text_hash")
            .agg(F.count("*").alias("n_copies"),
                 F.min(id_col).alias("keep_id"))
            .filter(F.col("n_copies") > 1))


def dedup_exact(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep the min-id row per distinct text (exact dedup survivor set)."""
    ranked = (df.withColumn("_h", F.sha2(F.col(text_col), 256))
              .withColumn("_rn", F.row_number().over(
                  Window.partitionBy("_h").orderBy(F.col(id_col)))))
    return ranked.filter(F.col("_rn") == 1).drop("_h", "_rn")


# ---------------------------------------------------------------------------
# MinHash signatures
# ---------------------------------------------------------------------------

def _shingles(text: str, k: int = 5) -> set[int]:
    """Word k-shingles hashed to 64-bit ints."""
    words = (text or "").lower().split()
    if len(words) < k:
        return {fnv1a64(" ".join(words))} if words else set()
    return {fnv1a64(" ".join(words[i:i + k]))
            for i in range(len(words) - k + 1)}


def _hash_params(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameters for universal hashing."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signature(text: str, num_hashes: int = 64,
                      shingle_k: int = 5,
                      params: tuple[np.ndarray, np.ndarray] | None = None
                      ) -> np.ndarray:
    a, b = params if params is not None else _hash_params(num_hashes)
    sh = _shingles(text, shingle_k)
    if not sh:
        return np.zeros(num_hashes, dtype=np.int64)
    x = np.fromiter(sh, dtype=np.uint64).astype(np.int64)
    # (a*x + b) mod p, vectorized over hashes x shingles
    vals = (a[:, None].astype(object) * x[None, :].astype(object)
            + b[:, None].astype(object)) % _MERSENNE
    return np.array([int(min(row)) for row in vals], dtype=np.int64)


def make_minhash_udf(num_hashes: int = 64, shingle_k: int = 5):
    params = _hash_params(num_hashes)

    @pandas_udf(ArrayType(LongType()))
    def minhash_udf(texts: pd.Series) -> pd.Series:
        return pd.Series([
            minhash_signature(t or "", num_hashes, shingle_k, params).tolist()
            for t in texts], dtype="object")
    return minhash_udf


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", num_hashes: int = 64,
                           bands: int = 16, shingle_k: int = 5) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH.

    Plan: one UDF projection, one posexplode (rows x bands), one shuffle on
    the band bucket, pair expansion only inside buckets. Never a full
    cross-join — this is what survives at 10^12 rows."""
    rows_per_band = num_hashes // bands
    sig = make_minhash_udf(num_hashes, shingle_k)
    with_sig = df.select(F.col(id_col).alias("id"),
                         sig(F.col(text_col)).alias("sig"))
    banded = with_sig.select(
        "id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.hash(F.slice(
                F.col("sig"),
                b * rows_per_band + 1, rows_per_band))))
        .alias("band", "bucket"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (left.join(right,
                      (F.col("l.band") == F.col("r.band"))
                      & (F.col("l.bucket") == F.col("r.bucket"))
                      & (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .distinct())


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        min_jaccard: float = 0.5) -> DataFrame:
    """Exact word-n-gram Jaccard similarity pairs (id_a < id_b, jaccard).

    Plan: distinct n-grams per doc (one JVM-side higher-order-function
    projection, no Python), self-join on gram, groupBy pair -> shared count,
    jaccard = shared / (|A| + |B| - shared). Fully SQL-expressible, so it is
    DuckDB-oracle-verified.

    Scale note: the gram self-join is quadratic in gram frequency — at
    10^12 rows run minhash_lsh_candidates first and use this operator as the
    exact verify stage on candidate pairs only (the standard LSH->verify
    layering, Leskovec et al., Mining of Massive Datasets ch. 3)."""
    words = F.split(F.lower(F.col(text_col)), " ")
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " ")))
    gdf = df.select(F.col(id_col).alias("id"), grams.alias("grams"))
    counts = gdf.select("id", F.size("grams").alias("n_grams"))
    exploded = gdf.select("id", F.explode("grams").alias("gram"))
    shared = (exploded.alias("l")
              .join(exploded.alias("r"),
                    (F.col("l.gram") == F.col("r.gram"))
                    & (F.col("l.id") < F.col("r.id")))
              .groupBy(F.col("l.id").alias("id_a"),
                       F.col("r.id").alias("id_b"))
              .agg(F.count("*").alias("shared")))
    ca = counts.select(F.col("id").alias("id_a"),
                       F.col("n_grams").alias("n_a"))
    cb = counts.select(F.col("id").alias("id_b"),
                       F.col("n_grams").alias("n_b"))
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (shared.join(ca, "id_a").join(cb, "id_b")
            .withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= min_jaccard)
            .select("id_a", "id_b", "jaccard"))


def jaccard(text_a: str, text_b: str, shingle_k: int = 5) -> float:
    a, b = _shingles(text_a, shingle_k), _shingles(text_b, shingle_k)
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word features (Charikar 2002 / Manku et al. 2007)."""
    words = (text or "").lower().split()
    if not words:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for w in words:
        h = fnv1a64(w)
        bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= (1 << i)
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK64).count("1")


@pandas_udf(LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    # stored as signed 64-bit (two's complement) for Spark LongType
    def signed(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v
    return pd.Series([signed(simhash64(t or "")) for t in texts])


def embedding_near_dups(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        n_planes: int = 12, bands: int = 3,
                        min_cosine: float = 0.95,
                        seed: int = 42) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-random-projection LSH
    (Charikar 2002): hash each vector to n_planes sign bits, band the bits,
    pair only within (band, bucket), verify exact cosine.

    No cross-join: candidate generation is one shuffle on the band bucket;
    the verify matmul runs on candidate pairs only."""
    first = df.select(vec_col).first()
    dims = len(first[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dims).astype(np.float32)
    bc = df.sparkSession.sparkContext.broadcast(planes)
    bits_per_band = n_planes // bands

    @pandas_udf(ArrayType(LongType()))
    def srp_udf(vecs: pd.Series) -> pd.Series:
        pl = bc.value
        out = []
        for v in vecs:
            bits = (pl @ np.asarray(v, dtype=np.float32)) > 0
            out.append([int(sum(int(b) << j for j, b in enumerate(
                bits[band * bits_per_band:(band + 1) * bits_per_band])))
                for band in range(bands)])
        return pd.Series(out, dtype="object")

    sig = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                    srp_udf(F.col(vec_col)).alias("sig"))
    banded = sig.select("id", "v",
                        F.posexplode("sig").alias("band", "bucket"))
    left, right = banded.alias("l"), banded.alias("r")
    pairs = (left.join(right,
                       (F.col("l.band") == F.col("r.band"))
                       & (F.col("l.bucket") == F.col("r.bucket"))
                       & (F.col("l.id") < F.col("r.id")))
             .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                     F.col("l.v").alias("v_a"), F.col("r.v").alias("v_b"))
             .dropDuplicates(["id_a", "id_b"]))
    dot = F.aggregate(F.zip_with("v_a", "v_b", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = (F.sqrt(F.aggregate(F.transform("v_a", lambda a: a * a),
                               F.lit(0.0), lambda acc, x: acc + x))
            * F.sqrt(F.aggregate(F.transform("v_b", lambda a: a * a),
                                 F.lit(0.0), lambda acc, x: acc + x)))
    return (pairs.withColumn("cosine", dot / norm)
            .filter(F.col("cosine") >= min_cosine)
            .select("id_a", "id_b", "cosine"))


def simhash_candidates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates: band the 64-bit simhash into 4 x 16-bit chunks;
    docs sharing any chunk are candidates (guaranteed to catch all pairs
    with hamming distance <= 3), then verify hamming distance."""
    with_sig = df.select(F.col(id_col).alias("id"),
                         simhash_udf(F.col(text_col)).alias("sig"))
    chunks = with_sig.select(
        "id", "sig",
        F.posexplode(F.array(*[
            F.shiftright(F.col("sig"), i * 16).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)])).alias("chunk_idx", "chunk"))
    left, right = chunks.alias("l"), chunks.alias("r")
    pairs = (left.join(right,
                       (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
                       & (F.col("l.chunk") == F.col("r.chunk"))
                       & (F.col("l.id") < F.col("r.id")))
             .select(F.col("l.id").alias("id_a"),
                     F.col("r.id").alias("id_b"),
                     F.col("l.sig").alias("sig_a"),
                     F.col("r.sig").alias("sig_b"))
             .distinct())
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (pairs.withColumn("hamming", hamming.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
