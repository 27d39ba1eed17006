"""Deduplication operators for web-scale training-data pipelines.

Spark-first designs (each returns/consumes DataFrames):
- exact duplicates: hash-groupBy on normalized text (one shuffle, map-side
  partial aggregation; at 100 TB this is the cheapest possible plan)
- MinHash + LSH near-dup: shingle -> minhash signature (pandas UDF, pure
  uint64 numpy — Mersenne-61 modular multiply via 32-bit split, no Python
  objects in the hot loop) -> band buckets (posexplode) -> groupBy band
  bucket -> candidate pairs only within buckets (no quadratic self-join)
- SimHash: 64-bit signature (batch FNV over the word table + unpackbits,
  one numpy reduceat per Arrow batch); banding over 4x16-bit chunks for
  candidates, hamming verify
- n-gram Jaccard verify on candidate pairs
All hashes are deterministic FNV/universal-hash derivatives: results are
stable across executors, retries and cluster sizes (required for resumable
manifests).

Cache lifecycle: each candidate generator persists its banded signature
stage into a module registry so both sides of the pair join share one
signature computation. Callers own the release: wrap calls in
dedup_cache_scope() (preferred) or call release_dedup_caches() between
batches — a long-lived service that never releases accumulates storage
memory. Bucket-drop LOGGING is off by default (it costs an eager job at
plan-construction time); enable with TEXOO_LSH_DIAGNOSTICS=1 or query
oversized_buckets() lazily.

Scale guards: every banded self-join caps bucket sizes (max_bucket_size) —
one degenerate bucket (boilerplate/empty texts sharing a band) would expand
quadratically in a single task at web scale. Oversized buckets are dropped
and COUNTED (no silent caps): the signature/banding stage is persisted so
the drop diagnostic and the pair join share one signature computation, and
the drop count is logged before the candidate plan is returned. Pairs whose
texts genuinely are near-dupes are still caught by their other bands
(standard practice, Leskovec et al., Mining of Massive Datasets ch. 3).
"""

from __future__ import annotations

import contextlib
import logging
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window

from texoo_spark.textquality import fnv1a64

log = logging.getLogger(__name__)

# banded signature DataFrames persisted by the LSH candidate generators;
# release with release_dedup_caches() (or wrap calls in dedup_cache_scope())
# when done with the candidate plans
_PERSISTED: list = []

# When True, the candidate generators run an extra diagnostic job at plan
# construction time that counts (and logs) dropped oversized LSH buckets.
# Off by default: the count is a full pass over the persisted banded stage,
# and candidate generation should stay lazy. Enable via the env var
# TEXOO_LSH_DIAGNOSTICS=1 or by setting this flag; the drop filter itself
# is ALWAYS applied — only the logging job is optional.
LSH_DIAGNOSTICS = os.environ.get("TEXOO_LSH_DIAGNOSTICS", "") not in ("", "0")


def _persist_tracked(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    return df


def release_dedup_caches() -> int:
    """Unpersist every banded signature cache created by
    minhash_lsh_candidates / simhash_candidates / embedding_near_dups in
    this process. Call after the candidate DataFrames have been consumed
    (a long-running service invoking the generators repeatedly should
    release between batches — or use dedup_cache_scope()). Returns the
    number of caches released."""
    n = len(_PERSISTED)
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
    return n


@contextlib.contextmanager
def dedup_cache_scope():
    """Context manager bounding the lifetime of the banded-signature
    caches: every cache persisted by candidate generators inside the
    block is unpersisted on exit.

        with dedup_cache_scope():
            pairs = minhash_lsh_candidates(df).collect()
    """
    mark = len(_PERSISTED)
    try:
        yield
    finally:
        while len(_PERSISTED) > mark:
            _PERSISTED.pop().unpersist()


_MASK64 = (1 << 64) - 1
_MERSENNE = (1 << 61) - 1
_M61 = np.uint64(_MERSENNE)

DEFAULT_MAX_BUCKET = 1000


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
# MinHash signatures — pure-uint64 Mersenne-61 universal hashing
# ---------------------------------------------------------------------------

_POLY = np.uint64(1099511628211)  # FNV prime as Karp-Rabin base (odd)


def _shingle_hashes(text: str, k: int = 5,
                    _cache: dict | None = None) -> np.ndarray:
    """Word k-shingles hashed to 64-bit ints, fully vectorized.

    Spec: each word is FNV1a-hashed once (cached across a batch), and a
    shingle's hash is the Karp-Rabin polynomial of its word hashes,
    sum_j W[i+j] * P^(k-1-j) mod 2^64 (P = the FNV prime). Texts shorter
    than k words yield one shingle over all their words (same polynomial,
    lower degree). Duplicates are NOT removed — minhash minima are
    invariant under duplication."""
    words = (text or "").lower().split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    if _cache is None:
        _cache = {}
    hs = np.fromiter(
        (_cache.get(w) or _cache.setdefault(w, np.uint64(fnv1a64(w)))
         for w in words), dtype=np.uint64, count=len(words))
    kk = min(k, len(words))
    win = np.lib.stride_tricks.sliding_window_view(hs, kk)  # [S x kk]
    coef = np.array([pow(int(_POLY), kk - 1 - j, 1 << 64) for j in range(kk)],
                    dtype=np.uint64)
    acc = np.zeros(win.shape[0], dtype=np.uint64)
    for j in range(kk):
        acc += win[:, j] * coef[j]                          # wraps mod 2^64
    return acc


def _shingles(text: str, k: int = 5) -> set[int]:
    """Distinct word k-shingle hashes (set view, for exact Jaccard)."""
    return set(np.unique(_shingle_hashes(text, k)).tolist())


def _hash_params(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameters for universal hashing, a,b < 2^61-1."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a.astype(np.uint64), b.astype(np.uint64)


def _mod61(x: np.ndarray) -> np.ndarray:
    """x (uint64, any value) mod 2^61-1, vectorized."""
    s = (x >> np.uint64(61)) + (x & _M61)    # < 2^61 + 8 < 2 * M61
    return np.where(s >= _M61, s - _M61, s)


def _mulmod61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a * x) mod 2^61-1 for uint64 arrays with a, x < 2^61.

    32-bit split multiply: a*x = hi*2^64 + mid*2^32 + lo with
    2^61 === 1 (mod M61), so 2^64 === 8 and m*2^32 === (m>>29) + (m&(2^29-1))<<32.
    Every intermediate fits in uint64 — no Python objects (the round-1
    object-dtype implementation was ~50x slower per signature batch)."""
    u32 = np.uint64(32)
    mask32 = np.uint64(0xFFFFFFFF)
    a_hi, a_lo = a >> u32, a & mask32
    x_hi, x_lo = x >> u32, x & mask32
    m = a_hi * x_lo + a_lo * x_hi                       # < 2^62
    mid = (m >> np.uint64(29)) + ((m & np.uint64(0x1FFFFFFF)) << u32)
    lo = a_lo * x_lo                                    # < 2^64 (wraps: no —
    # a_lo, x_lo < 2^32 so the product is exact in uint64)
    lo_red = (lo >> np.uint64(61)) + (lo & _M61)
    hi = (a_hi * x_hi) << np.uint64(3)                  # a_hi,x_hi < 2^29
    s = mid + lo_red + hi                               # < 2^63
    s = (s >> np.uint64(61)) + (s & _M61)               # < 2^61 + 4 < 2*M61
    return np.where(s >= _M61, s - _M61, s)


def _perm_hashes(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[(a_i * x_j + b_i) mod M61] as an [H x S] uint64 matrix.

    x is first reduced mod M61 as an UNSIGNED 64-bit value (the canonical
    universal-hash spec; round 1 inherited a signed-cast artifact)."""
    xr = _mod61(x)
    v = _mulmod61(a[:, None], xr[None, :]) + b[:, None]  # < 2*M61
    return np.where(v >= _M61, v - _M61, v)


def minhash_signature(text: str, num_hashes: int = 64,
                      shingle_k: int = 5,
                      params: tuple[np.ndarray, np.ndarray] | None = None
                      ) -> np.ndarray:
    a, b = params if params is not None else _hash_params(num_hashes)
    x = _shingle_hashes(text, shingle_k)
    if not len(x):
        return np.zeros(num_hashes, dtype=np.int64)
    return _perm_hashes(x, a, b).min(axis=1).astype(np.int64)


def minhash_signatures_batch(texts, num_hashes: int = 64, shingle_k: int = 5,
                             params: tuple[np.ndarray, np.ndarray] | None = None
                             ) -> list[list[int]]:
    """Signatures for a batch of texts in one numpy pass: all shingles of
    the batch are concatenated, then each of the H hash functions runs
    vectorized over the whole shingle vector with per-row minima via
    minimum.reduceat. The per-hash loop keeps temporaries at S_total
    elements (cache-resident) instead of materializing an [H x S_total]
    matrix — ~18x faster than the matrix form at typical batch sizes."""
    a, b = params if params is not None else _hash_params(num_hashes)
    cache: dict = {}
    parts = []
    offsets = [0]
    empty = []
    total = 0
    for t in texts:
        sh = _shingle_hashes(t, shingle_k, cache)
        empty.append(not len(sh))
        if len(sh):
            parts.append(sh)
            total += len(sh)
        offsets.append(total)
    if not total:
        return [[0] * num_hashes for _ in texts]
    x = np.concatenate(parts)
    xr = _mod61(x)
    starts = np.array([o for o, e in zip(offsets[:-1], empty) if not e])
    mins = np.empty((num_hashes, len(starts)), dtype=np.uint64)
    for h in range(num_hashes):
        v = _mulmod61(a[h], xr) + b[h]
        v = np.where(v >= _M61, v - _M61, v)
        mins[h] = np.minimum.reduceat(v, starts)
    mins = mins.astype(np.int64)
    out: list[list[int]] = []
    zeros = [0] * num_hashes
    col = 0
    for e in empty:
        if e:
            out.append(zeros)
        else:
            out.append(mins[:, col].tolist())
            col += 1
    return out


def make_minhash_udf(num_hashes: int = 64, shingle_k: int = 5):
    params = _hash_params(num_hashes)

    @pandas_udf(ArrayType(LongType()))
    def minhash_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            minhash_signatures_batch(texts, num_hashes, shingle_k, params),
            dtype="object")
    return minhash_udf


def _cap_buckets(banded: DataFrame, max_bucket_size: int | None,
                 what: str) -> DataFrame:
    """Drop LSH buckets larger than max_bucket_size before pair expansion.

    banded must already be persisted by the caller (the candidate join —
    and, when LSH_DIAGNOSTICS is on, the drop-count job — then share one
    signature computation). The drop filter always applies; the eager
    count+log job runs only when LSH_DIAGNOSTICS is enabled, so plan
    construction stays lazy by default. oversized_buckets() exposes the
    same drop set lazily for callers that want the numbers on demand."""
    if max_bucket_size is None:
        return banded
    counts = (banded.groupBy("band", "bucket")
              .agg(F.count("*").alias("_n")))
    if LSH_DIAGNOSTICS:
        dropped = counts.filter(F.col("_n") > max_bucket_size)
        row = dropped.agg(F.count("*").alias("n"),
                          F.max("_n").alias("top")).collect()[0]
        if row["n"]:
            log.warning(
                "%s: dropping %d oversized LSH bucket(s) (> %d members,"
                " max %d) — members remain discoverable through their"
                " other bands", what, row["n"], max_bucket_size, row["top"])
    ok = counts.filter(F.col("_n") <= max_bucket_size).drop("_n")
    return banded.join(ok, ["band", "bucket"])


def oversized_buckets(banded: DataFrame,
                      max_bucket_size: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """Lazy view of the (band, bucket, n) groups a candidate generator
    would drop at max_bucket_size — the on-demand form of the
    LSH_DIAGNOSTICS logging (no job runs until the caller acts on it)."""
    return (banded.groupBy("band", "bucket")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_bucket_size))


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", num_hashes: int = 64,
                           bands: int = 16, shingle_k: int = 5,
                           max_bucket_size: int | None = DEFAULT_MAX_BUCKET
                           ) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH.

    Plan: one UDF projection (persisted — computed once, shared by the
    bucket-size diagnostic and both sides of the pair join), one posexplode
    (rows x bands), one shuffle on the band bucket, pair expansion only
    inside size-capped buckets. Never a full cross-join — this is what
    survives at 10^12 rows."""
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
    banded = _persist_tracked(banded)
    capped = _cap_buckets(banded, max_bucket_size, "minhash_lsh_candidates")
    left = capped.alias("l")
    right = capped.alias("r")
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

def simhash64_batch(texts) -> np.ndarray:
    """64-bit SimHash per text (Charikar 2002 / Manku et al. 2007), one
    numpy pass per batch: every word of the batch is FNV-hashed once
    (unique-word cache), bits come from a single unpackbits view, and
    per-row +-1 sums use add.reduceat over row offsets."""
    rows = [(t or "").lower().split() for t in texts]
    flat: list[str] = []
    offsets = [0]
    for ws in rows:
        flat.extend(ws)
        offsets.append(len(flat))
    out = np.zeros(len(rows), dtype=np.uint64)
    if not flat:
        return out
    uniq = {w: np.uint64(fnv1a64(w)) for w in set(flat)}
    hs = np.fromiter((uniq[w] for w in flat), dtype=np.uint64,
                     count=len(flat))
    # bit i at column i: EXPLICIT little-endian byte layout (astype('<u8'))
    # so signatures are identical on big-endian executors too — the module
    # contract promises hash stability across cluster hardware
    bits = np.unpackbits(hs.astype("<u8").view(np.uint8).reshape(-1, 8),
                         axis=1, bitorder="little").astype(np.int32)
    contrib = bits * 2 - 1
    nonempty = np.array([i for i, ws in enumerate(rows) if ws])
    starts = np.array([offsets[i] for i in nonempty])
    acc = np.add.reduceat(contrib, starts, axis=0)       # [rows' x 64]
    sig_bits = (acc > 0).astype(np.uint8)
    packed_bytes = np.packbits(sig_bits, axis=1, bitorder="little")
    packed = packed_bytes.view("<u8").astype(np.uint64).ravel()
    out[nonempty] = packed
    return out


def simhash64(text: str) -> int:
    """Scalar SimHash (same spec as simhash64_batch)."""
    return int(simhash64_batch([text])[0])


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK64).count("1")


@pandas_udf(LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    # stored as signed 64-bit (two's complement) for Spark LongType
    return pd.Series(simhash64_batch(texts).astype(np.int64))


def embedding_near_dups(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        n_planes: int = 12, bands: int = 3,
                        min_cosine: float = 0.95,
                        seed: int = 42,
                        max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
                        dims: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-random-projection LSH
    (Charikar 2002): hash each vector to n_planes sign bits, band the bits,
    pair only within (band, bucket), verify exact cosine.

    No cross-join, and the banded self-join carries (id, band, bucket)
    ONLY — vectors are joined back exactly once per side after the
    candidate id pairs are made distinct, so full embeddings never ride
    through the band exchange (x bands duplication at web scale).
    Projections and the cosine verify run in float64 so results are
    reproducible across engines.

    Pass dims (the embedding dimensionality) to keep plan construction
    fully lazy; when omitted, one first() job reads it from the data."""
    if dims is None:
        dims = len(df.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dims)
    bc = df.sparkSession.sparkContext.broadcast(planes)
    bits_per_band = n_planes // bands
    weights = (1 << np.arange(bits_per_band, dtype=np.int64))

    @pandas_udf(ArrayType(LongType()))
    def srp_udf(vecs: pd.Series) -> pd.Series:
        pl = bc.value                                     # [P x D]
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ pl.T) > 0                           # [B x P]
        per_band = bits.reshape(len(mat), bands, bits_per_band)
        codes = (per_band * weights).sum(axis=2)          # [B x bands]
        return pd.Series([row.tolist() for row in codes], dtype="object")

    # posexplode DIRECTLY on the UDF call — a separate projection step
    # makes Catalyst stack two identical ArrowEvalPython operators (the
    # projection hashes every vector twice; verified on the physical plan)
    banded = df.select(F.col(id_col).alias("id"),
                       F.posexplode(srp_udf(F.col(vec_col)))
                       .alias("band", "bucket"))
    banded = _persist_tracked(banded)
    capped = _cap_buckets(banded, max_bucket_size, "embedding_near_dups")
    left, right = capped.alias("l"), capped.alias("r")
    pairs = (left.join(right,
                       (F.col("l.band") == F.col("r.band"))
                       & (F.col("l.bucket") == F.col("r.bucket"))
                       & (F.col("l.id") < F.col("r.id")))
             .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
             .distinct())
    vecs = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    joined = (pairs
              .join(vecs.select(F.col("id").alias("id_a"),
                                F.col("v").alias("v_a")), "id_a")
              .join(vecs.select(F.col("id").alias("id_b"),
                                F.col("v").alias("v_b")), "id_b"))
    dot = F.aggregate(F.zip_with("v_a", "v_b", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = (F.sqrt(F.aggregate(F.transform("v_a", lambda a: a * a),
                               F.lit(0.0), lambda acc, x: acc + x))
            * F.sqrt(F.aggregate(F.transform("v_b", lambda a: a * a),
                                 F.lit(0.0), lambda acc, x: acc + x)))
    return (joined.withColumn("cosine", dot / norm)
            .filter(F.col("cosine") >= min_cosine)
            .select("id_a", "id_b", "cosine"))


def make_window_hash_udf(n: int = 8):
    """Distinct n-word-window Karp-Rabin hashes per text (signed int64) —
    the building block for containment/contamination sweeps."""
    @pandas_udf(ArrayType(LongType()))
    def wh_udf(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in texts:
            hs = _shingle_hashes(t, n, cache)
            out.append(np.unique(hs).astype(np.int64).tolist())
        return pd.Series(out, dtype="object")
    return wh_udf


def ngram_contamination(train: DataFrame, test: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 8) -> DataFrame:
    """Benchmark-contamination sweep: test documents sharing ANY n-word
    window with ANY train document -> (test_id, n_contaminated) where
    n_contaminated counts the test doc's distinct contaminated windows
    (the standard n-gram-overlap decontamination check from the public
    LM-training literature, e.g. GPT-3 appendix C / PaLM).

    Plan: one pandas window-hash projection per side, train side distinct
    (one shuffle on h), inner join hash-partitioned on h, count per test
    id. Never a text-text join. At 10^12 rows materialize the train hash
    set once (bucketed by h) and reuse it across sweeps; a broadcast Bloom
    filter over train hashes makes a cheap approximate pre-filter."""
    u = make_window_hash_udf(n)
    th = (train.select(F.explode(u(F.col(text_col))).alias("h"))
          .distinct())
    te = test.select(F.col(id_col).alias("test_id"),
                     F.explode(u(F.col(text_col))).alias("h"))
    return (te.join(th, "h")
            .groupBy("test_id")
            .agg(F.count("*").alias("n_contaminated")))


def simhash_candidates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_hamming: int = 3,
                       max_bucket_size: int | None = DEFAULT_MAX_BUCKET
                       ) -> DataFrame:
    """Near-dup candidates: band the 64-bit simhash into 4 x 16-bit chunks;
    docs sharing any chunk are candidates (guaranteed to catch all pairs
    with hamming distance <= 3), then verify hamming distance. Buckets
    above max_bucket_size are dropped with a logged count."""
    with_sig = df.select(F.col(id_col).alias("id"),
                         simhash_udf(F.col(text_col)).alias("sig"))
    chunks = with_sig.select(
        "id", "sig",
        F.posexplode(F.array(*[
            F.shiftright(F.col("sig"), i * 16).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)])).alias("band", "bucket"))
    chunks = _persist_tracked(chunks)
    capped = _cap_buckets(chunks, max_bucket_size, "simhash_candidates")
    left, right = capped.alias("l"), capped.alias("r")
    pairs = (left.join(right,
                       (F.col("l.band") == F.col("r.band"))
                       & (F.col("l.bucket") == F.col("r.bucket"))
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
