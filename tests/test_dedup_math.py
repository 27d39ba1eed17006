"""Equality tests for the vectorized dedup hash math (round-2 rework).

The uint64 split-multiply Mersenne-61 path, the Karp-Rabin shingle hashes
and the batched SimHash must agree exactly with straightforward Python
big-int reference implementations — the vectorization must never change a
single signature value (resumable manifests depend on hash stability)."""

import numpy as np
import pytest

from texoo_spark.dedup import (_POLY, _hash_params, _mod61, _mulmod61,
                               _perm_hashes, _shingle_hashes,
                               minhash_signature, minhash_signatures_batch,
                               simhash64, simhash64_batch)
from texoo_spark.textquality import fnv1a64

M61 = (1 << 61) - 1

TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "hello",
    "",
    "a b c d e f g h i j k",
    "x " * 200,
    "one two three four",          # exactly k-1 words at k=5
    "one two three four five",     # exactly k words
    "spark table scan join filter exchange shuffle broadcast",
]


def test_mulmod61_vs_bigint():
    rng = np.random.RandomState(7)
    a = rng.randint(0, M61, size=500).astype(np.uint64)
    x = rng.randint(0, M61, size=500).astype(np.uint64)
    got = _mulmod61(a, x)
    exp = [(int(ai) * int(xi)) % M61 for ai, xi in zip(a, x)]
    assert got.tolist() == exp


def test_mod61_full_range():
    vals = np.array([0, 1, M61 - 1, M61, M61 + 1, 2**64 - 1, 2**63,
                     123456789123456789], dtype=np.uint64)
    assert _mod61(vals).tolist() == [int(v) % M61 for v in vals.tolist()]


def test_perm_hashes_vs_bigint():
    a, b = _hash_params(16)
    x = np.array([0, 1, 2**64 - 1, 987654321987654321], dtype=np.uint64)
    got = _perm_hashes(x, a, b)
    for i in range(16):
        for j, xv in enumerate(x.tolist()):
            assert int(got[i, j]) == (int(a[i]) * (xv % M61)
                                      + int(b[i])) % M61


def _ref_shingles(text, k=5):
    """Naive big-int Karp-Rabin shingle hashes."""
    words = (text or "").lower().split()
    if not words:
        return []
    kk = min(k, len(words))
    hs = [fnv1a64(w) for w in words]
    out = []
    for i in range(len(words) - kk + 1):
        acc = 0
        for j in range(kk):
            acc = (acc + hs[i + j] * pow(int(_POLY), kk - 1 - j, 1 << 64)) \
                % (1 << 64)
        out.append(acc)
    return out


@pytest.mark.parametrize("text", TEXTS)
def test_shingle_hashes_vs_bigint(text):
    assert _shingle_hashes(text).tolist() == _ref_shingles(text)


def test_minhash_batch_equals_scalar():
    params = _hash_params(64)
    batch = minhash_signatures_batch(TEXTS, 64, 5, params)
    for t, sig in zip(TEXTS, batch):
        assert sig == minhash_signature(t, 64, 5, params).tolist()


def test_minhash_vs_bigint_reference():
    params = _hash_params(64)
    a, b = params
    for t in TEXTS:
        sh = _ref_shingles(t)
        if not sh:
            exp = [0] * 64
        else:
            exp = [min((int(ai) * (x % M61) + int(bi)) % M61 for x in sh)
                   for ai, bi in zip(a.tolist(), b.tolist())]
        assert minhash_signature(t, 64, 5, params).tolist() == exp


def _ref_simhash(text):
    words = (text or "").lower().split()
    if not words:
        return 0
    acc = [0] * 64
    for w in words:
        h = fnv1a64(w)
        for i in range(64):
            acc[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def test_simhash_vs_bigint_reference():
    got = simhash64_batch(TEXTS)
    for t, g in zip(TEXTS, got.tolist()):
        assert g == _ref_simhash(t)
        assert simhash64(t) == g
