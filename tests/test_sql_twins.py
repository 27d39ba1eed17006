"""Property tests for the DuckDB SQL oracle twins of the engine's hash
specs (FNV-1a / Karp-Rabin shingles / Mersenne-61 MinHash / SimHash).

These SQL builders are load-bearing correctness infrastructure: the
driver's value-level oracle gate trusts them to reproduce the Python
implementations bit-for-bit. Fuzzed here with hypothesis (derandomized —
the driver's pytest gate must not fail on a novel random example) over
strings including multi-byte UTF-8 and astral-plane code points that the
bundled ASCII test tables never exercise."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

import __spark_entry__ as E
from texoo_spark.dedup import (_shingle_hashes, hamming64,
                               minhash_signature, simhash64)
from texoo_spark.textquality import fnv1a64

SETTINGS = dict(derandomize=True, max_examples=25, deadline=None)

# unicode words: letters/symbols incl. astral plane, no whitespace or
# surrogates (unpaired surrogates can't round-trip through UTF-8)
_word = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Zs", "Zl", "Zp",
                                                 "Cc"),
                           min_codepoint=0x21),
    min_size=1, max_size=8)


def _con(df: pd.DataFrame):
    con = duckdb.connect()
    con.register("t", df)
    return con


@settings(**SETTINGS)
@given(st.lists(_word, min_size=1, max_size=6))
def test_fnv1a64_twin(words):
    df = pd.DataFrame({"s": words})
    got = _con(df).execute(
        "SELECT " + E._SQL_FNV.format(s="s") + " FROM t").fetchall()
    assert [int(r[0]) for r in got] == [fnv1a64(w) for w in words]


@settings(**SETTINGS)
@given(st.lists(_word, min_size=5, max_size=12))
def test_karp_rabin_shingles_twin(words):
    """_sql_shingles contract: inputs have >= k words (the oracles only
    feed it documents-table texts, min 10 words)."""
    text = " ".join(words)
    py = _shingle_hashes(text.lower(), 5).tolist()
    df = pd.DataFrame({"ws": [[w.lower() for w in words]]})
    con = _con(df)
    sql = ("SELECT " + E._sql_shingles(
        "(" + E._sql_word_hashes("ws") + ")", 5) + " FROM t")
    got = [int(x) for x in con.execute(sql).fetchall()[0][0]]
    assert got == py


@settings(**SETTINGS)
@given(st.lists(_word, min_size=5, max_size=12))
def test_minhash_signature_twin(words):
    text = " ".join(words)
    py = minhash_signature(text.lower(), num_hashes=64).tolist()
    df = pd.DataFrame({"ws": [[w.lower() for w in words]]})
    sql = ("SELECT " + E._sql_minhash_sig(
        "(" + E._sql_shingles(
            "(" + E._sql_word_hashes("ws") + ")", 5) + ")") + " FROM t")
    got = [int(x) for x in _con(df).execute(sql).fetchall()[0][0]]
    assert got == py


@settings(**SETTINGS)
@given(st.lists(_word, min_size=1, max_size=12))
def test_simhash_twin(words):
    text = " ".join(words)
    py = simhash64(text.lower())
    df = pd.DataFrame({"ws": [[w.lower() for w in words]]})
    sql = ("SELECT " + E._sql_simhash(
        "(" + E._sql_word_hashes("ws") + ")") + " FROM t")
    got = int(_con(df).execute(sql).fetchall()[0][0])
    assert got == py


@settings(**SETTINGS)
@given(st.integers(0, (1 << 64) - 1), st.integers(0, (1 << 64) - 1))
def test_hamming_twin(a, b):
    df = pd.DataFrame({"sa": [a], "sb": [b]})
    # HUGEINT columns via explicit cast (pandas uint64 -> DuckDB)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT CAST(? AS HUGEINT) AS sa,"
                " CAST(? AS HUGEINT) AS sb", [str(a), str(b)])
    got = int(con.execute(
        "SELECT " + E._sql_hamming("sa", "sb") + " FROM t").fetchall()[0][0])
    assert got == hamming64(a, b)


def test_fnv_known_vectors():
    """Anchor the twin tests to published FNV-1a test vectors."""
    assert fnv1a64("") == 0xcbf29ce484222325
    assert fnv1a64("a") == 0xaf63dc4c8601ec8c
    assert fnv1a64("foobar") == 0x85944171f73967e8


@pytest.mark.parametrize("text", [
    "naïve café über straße",              # 2-byte UTF-8
    "日本語 中文 한국어",                    # 3-byte UTF-8
    "emoji 👍 and 🎉 plane-1",              # astral plane (4-byte)
    "mixed ASCII ümlaut 漢字 👾 tail",
])
def test_multibyte_fnv_twin(text):
    words = text.split()
    df = pd.DataFrame({"s": words})
    got = _con(df).execute(
        "SELECT " + E._SQL_FNV.format(s="s") + " FROM t").fetchall()
    assert [int(r[0]) for r in got] == [fnv1a64(w) for w in words]


@settings(**SETTINGS)
@given(st.lists(st.text(max_size=80), min_size=1, max_size=8))
def test_fingerprint_batch_matches_scalar(texts):
    """The vectorized batch fingerprint (UDF hot path) must be
    bit-identical to the scalar definition on arbitrary text incl.
    multi-space/tab runs and unicode."""
    from texoo_spark.textquality import (document_fingerprint,
                                         document_fingerprints_batch)
    got = document_fingerprints_batch(texts)
    assert got == [document_fingerprint(t) for t in texts]


def test_fingerprint_batch_window_edges():
    from texoo_spark.textquality import (document_fingerprint,
                                         document_fingerprints_batch)
    texts = ["", "one", " ".join(f"w{i}" for i in range(8)),     # == window
             " ".join(f"w{i}" for i in range(9)),                # window+1
             "a  b\tc\nd   e f g h i j k",                        # messy ws
             "ü " * 20]                                           # multibyte
    assert document_fingerprints_batch(texts) == [
        document_fingerprint(t) for t in texts]
