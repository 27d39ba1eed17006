"""Deterministic feature encoders (SURVEY.md §2.4, E1-E10).

numpy reimplementations of texoo-core/.../encoder/impl/*.java, used as
vectorizers inside pandas UDFs; the Spark-ML equivalents (CountVectorizer,
NGram, HashingTF) are interchangeable at the pipeline level.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

# ---------------------------------------------------------------------------
# SurfaceEncoder (E4): 11 boolean surface-form features
# ref: texoo-core/.../encoder/impl/SurfaceEncoder.java:60-82,113-175
# ---------------------------------------------------------------------------

_LETTERS = re.compile(r"[^\W\d_]+", re.UNICODE)  # \p{L}
_NUM_PUNCT = re.compile(r"[^\d\W]|[\s]", re.UNICODE)  # chars NOT in \p{N}\p{P}

SURFACE_SIZE = 11


def _letters_only(token: str) -> str:
    return "".join(_LETTERS.findall(token))


def _is_num_or_punct(ch: str) -> bool:
    import unicodedata
    cat = unicodedata.category(ch)
    return cat.startswith("N") or cat.startswith("P")


def surface_features(token: str) -> np.ndarray:
    """[startsUpper, startsLower, allUpper, allLower, mixedCase, allNumeric,
    includesNumeric, startsNumeric, endsNumeric, startsPunct, endsPunct]."""
    token = token.strip()
    letters = _letters_only(token)
    starts_upper = bool(letters) and letters[:1].upper() == letters[:1]
    starts_lower = bool(letters) and letters[:1].lower() == letters[:1]
    all_upper = bool(letters) and letters.upper() == letters
    all_lower = letters.lower() == letters  # true for empty, like reference
    mixed = (not starts_upper) and (not all_upper) and (not all_lower)
    all_numeric = bool(token) and all(_is_num_or_punct(c) for c in token)
    includes_numeric = any(_is_num_or_punct(c) for c in token)
    starts_numeric = bool(token) and _is_num_or_punct(token[0])
    ends_numeric = bool(token) and _is_num_or_punct(token[-1])
    import unicodedata
    starts_punct = bool(token) and unicodedata.category(token[0]).startswith("P")
    ends_punct = bool(token) and unicodedata.category(token[-1]).startswith("P")
    return np.array([starts_upper, starts_lower, all_upper, all_lower, mixed,
                     all_numeric, includes_numeric, starts_numeric,
                     ends_numeric, starts_punct, ends_punct], dtype=np.float32)


# ---------------------------------------------------------------------------
# StructureEncoder (E7): 7 structural flags
# ref: texoo-core/.../encoder/impl/StructureEncoder.java:85-155
# vector order: [beginDoc, beginPar, isList, beginSent, endSent, endPar, endDoc]
# ---------------------------------------------------------------------------

STRUCTURE_SIZE = 7


def _is_nl(text: str) -> bool:
    return text == "*NL*" or text == "\n"


def structure_features_tokens(sent_tokens: list[list[str]]) -> list[np.ndarray]:
    """Per-token structure flags over a document's sentences of token texts."""
    result: list[np.ndarray] = []
    begin_doc, last_was_nl = True, True
    n_sents = len(sent_tokens)
    for si, toks in enumerate(sent_tokens):
        end_doc = si == n_sents - 1
        begin_sent = True
        n = len(toks)
        for i, t in enumerate(toks):
            nxt = toks[i + 1] if i + 1 < n else None
            end_sent = nxt is None
            is_list = begin_sent and t == "-"
            is_nl = _is_nl(t)
            is_next_nl = nxt is not None and _is_nl(nxt)
            result.append(np.array([
                begin_doc and begin_sent,
                last_was_nl and begin_sent,
                is_list,
                begin_sent,
                (end_sent and not is_nl) or is_next_nl,
                is_nl or (end_doc and end_sent),
                end_doc and end_sent,
            ], dtype=np.float32))
            begin_sent = False
            last_was_nl = is_nl
        begin_doc = False
    return result


def structure_features_sentences(sent_tokens: list[list[str]],
                                 sent_texts: list[str]) -> list[np.ndarray]:
    """Per-sentence structure flags (StructureEncoder.encodeSentences)."""
    result: list[np.ndarray] = []
    begin_doc, begin_par = True, True
    n = len(sent_tokens)
    for si, toks in enumerate(sent_tokens):
        end_doc = si == n - 1
        end_par = any(_is_nl(t) for t in toks)
        is_list = sent_texts[si].startswith("- ")
        result.append(np.array([
            begin_doc, begin_par or begin_doc, is_list, False, False,
            end_par or end_doc, end_doc,
        ], dtype=np.float32))
        begin_doc = False
        begin_par = end_par
    return result


# ---------------------------------------------------------------------------
# BagOfWordsEncoder (E1)
# ref: texoo-core/.../encoder/impl/BagOfWordsEncoder.java:64-215
# ---------------------------------------------------------------------------

class BagOfWordsEncoder:
    def __init__(self, min_word_length: int = 2, min_word_frequency: int = 1,
                 lowercase: bool = True,
                 stopwords: set[str] | None = None):
        self.min_word_length = min_word_length
        self.min_word_frequency = min_word_frequency
        self.lowercase = lowercase
        self.stopwords = stopwords or set()
        self.vocab: dict[str, int] = {}

    def _key(self, word: str) -> str:
        return word.lower() if self.lowercase else word

    def train(self, token_lists: list[list[str]]) -> "BagOfWordsEncoder":
        freq: dict[str, int] = {}
        for toks in token_lists:
            for t in toks:
                k = self._key(t)
                if len(k) >= self.min_word_length and k not in self.stopwords:
                    freq[k] = freq.get(k, 0) + 1
        words = sorted(w for w, c in freq.items()
                       if c >= self.min_word_frequency)
        self.vocab = {w: i for i, w in enumerate(words)}
        return self

    @property
    def size(self) -> int:
        return len(self.vocab)

    def encode(self, tokens: list[str]) -> np.ndarray:
        """n-hot over vocabulary."""
        v = np.zeros(self.size, dtype=np.float32)
        for t in tokens:
            i = self.vocab.get(self._key(t))
            if i is not None:
                v[i] = 1.0
        return v


# ---------------------------------------------------------------------------
# LetterNGramEncoder / TrigramEncoder (E2)
# ref: texoo-core/.../encoder/impl/LetterNGramEncoder.java:54-120
# ---------------------------------------------------------------------------

class LetterNGramEncoder:
    def __init__(self, n: int = 3, lowercase: bool = True):
        self.n = n
        self.lowercase = lowercase
        self.vocab: dict[str, int] = {}

    def ngrams(self, word: str) -> list[str]:
        w = "#" + (word.lower() if self.lowercase else word) + "#"
        if len(w) < self.n:
            return [w]
        return [w[i:i + self.n] for i in range(len(w) - self.n + 1)]

    def train(self, words: list[str]) -> "LetterNGramEncoder":
        grams = sorted({g for w in words for g in self.ngrams(w)})
        self.vocab = {g: i for i, g in enumerate(grams)}
        return self

    @property
    def size(self) -> int:
        return len(self.vocab)

    def encode(self, word: str) -> np.ndarray:
        v = np.zeros(self.size, dtype=np.float32)
        for g in self.ngrams(word):
            i = self.vocab.get(g)
            if i is not None:
                v[i] = 1.0
        return v


# ---------------------------------------------------------------------------
# BloomEncoder (E3): 4096 bits, 5 hashes
# ref: texoo-core/.../encoder/impl/BloomEncoder.java:10-35
# ---------------------------------------------------------------------------

class BloomEncoder:
    def __init__(self, bits: int = 4096, hashes: int = 5):
        self.bits = bits
        self.hashes = hashes

    def _positions(self, word: str) -> list[int]:
        out = []
        for i in range(self.hashes):
            h = hashlib.md5(f"{i}:{word}".encode("utf-8")).digest()
            out.append(int.from_bytes(h[:8], "little") % self.bits)
        return out

    def encode(self, tokens: list[str]) -> np.ndarray:
        v = np.zeros(self.bits, dtype=np.float32)
        for t in tokens:
            for p in self._positions(t.lower()):
                v[p] = 1.0
        return v


# ---------------------------------------------------------------------------
# PositionEncoder (E6) / OneHotEncoder (E9)
# ---------------------------------------------------------------------------

def position_features(tok_idx: int, n_tokens_sent: int,
                      sent_idx: int, n_sents: int) -> np.ndarray:
    """Token position flags in sentence/document
    (ref: encoder/impl/PositionEncoder.java)."""
    return np.array([
        tok_idx == 0,
        tok_idx == n_tokens_sent - 1,
        sent_idx == 0,
        sent_idx == n_sents - 1,
        (tok_idx + 1) / max(n_tokens_sent, 1),
        (sent_idx + 1) / max(n_sents, 1),
    ], dtype=np.float32)


# ---------------------------------------------------------------------------
# CharClassEncoder (E5): 11 boolean punctuation/symbol-class features
# ref: texoo-core/.../encoder/impl/CharClassEncoder.java:52-134
# ---------------------------------------------------------------------------

CHAR_CLASS_SIZE = 11

_CC_SYMBOLS = {"#", "$", "%", "@", "^", "_", "~", "¢", "£", "¥", "§", "€"}
_CC_OPARENS = {"(", "<", "[", "{", "-LRB-"}
_CC_CPARENS = {")", ">", "]", "}", "-RRB-"}
_CC_SLASHES = {"/", "\\", "|"}
_CC_DASHES = {"-", "–", "--", "---"}
_CC_TERMINATORS = {".", "!", "?"}
_CC_COLONS = {":", ";", "..."}
_CC_OPERATORS = {"&", "*", "+", "="}


def char_class_features(token: str) -> np.ndarray:
    """[symbol, operator, openingQuote, closingQuote, openingParen,
    closingParen, slash, comma, dash, sentenceTerminator, colon].

    As-implemented parity with CharClassEncoder.java INCLUDING its
    copy-paste quirk: isOpeningQuote/isClosingQuote test membership in the
    SYMBOLS list (java:91-99), so quote characters never set the quote
    flags while symbols like '#' set all three — downstream models were
    trained on these vectors, so we reproduce them bit-for-bit."""
    t = token.strip()
    return np.array([
        t in _CC_SYMBOLS,
        t in _CC_OPERATORS,
        t in _CC_SYMBOLS,      # java isOpeningQuote: symbols.contains
        t in _CC_SYMBOLS,      # java isClosingQuote: symbols.contains
        t in _CC_OPARENS,
        t in _CC_CPARENS,
        t in _CC_SLASHES,
        t == ",",
        t in _CC_DASHES,
        t in _CC_TERMINATORS,
        t in _CC_COLONS,
    ], dtype=np.float32)


# ---------------------------------------------------------------------------
# Word2Vec binary model reader (E8 load path)
# ref: texoo-core/.../encoder/impl/Word2VecEncoder.java:95-110 (loads
# BINARY/GOOGLE/DL4J/TEXT model files); this parses the standard public
# word2vec .bin layout: b"<vocab> <dim>\n" header, then per word the
# space-terminated word bytes followed by dim little-endian float32s
# (optionally newline-separated).
# ---------------------------------------------------------------------------

def read_word2vec_binary(path: str, normalize: bool = False
                         ) -> "EmbeddingLookup":
    words: list[str] = []
    rows: list[np.ndarray] = []
    with open(path, "rb") as f:
        header = f.readline().split()
        vocab_size, dim = int(header[0]), int(header[1])
        for _ in range(vocab_size):
            wb = bytearray()
            while True:
                c = f.read(1)
                if not c or c == b" ":
                    break
                if c != b"\n":
                    wb.extend(c)
            vec = np.frombuffer(f.read(4 * dim), dtype="<f4")
            if len(vec) != dim:
                raise ValueError("truncated word2vec binary file")
            words.append(wb.decode("utf-8"))
            rows.append(vec)
    mat = np.vstack(rows)
    if normalize:
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
    return EmbeddingLookup(words, mat)


def write_word2vec_binary(path: str, words: list[str],
                          matrix: np.ndarray) -> None:
    """Standard word2vec .bin writer (golden-test counterpart)."""
    with open(path, "wb") as f:
        f.write(f"{len(words)} {matrix.shape[1]}\n".encode())
        for w, row in zip(words, matrix):
            f.write(w.encode("utf-8") + b" ")
            f.write(np.asarray(row, dtype="<f4").tobytes())
            f.write(b"\n")


class EmbeddingLookup:
    """E8 (Word2VecEncoder/FastTextEncoder shape): pretrained embedding
    lookup from a broadcastable {word -> row index} + matrix pair; unknown
    words map to the zero vector. Use np.take over token index arrays.
    Load binary model files with read_word2vec_binary."""

    def __init__(self, words: list[str], matrix: np.ndarray):
        self.index = {w: i for i, w in enumerate(words)}
        self.matrix = np.vstack([matrix.astype(np.float32),
                                 np.zeros((1, matrix.shape[1]),
                                          dtype=np.float32)])
        self.unk = len(words)

    @property
    def size(self) -> int:
        return self.matrix.shape[1]

    def encode(self, word: str) -> np.ndarray:
        return self.matrix[self.index.get(word, self.unk)]

    def encode_tokens(self, tokens: list[str]) -> np.ndarray:
        idx = np.fromiter((self.index.get(t, self.unk) for t in tokens),
                          dtype=np.int64, count=len(tokens))
        return np.take(self.matrix, idx, axis=0)


class HeadingEncoder:
    """E10 (texoo-sector/.../encoder/HeadingEncoder.java:29-92): multi-word
    heading bag over a trained heading vocabulary with an `other` fallback
    dimension at index 0."""

    def __init__(self, headings: list[str], min_frequency: int = 1):
        freq: dict[str, int] = {}
        for h in headings:
            for w in h.lower().split():
                freq[w] = freq.get(w, 0) + 1
        words = sorted(w for w, c in freq.items() if c >= min_frequency)
        self.vocab = {w: i + 1 for i, w in enumerate(words)}  # 0 = other

    @property
    def size(self) -> int:
        return len(self.vocab) + 1

    def encode(self, heading: str) -> np.ndarray:
        v = np.zeros(self.size, dtype=np.float32)
        hit = False
        for w in (heading or "").lower().split():
            i = self.vocab.get(w)
            if i is not None:
                v[i] = 1.0
                hit = True
        if not hit:
            v[0] = 1.0  # other
        return v


def encoder_set(*vectors: np.ndarray) -> np.ndarray:
    """Feature concatenation (E12, Span.getVector(encoders) /
    EncoderSet semantics: Span.java:221-231)."""
    return np.concatenate([np.asarray(v, dtype=np.float32) for v in vectors])


class OneHotEncoder:
    def __init__(self, labels: list[str]):
        seen: dict[str, int] = {}
        for lb in labels:
            if lb not in seen:
                seen[lb] = len(seen)
        self.index = seen

    @property
    def size(self) -> int:
        return len(self.index)

    def encode(self, label: str) -> np.ndarray:
        v = np.zeros(self.size, dtype=np.float32)
        i = self.index.get(label)
        if i is not None:
            v[i] = 1.0
        return v
