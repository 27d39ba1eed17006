"""Sequence-tagger inference harness tests (A2 dataflow)."""

import numpy as np
import pytest

from texoo_spark.tagger import TAGS, LinearTagger


def test_forward_softmax():
    t = LinearTagger.capitalized_mention_baseline()
    feats = np.zeros((2, 11), dtype=np.float32)
    feats[0, 0] = 1  # startsUpper
    feats[1, 3] = 1  # allLower
    probs = t.forward(feats)
    assert probs.shape == (2, 3)
    assert np.allclose(probs.sum(axis=1), 1.0)
    assert TAGS[probs[0].argmax()] == "B"
    assert TAGS[probs[1].argmax()] == "O"


def test_tag_tokens_decodes_spans():
    t = LinearTagger.capitalized_mention_baseline()
    toks = ["Berlin", "is", "a", "city", "."]
    spans = t.tag_tokens(toks, [len(toks)])
    assert [(s, e) for s, e, _, _ in spans] == [(0, 1)]
    assert spans[0][3] > 0.5  # confidence from softmax


@pytest.mark.spark
def test_tag_mentions_spark():
    from texoo_spark.session import get_spark
    from texoo_spark.pipeline import extract_turns
    from texoo_spark.tagger import tag_mentions
    spark = get_spark("texoo-tagger-test", master="local[2]",
                      shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        [("c", 0, "user", "Berlin is far from Madrid today.", None)],
        "conv_id string, turn_idx int, role string, text string, tool string")
    out = tag_mentions(extract_turns(df, strip_html_first=False)).collect()[0]
    surfaces = [out.extracted_text[b:e]
                for b, e in zip(out.m_begin, out.m_end)]
    assert surfaces == ["Berlin", "Madrid"]
    assert all(lb == "GENERIC" for lb in out.m_label)
    assert all(c > 0.5 for c in out.m_confidence)
