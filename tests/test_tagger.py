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


# ---------------------------------------------------------------------------
# Trained CoNLL lane (A2, round 2): deterministic training + pinned train F1
# vs MentionAnnotatorEvaluation semantics (STRONG span match, V1 evaluator)
# ---------------------------------------------------------------------------

def test_train_conll_tagger_deterministic_and_pinned_f1():
    import numpy as np
    from texoo_spark import tagger as tg
    from texoo_spark.metrics import ner_counts, prf1
    from texoo_spark.spans import decode_bio2

    tagger, enc = tg.train_conll_tagger()
    assert enc.size == 244
    assert tagger.weights.shape == (tg.SURFACE_SIZE + 244, len(tg.TAGS))

    # bit-identical retrain (zero init, full-batch GD, float64, no RNG):
    # the default path loads the bundled resources/tagger_conll.npz;
    # force_retrain actually trains — both must agree exactly, proving
    # the shipped weights ARE the deterministic training result.
    tagger2, enc2 = tg.train_conll_tagger(force_retrain=True)
    assert np.array_equal(tagger.weights, tagger2.weights)
    assert np.array_equal(tagger.bias, tagger2.bias)
    assert enc.vocab == enc2.vocab

    # train-set STRONG span F1 pinned at 1.0 (16 gold mentions, 0 fp, 0 fn)
    tp = fp = fn = 0
    for toks, tags, bounds in tg.conll_fixture_examples():
        gold = [(s, e) for s, e, _, _ in decode_bio2(tags, None, None,
                                                     bounds)]
        pred = [(s, e) for s, e, _, _ in tagger.tag_tokens(toks, bounds)]
        a, b, c = ner_counts(pred, gold, "STRONG")
        tp += a
        fp += b
        fn += c
    assert (tp, fp, fn) == (16, 0, 0)
    p, r, f1 = prf1(tp, fp, fn)
    assert (p, r, f1) == (1.0, 1.0, 1.0)


def test_trained_tagger_generalizes_capitalization():
    """On unseen all-lowercase tokens the trained model must predict O; a
    capitalized fixture word must open a mention span."""
    from texoo_spark import tagger as tg
    tagger, _ = tg.train_conll_tagger()
    spans = tagger.tag_tokens(["the", "quick", "table"], [3])
    assert spans == []
    spans = tagger.tag_tokens(["LONDON", "beat", "them"], [3])
    assert [s[:2] for s in spans] == [(0, 1)]


def test_sparse_forward_matches_dense():
    """The gather+segment-sum forward must reproduce the dense matmul
    path: identical spans on the fixture, probabilities equal to within
    float summation reordering."""
    import numpy as np
    from texoo_spark.tagger import conll_fixture_examples, train_conll_tagger
    tagger, _enc = train_conll_tagger()
    for toks, _tags, bounds in conll_fixture_examples()[:8]:
        if not toks:
            continue
        dense = tagger.forward(tagger.featurize(toks))
        sparse = tagger._sparse_probs(tagger.featurizer.indices(toks))
        np.testing.assert_allclose(sparse, dense, rtol=0, atol=1e-12)
        assert np.array_equal(sparse.argmax(1), dense.argmax(1))
