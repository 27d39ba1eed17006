"""A2 reference-architecture BiLSTM: architecture pinned against the
bundled annotator.xml, feature-space parity with the reference encoders,
deterministic fixture training (span F1 1.0), decode + confidence
semantics (BIOESTag.java), V1 evaluation under STRONG matching."""

import os

import numpy as np
import pytest

from texoo_spark.bilstm import (BIOES, MODEL_DIR, BiLSTMTagger,
                                ReferenceFeaturizer, fixture_documents,
                                fixture_span_f1, keep_only_printable,
                                load_trigram_vocab, parse_annotator_xml,
                                reference_ngrams, train_fixture_bilstm)

pytestmark = pytest.mark.skipif(
    not os.path.exists(MODEL_DIR),
    reason="reference model resources not available")


def test_xml_architecture_matches_shipped_config():
    conf = parse_annotator_xml()
    assert conf["nin"] == 24680
    assert conf["ffw"] == 300 and conf["ffw1_nin"] == 300
    assert conf["lstm"] == 100 and conf["lstm_nin"] == 300
    assert conf["nout"] == 5
    assert conf["lr"] == 0.032 and conf["rms_decay"] == 0.95
    assert conf["l2"] == 1e-4 and conf["forget_bias"] == 1
    assert conf["seed"] == 1505148779882


def test_trigram_vocab_is_the_shipped_file():
    v = load_trigram_vocab()
    assert len(v) == 24665
    assert v[:3] == ["#th", "the", "he#"]   # trigram.tsv.gz rows 0-2
    assert v[3] == "#ox"


def test_feature_space_dimensions():
    feat = ReferenceFeaturizer(load_trigram_vocab())
    assert feat.nin == 24680                # POS 4 + SUR 11 + TRI 24665
    conf = parse_annotator_xml()
    assert feat.nin == conf["nin"]


def test_reference_ngrams_parity():
    # LetterNGramEncoder.generateNGrams: "cat" -> [#ca, cat, at#]
    assert reference_ngrams("cat") == ["#ca", "cat", "at#"]
    assert reference_ngrams("A") == ["#a#"]
    # keepOnlyPrintableChars drops spaces/control, keeps L/N/P/Sm/Sc, lowers
    assert keep_only_printable("Don't $5 +x \t ok") == "don't$5+xok"
    # empty after filtering -> '##' (len 2) -> NO ngrams (no fallback)
    assert reference_ngrams("   ") == []


def test_position_flags():
    feat = ReferenceFeaturizer(["#ca", "cat", "at#"])
    doc = feat.encode_document([["cat", "cat"], ["cat"]])
    # token (0,0): beginDoc(0), beginSent(1); token (0,1): endSent(2)
    assert {0, 1} <= set(doc[0][0]) and 3 not in doc[0][0]
    assert 2 in doc[0][1] and 0 not in doc[0][1] and 1 not in doc[0][1]
    # token (1,0) is both sentence begin/end and doc end, not doc begin
    assert {1, 2, 3} <= set(doc[1][0]) and 0 not in doc[1][0]


def test_parameter_shapes():
    m = BiLSTMTagger()
    assert m.p["W0"].shape == (24680, 300)
    assert m.p["W1"].shape == (300, 300)
    for d in ("f", "b"):
        assert m.p[f"Wx_{d}"].shape == (300, 400)
        assert m.p[f"Wh_{d}"].shape == (100, 400)
        assert m.p[f"pp_{d}"].shape == (3, 100)
        # forget gate bias initialized to 1 (config forgetGateBiasInit)
        assert np.all(m.p[f"bg_{d}"][100:200] == 1.0)
        assert np.all(m.p[f"bg_{d}"][:100] == 0.0)
    assert m.p["Wo"].shape == (100, 5)


def test_seeded_init_is_deterministic():
    a, b = BiLSTMTagger(), BiLSTMTagger()
    for k in a.p:
        assert np.array_equal(a.p[k], b.p[k]), k


def test_fixture_training_reaches_f1_one():
    model, feat, info = train_fixture_bilstm()
    assert info["f1"] == 1.0
    docs = fixture_documents()
    assert fixture_span_f1(model, feat, docs) == 1.0


def test_fixture_prediction_goldens():
    """Trained-model span predictions on fixture doc 0 (the soccer
    snippet): LONDON, Green Star, Willesden, St Albans, Brentford as
    token spans — exact gold mention boundaries."""
    model, feat, _ = train_fixture_bilstm()
    sents, _tags = fixture_documents()[0]
    spans = model.tag_document_spans(sents, feat)
    assert [(s, e) for s, e, _, _ in spans] == [
        (6, 7), (17, 19), (20, 21), (23, 24), (25, 26)]
    toks = [t for s in sents for t in s]
    assert toks[6] == "LONDON"
    assert toks[17:19] == ["Green", "Star"]


def test_confidence_semantics():
    """BIOESTag.java:62-64: O-tag confidence = p(O); mention tags carry
    1 - p(O) — all decoded mention confidences must be > 0.5 on the
    (fully fit) fixture."""
    model, feat, _ = train_fixture_bilstm()
    for sents, _t in fixture_documents():
        for _s, _e, _lb, conf in model.tag_document_spans(sents, feat):
            assert 0.5 < conf <= 1.0


def test_bioes_label_order_is_reference():
    assert BIOES == ["S", "B", "I", "E", "O"]  # BIOESTag.Label


def test_v1_metrics_on_fixture():
    """MentionAnnotatorEvaluation semantics: micro P/R/F1 over STRONG
    span matches via the V1 metrics module."""
    from texoo_spark.metrics import prf1
    from texoo_spark.spans import bioes_to_bio2, decode_bio2
    model, feat, _ = train_fixture_bilstm()
    tp = fp = fn = 0
    for sents, gold_bioes in fixture_documents():
        gold_bio2 = [t for s in gold_bioes for t in bioes_to_bio2(s)]
        bounds, off = [], 0
        for s in sents:
            off += len(s)
            bounds.append(off)
        gold = {(b, e) for b, e, _, _ in
                decode_bio2(gold_bio2, None, None, bounds)}
        pred = {(b, e) for b, e, _, _ in
                model.tag_document_spans(sents, feat)}
        tp += len(gold & pred)
        fp += len(pred - gold)
        fn += len(gold - pred)
    p, r, f1 = prf1(tp, fp, fn)
    assert (p, r, f1) == (1.0, 1.0, 1.0)


def test_bundled_model_data_matches_reference_bytes():
    """The bundled copies of the reference-shipped public model data
    (trigram vocab, annotator.xml, CoNLL fixture) are byte-identical to
    the reference checkout when it is present; the lanes themselves only
    ever read the bundled copies (no runtime reference dependency)."""
    import os
    from texoo_spark.maxent import resource_path
    ref_model = ("/root/reference/texoo-entity-recognition/src/main/"
                 "resources/models/"
                 "MentionAnnotator_en_NER-GENERIC_WikiNER+tri_20170309")
    ref_fix = ("/root/reference/texoo-entity-recognition/src/test/"
               "resources/datasets/CoNLL2003.conll")
    pairs = [(os.path.join(ref_model, "trigram.tsv.gz"), "trigram.tsv.gz"),
             (os.path.join(ref_model, "annotator.xml"), "annotator.xml"),
             (ref_fix, "CoNLL2003.conll")]
    for ref, name in pairs:
        if not os.path.exists(ref):
            pytest.skip("reference checkout absent")
        with open(ref, "rb") as a, open(resource_path(name), "rb") as b:
            assert a.read() == b.read(), name


def test_bundled_weights_load_and_pin_goldens():
    """The shipped float32 weight bundle reproduces the float64
    training result's pinned behavior: fixture span F1 1.0 (so shipping
    weights instead of training in driver paths loses nothing). The
    bundle is loaded EXPLICITLY here — train_fixture_bilstm prefers an
    exact local float64 cache when one exists, so on a warmed box the
    default path would not exercise the bundle."""
    from texoo_spark.maxent import bundled_path
    bundle = bundled_path("bilstm_fixture_5f26d66dcd754320.npz")
    assert bundle
    conf = parse_annotator_xml()
    vocab = load_trigram_vocab()
    feat = ReferenceFeaturizer(vocab)
    model = BiLSTMTagger(conf)
    data = np.load(bundle)
    for k in model.p:
        model.p[k] = np.ascontiguousarray(data[k].astype(np.float64))
    assert float(data["_f1"][0]) == 1.0
    docs = fixture_documents()
    assert fixture_span_f1(model, feat, docs) == 1.0
    # and the default path (whichever source it loads) pins the same F1
    model2, feat2, info = train_fixture_bilstm()
    assert info["f1"] == 1.0
    assert fixture_span_f1(model2, feat2, docs) == 1.0
