"""MaxEnt tokenizer parity lane: the reference's ACTUAL OpenNLP GIS model
(bundled bytes identical to texoo-core's en-token.bin), byte-decoded and
evaluated in Python. These tests pin (a) the binary reader, (b) golden
OpenNLP tokenization behaviors, (c) the reference JUnit token counts, and
(d) cross-lane corroboration with the deterministic rule tokenizer."""

from texoo_spark.maxent import (GISModel, maxent_tokenize_pos, token_context,
                                token_model)
from texoo_spark.textops import tokenize_pos


def toks(text):
    return [text[b:e] for b, e in maxent_tokenize_pos(text)]


def test_gis_model_reads_exactly():
    m = token_model()
    assert m.outcomes == ["T", "F"]
    assert m.correction_constant == 1
    assert m.correction_param == 0.0
    assert len(m.params) == 35505  # every predicate byte consumed


def test_golden_opennlp_splits():
    assert toks("don't") == ["do", "n't"]
    assert toks("Python's,") == ["Python", "'s", ","]
    assert toks("etc.,") == ["etc.", ","]
    assert toks("U.S.") == ["U.S."]
    assert toks("29.7") == ["29.7"]
    assert toks("1,007") == ["1,007"]
    assert toks("Jones-Davies") == ["Jones-Davies"]
    assert toks("km/h") == ["km/h"]
    assert toks("end.") == ["end", "."]
    assert toks("Dr.") == ["Dr."]        # abbreviation bypass
    assert toks("e.g.") == ["e.g."]      # abbreviation bypass
    assert toks("O'Brien") == ["O'Brien"]


def test_reference_junit_token_counts():
    """DocumentFactoryTest.java:70-83 counts hold under the REAL model."""
    text1 = ("Nearing the coast of Mexico, the depression attained its peak "
             "intensity with winds of 35 mph (55 km/h) and a minimum "
             "pressure of 1,007 mbar (29.7 inHg).")
    assert len(maxent_tokenize_pos(text1)) == 33
    text2 = ("The National Hurricane Center issued the final advisory on "
             "July 7,[16] although the circulation persisted until July 9 "
             "southwest of Texas.[32]")
    assert len(maxent_tokenize_pos(text2)) == 29


def test_offsets_cover_and_order():
    text = "We're testing (e.g. Dr. Smith's words, etc.) right now!"
    spans = maxent_tokenize_pos(text)
    prev_end = 0
    for b, e in spans:
        assert b >= prev_end and e > b
        prev_end = e


def test_rule_lane_corroboration():
    """The deterministic rule tokenizer must agree with the real model on
    typical transcript text (differences are allowed only on strings no
    reference fixture pins, e.g. trailing-dot all-caps tokens)."""
    import pyarrow.parquet as pq
    texts = (pq.read_table("/root/testdata/sf0.001/documents.parquet")
             .column("text").to_pylist())
    same = sum(1 for t in texts
               if tokenize_pos(t) == maxent_tokenize_pos(t))
    assert same / len(texts) >= 0.99


def test_context_generator_shape():
    ctx = token_context("ab,c", 2)
    assert "p=ab" in ctx and "s=,c" in ctx
    assert "p1=b" in ctx and "p1_alpha" in ctx
    assert "p21=ab" in ctx and "p1f1=b," in ctx
    assert "f1=," in ctx and "f2=c" in ctx and "f12=,c" in ctx


def test_sentence_model_reads():
    from texoo_spark.maxent import sent_model
    m = sent_model()
    assert m.outcomes == ["n", "s"]
    assert len(m.params) == 6628


def test_sentence_fixtures_under_real_model():
    """All reference JUnit sentence segmentations hold under the REAL
    OpenNLP sentence model (incl. the 9-sentence '....' case)."""
    from texoo_spark.maxent import maxent_sent_pos_detect
    from tests.test_textops import DEMENTIA
    assert len(maxent_sent_pos_detect(DEMENTIA)) == 5
    ell = ("Human rights in Tanzania.\nThe issue of human rights in "
           "Tanzania, a nation with a 2012 population of 44,928,923, is "
           "hard. In its 2013 Freedom in the World report, Freedom House "
           "declared the country \"Partly Free\".\nHuman rights concerns.\n"
           "The United Nations Human Rights Council in October 2011 at its "
           "meeting in Geneva completed a Universal Periodic Review (UPR) "
           "of the human rights situation in Tanzania. At this UPR, the "
           "United Nations Country Team (UNCT) and several countries "
           "addressed various problems in Tanzania.\nGender equality.\n"
           "National reviews and assessments of equality between men and "
           "women... have identified a range of challenges..., which "
           "continue to prevail. These include the persistent and "
           "increasing burden of poverty on women; inequalities in "
           "arrangements for productive activities and in access to "
           "resources; inequalities in the sharing of power and "
           "decision-making; lack of respect for and inadequate promotion "
           "and protection of the human rights of women; and inequalities "
           "in managing natural resources and safeguarding the "
           "environment.... Particular attention should be drawn to the "
           "widespread marginalization of the girl child in different "
           "spheres of life, including education, and the total exclusion "
           "caused for many by early and forced marriage.... Gender-based "
           "violence is prevalent.")
    assert len(maxent_sent_pos_detect(ell)) == 9
    assert len(maxent_sent_pos_detect(
        "They describe the process in three stages:\n1. Adaptive stage.")
    ) == 2


def test_full_document_parity_between_lanes():
    """End-to-end extraction through BOTH real models equals the rule lane
    on every reference fixture string and the test corpus sample."""
    from texoo_spark.maxent import maxent_extract_document
    from texoo_spark.textops import DISCARD, KEEP, extract_document
    from tests.test_textops import DEMENTIA, DE_TEXT, MED_TEXT, TAB_TEXT
    import pyarrow.parquet as pq
    strings = [DEMENTIA, MED_TEXT, DE_TEXT, TAB_TEXT]
    strings += (pq.read_table("/root/testdata/sf0.001/documents.parquet")
                .column("text").to_pylist()[:100])
    same = 0
    for t in strings:
        for mode in (KEEP, DISCARD):
            a = extract_document(t, mode)
            b = maxent_extract_document(t, mode)
            assert a.text == b.text          # reconstruction always equal
            same += a.tokens == b.tokens and a.sentences == b.sentences
    # token/sentence structures agree on >= 95% (known benign divergences
    # like trailing-dot all-caps tokens the model keeps whole)
    assert same / (2 * len(strings)) >= 0.95


def test_german_models_parse():
    """The DE models (different outcome order) decode byte-exactly too;
    outcome lookup is order-safe."""
    from texoo_spark.maxent import GISModel, maxent_tokenize_pos
    import os
    res = os.path.join(os.path.dirname(__file__), "..", "texoo_spark",
                       "resources")
    tok = GISModel(os.path.join(res, "de-token.bin"), "token.model")
    assert sorted(tok.outcomes) == ["F", "T"]
    assert len(tok.params) == 67635
    sent = GISModel(os.path.join(res, "de-sent.bin"), "sent.model")
    assert sorted(sent.outcomes) == ["n", "s"]
    # route the German model through the same loop
    spans = maxent_tokenize_pos("Die Katze schläft, oder?", model=tok)
    assert len(spans) >= 5
