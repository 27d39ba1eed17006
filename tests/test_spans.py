"""Span operator fixtures ported from the reference JUnit suites.

Sources:
- texoo-entity-recognition/src/test/java/de/datexis/ner/MatchingAnnotatorTest.java
- texoo-entity-recognition/src/test/java/de/datexis/ner/MentionAnnotationTest.java
- texoo-core/src/test/java/de/datexis/model/DocumentModelTest.java (ranges)
"""

from texoo_spark.spans import (
    GazetteerMatcher, bio2_to_bioes, bioes_is_correct, bioes_to_bio2,
    contains, convert_to_lowercase, decode_bio2, intersects, matches,
    spans_in_range, spans_to_bioes,
)
from texoo_spark.textops import DISCARD, extract_document

IMMUNO = ("Cancer immunotherapy (sometimes called immuno-oncology) is the use of the immune system to treat cancer. "
          "Immunotherapies can be categorized as active, passive or hybrid (active and passive). "
          "These approaches exploit the fact that cancer cells often have molecules on their surface that can be detected by "
          "the immune system, known as tumour-associated antigens (TAAs); they are often proteins or other macromolecules (e.g. carbohydrates). "
          "Active immunotherapy directs the immune system to attack tumor cells by targeting TAAs. Passive immunotherapies enhance existing "
          "anti-tumor responses and include the use of monoclonal antibodies, lymphocytes and cytokines.")

TERMS = ["tum", "cancer", "immune system", "molecules", "TAA",
         "immunotherapy", "tumor", "tumor cells", "e"]


def _match(text, matcher):
    doc = extract_document(text, DISCARD)
    return matcher.match(doc.text, [t.begin for t in doc.tokens],
                         [t.end for t in doc.tokens])


# --- MatchingAnnotatorTest.testCaseSensitive (java:35-70): exactly 8 ---

def test_case_sensitive_8_matches():
    m = GazetteerMatcher(TERMS, "CASE_SENSITIVE")
    assert len(m.terms) == 9
    found = _match(IMMUNO, m)
    assert len(found) == 8
    texts = sorted(IMMUNO[b:e] for b, e, _ in found)
    assert texts.count("immune system") == 3
    assert texts.count("cancer") == 2
    assert texts.count("immunotherapy") == 2
    assert texts.count("molecules") == 1


# --- MatchingAnnotatorTest.testLowercase (java:72-118): exactly 10 ---

def test_lowercase_10_matches():
    m = GazetteerMatcher(TERMS, "LOWERCASE")
    assert len(m.terms) == 8  # "e" is too short
    found = _match(IMMUNO, m)
    assert len(found) == 10
    texts = sorted(IMMUNO[b:e].lower() for b, e, _ in found)
    assert texts.count("cancer") == 3
    assert texts.count("tumor cells") == 1


def test_lowercase_uppercase_terms():
    m = GazetteerMatcher(["NOT", "TEST"], "LOWERCASE")
    assert len(_match("This is not a test. Really?", m)) == 0
    assert len(_match("This is NOT a TEST", m)) == 2
    m2 = GazetteerMatcher(["NOT", "TEST", "not", "test"], "LOWERCASE")
    assert len(_match("This is not a test. Really?", m2)) == 2


# --- MatchingAnnotatorTest.testLowercaseMethod (java:120-126) ---

def test_convert_to_lowercase():
    text = "The Immune System, I have known as Tumour-Associated Antigens (TAA). Antigens are often Proteins or other Macromolecules (e.g. carbohydrates C544)."
    lctx = "The immune system, I have known as tumour-associated antigens (TAA). antigens are often proteins or other macromolecules (e.g. carbohydrates C544)."
    assert convert_to_lowercase(text) == lctx


# --- MatchingAnnotatorTest.testCars (java:128-147): 3 matches ---

def test_cars():
    text = "Der Volkswagen Caddy (2K), auch VW Caddy Life genannt, ist ein PKW-Modell der Marke Volkswagen Nutzfahrzeuge."
    m = GazetteerMatcher(["Volkswagen Caddy", "VW", "Caddy Life", "IST"],
                         "LOWERCASE", min_word_length=2, label="CAR")
    assert len(m.terms) == 4
    found = sorted(_match(text, m))
    assert len(found) == 3
    assert text[found[0][0]:found[0][1]] == "Volkswagen Caddy"
    assert text[found[1][0]:found[1][1]] == "VW"
    assert text[found[2][0]:found[2][1]] == "Caddy Life"
    assert all(lbl == "CAR" for _, _, lbl in found)


# --- MentionAnnotationTest.testSpanTagConversion (java:60-115) ---

BIO2 = ["B", "B", "I", "B", "I", "I", "O", "O", "O", "O", "O", "O", "O", "O"]
BIOES = ["S", "B", "E", "B", "I", "E", "O", "O", "O", "O", "O", "O", "O", "O"]


def test_bio2_to_bioes_roundtrip():
    assert bio2_to_bioes(BIO2) == BIOES
    assert bioes_to_bio2(BIOES) == BIO2
    assert bioes_is_correct(BIOES)
    bad = BIOES.copy()
    bad[0] = "I"  # I followed by B is invalid
    assert not bioes_is_correct(bad)


# --- MentionAnnotationTest.testTagConversion (java:323-342): 3 mentions ---

def test_decode_bio2():
    spans = decode_bio2(BIO2, None, None, [len(BIO2)])
    assert [(s, e) for s, e, _, _ in spans] == [(0, 1), (1, 3), (3, 6)]


def test_decode_bio2_i_after_o():
    # I after O treated as B (MentionAnnotation.java:240-244)
    spans = decode_bio2(["O", "I", "I", "O"], None, None, [4])
    assert [(s, e) for s, e, _, _ in spans] == [(1, 3)]


def test_decode_bio2_flush_at_sentence_end():
    spans = decode_bio2(["B", "I", "B", "I"], None, None, [2, 4])
    assert [(s, e) for s, e, _, _ in spans] == [(0, 2), (2, 4)]


def test_decode_bio2_confidence_mean():
    spans = decode_bio2(["B", "I", "O"], ["PER", "", ""], [0.8, 0.6, 0.0], [3])
    assert len(spans) == 1
    s, e, typ, conf = spans[0]
    assert (s, e, typ) == (0, 2, "PER")
    assert abs(conf - 0.7) < 1e-9


def test_spans_to_bioes():
    assert spans_to_bioes(6, [(0, 1), (1, 3), (3, 6)]) == \
        ["S", "B", "E", "B", "I", "E"]


# --- Annotation predicates (MentionAnnotationTest.testAnnotationMatching) ---

def test_predicates():
    # Prime Minister [8,22), Kengo wa Dondo [23,36), PM-Kengo [8,28),
    # Zairean..Dondo [0,36), Prime Minist [8,20)
    assert matches(8, 22, 8, 22, "STRONG")
    assert contains(8, 22, 8, 22)
    assert intersects(8, 22, 8, 22)
    assert not matches(8, 22, 23, 36, "STRONG")
    assert not intersects(8, 22, 23, 36)
    assert not contains(8, 22, 8, 28)
    assert intersects(8, 22, 8, 28)
    assert not matches(8, 22, 0, 36, "STRONG")
    assert matches(8, 22, 0, 36, "WEAK")
    assert contains(0, 36, 8, 22)
    assert not matches(8, 22, 8, 20, "STRONG")
    assert contains(8, 22, 8, 20)


# --- DocumentModelTest.testRangeQueries (java:263-336) ---

def test_range_queries():
    doc = extract_document(
        "Aspirin has an antiplatelet effect (e.g. preventing heart attacts, strokes and blood clot formation) by stopping the binding together of platelets [1]. "
        "Aspirin is also known as acetylsalicylic acid.", DISCARD)
    begins = [t.begin for t in doc.tokens]
    ends = [t.end for t in doc.tokens]
    texts = [t.text for t in doc.tokens]

    def q(b, e, enclosed):
        return [texts[i] for i in spans_in_range(begins, ends, b, e, enclosed)]

    assert q(0, 7, True) == ["Aspirin"]
    assert q(0, 7, False) == ["Aspirin"]
    assert q(15, 27, True) == ["antiplatelet"]
    assert q(16, 27, True) == []
    assert q(14, 27, True) == ["antiplatelet"]
    assert q(15, 28, True) == ["antiplatelet"]
    assert q(15, 29, True) == ["antiplatelet"]
    assert q(15, 34, True) == ["antiplatelet", "effect"]
    assert q(15, 35, True) == ["antiplatelet", "effect"]
    assert len(q(12, 34, True)) == 3
    assert q(15, 27, False) == ["antiplatelet"]
    assert q(16, 27, False) == ["antiplatelet"]
    assert q(14, 27, False) == ["antiplatelet"]
    assert q(15, 28, False) == ["antiplatelet"]
    assert q(15, 29, False) == ["antiplatelet", "effect"]
    assert q(15, 34, False) == ["antiplatelet", "effect"]
    assert q(15, 35, False) == ["antiplatelet", "effect"]
    assert len(q(12, 34, False)) == 3
