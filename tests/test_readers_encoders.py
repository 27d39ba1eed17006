"""Reader and encoder fixtures.

CoNLL expectations from MentionAnnotationTest.testTypedBIO2Tags
(texoo-entity-recognition/src/test/java/.../MentionAnnotationTest.java:348-380);
encoder semantics from SurfaceEncoder/StructureEncoder sources.
"""

import os

import numpy as np
import pytest

from texoo_spark.encoders import (
    BagOfWordsEncoder, BloomEncoder, LetterNGramEncoder, OneHotEncoder,
    structure_features_sentences, structure_features_tokens,
    surface_features,
)
from texoo_spark.readers import read_choi, read_conll, read_wiki727, read_wikisection

CONLL_FIXTURE = ("/root/reference/texoo-entity-recognition/src/test/"
                 "resources/datasets/CoNLL2003.conll")

CONLL_SNIPPET = """-DOCSTART- -X- O O

SOCCER NNP I-NP O
- : O O
INTERNATIONAL NNP I-NP O
GAME NNP I-NP O
RESULT NNP I-NP O
. . O O

LONDON VB I-VP I-LOC
1996-08-15 CD I-NP O

Green NNP I-NP I-ORG
Star NNP I-NP I-ORG
( ( O O
Germany NNP I-NP I-LOC
) ) O O
"""


def test_read_conll_snippet():
    docs = read_conll(CONLL_SNIPPET.split("\n"))
    assert len(docs) == 1
    d = docs[0]
    texts = [(m[0], m[1], m[2]) for m in d["mentions"]]
    doc_text = d["doc"].text
    surfaces = [(doc_text[b:e], t) for b, e, t in texts]
    assert ("LONDON", "LOC") in surfaces
    assert ("Green Star", "ORG") in surfaces
    assert ("Germany", "LOC") in surfaces


@pytest.mark.skipif(not os.path.exists(CONLL_FIXTURE),
                    reason="reference fixture not present")
def test_read_conll_reference_fixture():
    with open(CONLL_FIXTURE, encoding="utf-8") as f:
        docs = read_conll(f.read().split("\n"))
    d = docs[0]
    doc_text = d["doc"].text
    mentions = sorted(d["mentions"])
    surfaces = [(doc_text[b:e], t) for b, e, t in mentions]
    assert surfaces[0] == ("LONDON", "LOC")
    assert surfaces[1] == ("Green Star", "ORG")
    assert surfaces[2] == ("Germany", "LOC")


def test_read_wikisection():
    js = ('[{"id":"d1","type":"disease","title":"T","abstract":"A",'
          '"text":"Some text here.",'
          '"annotations":[{"class":"SectionAnnotation","begin":0,'
          '"length":15,"sectionHeading":"Abstract",'
          '"sectionLabel":"disease.abstract"}]}]')
    docs = read_wikisection(js)
    assert len(docs) == 1
    s = docs[0]["sections"][0]
    assert (s["begin"], s["end"]) == (0, 15)
    assert s["source"] == "GOLD"
    assert s["confidence"] == 1.0


def test_read_wiki727():
    text = ("========,1,Preface.\n"
            "Intro line one.\n"
            "========,2,History.\n"
            "History line.\n"
            "***LIST*** item dropped \n"
            "========,2,Geography.\n"
            "Geo line.\n")
    secs = read_wiki727(text, section_level=2)
    # level-2 headings replace (not extend) the level-1 path per the
    # reference's split/rebuild logic (Wiki727Reader.java:95-103)
    assert [s["heading"] for s in secs] == ["Preface", "History", "Geography"]
    assert "History line." in secs[1]["text"]


def test_read_choi():
    text = "==========\nseg one text\n==========\nseg two text\n=========="
    assert read_choi(text) == ["seg one text", "seg two text"]


# --- encoders ---

def test_surface_features():
    f = surface_features("Aspirin")
    # startsUpper, not startsLower, not allUpper, not allLower, not mixed
    assert list(f[:5]) == [1, 0, 0, 0, 0]
    assert list(surface_features("DSM")[:5]) == [1, 0, 1, 0, 0]
    assert list(surface_features("hello")[:5]) == [0, 1, 0, 1, 0]
    num = surface_features("1,007")
    assert num[5] == 1 and num[6] == 1 and num[7] == 1 and num[8] == 1
    p = surface_features("(")
    assert p[9] == 1 and p[10] == 1
    assert surface_features("iPhone")[4] == 1  # mixed case


def test_structure_features_tokens():
    # two sentences: ["123", "abc", "\n"], ["xyz"]
    vecs = structure_features_tokens([["123", "abc", "\n"], ["xyz"]])
    assert len(vecs) == 4
    # order: [beginDoc, beginPar, isList, beginSent, endSent, endPar, endDoc]
    assert list(vecs[0]) == [1, 1, 0, 1, 0, 0, 0]  # "123"
    assert list(vecs[1]) == [0, 0, 0, 0, 0, 0, 0][:4] + list(vecs[1][4:])
    assert vecs[1][4] == 1  # "abc": next is NL -> endSent
    assert vecs[2][5] == 1  # "\n": endPar
    v_xyz = vecs[3]
    assert v_xyz[1] == 1  # after NL -> beginPar
    assert v_xyz[6] == 1  # endDoc


def test_structure_features_sentences():
    vecs = structure_features_sentences([["a", "\n"], ["b"]], ["a \n", "b"])
    assert vecs[0][0] == 1 and vecs[0][5] == 1  # beginDoc, endPar
    assert vecs[1][1] == 1 and vecs[1][6] == 1  # beginPar after NL, endDoc


def test_bow_encoder():
    enc = BagOfWordsEncoder(min_word_length=2).train(
        [["spark", "query", "spark"], ["table", "scan"]])
    assert enc.size == 4
    v = enc.encode(["spark", "unknown", "scan"])
    assert v.sum() == 2


def test_ngram_encoder():
    enc = LetterNGramEncoder(n=3).train(["word", "work"])
    v = enc.encode("word")
    assert v.sum() == len(enc.ngrams("word"))
    assert enc.encode("zzz").sum() == 0


def test_bloom_encoder():
    enc = BloomEncoder(bits=4096, hashes=5)
    v1 = enc.encode(["hello"])
    v2 = enc.encode(["hello"])
    assert np.array_equal(v1, v2)
    assert 1 <= v1.sum() <= 5


def test_onehot():
    enc = OneHotEncoder(["a", "b", "a", "c"])
    assert enc.size == 3
    assert list(enc.encode("b")) == [0, 1, 0]
    assert enc.encode("zzz").sum() == 0
