"""Parity tests against the reference's bundled corpus fixtures
(read-only at /root/reference; skipped if absent)."""

import os

import pytest

BASE = "/root/reference/texoo-sector/src/test/resources/testdata"

pytestmark = pytest.mark.skipif(not os.path.isdir(BASE),
                                reason="reference fixtures not present")


def test_wikisection_dementia():
    from texoo_spark.readers import read_wikisection
    with open(os.path.join(BASE, "en_disease_dementia.json"),
              encoding="utf-8") as f:
        docs = read_wikisection(f.read())
    assert len(docs) == 1
    d = docs[0]
    assert d["title"] == "Vascular dementia"
    assert d["type"] == "disease"
    assert len(d["sections"]) == 8
    s0 = d["sections"][0]
    # FIXTURES.md F7: first section has length 2635
    assert (s0["begin"], s0["end"]) == (0, 2635)
    assert s0["heading"] == "Signs and symptoms"
    assert s0["label"] == "disease.symptom"
    assert all(s["source"] == "GOLD" and s["confidence"] == 1.0
               for s in d["sections"])
    # sections tile the text contiguously
    for a, b in zip(d["sections"], d["sections"][1:]):
        assert a["end"] == b["begin"]
    assert d["sections"][-1]["end"] == len(d["text"])


def test_choi_reference_file():
    from texoo_spark.readers import read_choi
    with open(os.path.join(BASE, "choi-1-3-5-0.ref"), encoding="utf-8") as f:
        segments = read_choi(f.read())
    assert len(segments) >= 2
    assert segments[0].startswith("Some of the features")


def test_wiki727_reference_file():
    from texoo_spark.readers import read_wiki727
    with open(os.path.join(BASE, "Wiki727_2611501.txt"),
              encoding="utf-8") as f:
        secs = read_wiki727(f.read(), section_level=2)
    assert len(secs) >= 2
    assert secs[0]["heading"] == "preface"
    assert "Addingham" in secs[0]["text"]


def test_wikisection_segmentation_eval_roundtrip():
    """GOLD sections of the dementia article -> positions array -> perfect
    Pk/WD against themselves (sanity over real reference data)."""
    from texoo_spark.metrics import (calculate_k, pk, positions_array,
                                     window_diff)
    from texoo_spark.readers import read_wikisection
    from texoo_spark.textops import DISCARD, extract_document
    with open(os.path.join(BASE, "en_disease_dementia.json"),
              encoding="utf-8") as f:
        d = read_wikisection(f.read())[0]
    doc = extract_document(d["text"], DISCARD)
    n = len(doc.sentences)
    assert n > 20
    # map char begins to sentence indices (first sentence starting >= begin)
    sent_begins = [doc.sentences[i].begin for i in range(n)]
    sections = []
    for s in d["sections"]:
        idx = max(i for i in range(n) if sent_begins[i] <= s["begin"])
        sections.append((idx, s["label"]))
    ref = positions_array(n, sections)
    k = calculate_k(ref)
    assert pk(ref, ref, k) == 0.0
    assert window_diff(ref, ref, k) == 0.0
