"""S7 MultiSegReader / S8 WikiCitiesReader parity tests.

Ports MultiSegReaderTest (texoo-sector/src/test/java/.../reader/
MultiSegReaderTest.java) against the reference's own fixture files, and
pins WikiCitiesReader behavior on the bundled wikicities_sample.text."""

import os

import pytest

from texoo_spark.readers import (parse_multiseg_label, read_multiseg,
                                 read_wikicities)

BASE = "/root/reference/texoo-sector/src/test/resources/testdata/"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference fixtures not available")


@needs_fixtures
def test_multiseg_document0():
    """MultiSegReaderTest.testDocument0Reader: 11 one-sentence sections."""
    label = open(BASE + "222.label").read()
    doc = read_multiseg(open(BASE + "222.0").read(), label, 0)
    assert len(doc) == 11
    assert [s["heading"] for s in doc] == [str(i) for i in range(11)]
    assert all(len(s["sentences"]) == 1 for s in doc)
    assert doc[2]["sentences"][0] == \
        "I finally decided to try alternative medicine."
    s10 = doc[10]["sentences"][0]
    assert s10.startswith(
        "I'm a little nervous about trying these unorthodox treatments")
    assert s10.endswith("so what do I have to lose?")


@needs_fixtures
def test_multiseg_document1():
    """MultiSegReaderTest.testDocument1Reader: 11 sections, 75 sentences
    (the first 5 unannotated lines and one uncovered line are dropped)."""
    label = open(BASE + "222.label").read()
    doc = read_multiseg(open(BASE + "222.1").read(), label, 1)
    assert len(doc) == 11
    assert sum(len(s["sentences"]) for s in doc) == 81 - 6
    # first annotated section is line 5 alone; second spans lines 6-16
    assert doc[0]["heading"] == "0" and len(doc[0]["sentences"]) == 1
    assert len(doc[1]["sentences"]) == 11


@needs_fixtures
def test_multiseg_label_parsing():
    starts, ends = parse_multiseg_label(open(BASE + "222.label").read(), 0)
    assert starts == set(range(11))
    assert ends == set(range(11))


def test_multiseg_drops_uncovered_lines():
    label = "t 0::0-0 0::2-2"
    secs = read_multiseg("line one\nline dropped\nline three", label, 0)
    assert [s["sentences"] for s in secs] == [["line one"], ["line three"]]
    assert [s["heading"] for s in secs] == ["0", "1"]


@needs_fixtures
def test_wikicities_sample():
    lines = open(BASE + "wikicities_sample.text").read().splitlines()
    keep = read_wikicities(lines, skip_top_level=False)
    skip = read_wikicities(lines, skip_top_level=True)
    assert [d["id"] for d in keep] == ["1", "2"]
    # every document opens with the TOP-LEVEL preface section
    for d in keep:
        assert d["sections"][0]["heading"] == "preface"
        assert d["sections"][0]["label"] == "preface"
        assert d["sections"][0]["text"].endswith(" .")
    # skipping TOP-LEVEL removes those sections
    for ds, dk in zip(skip, keep):
        assert len(ds["sections"]) < len(dk["sections"])


def test_wikicities_sections_and_docs():
    lines = [
        "3,1,TOP-LEVEL SEGMENTalpha beta",
        "3,2,gamma delta",
        "3,3,gamma epsilon",
        "4,1,TOP-LEVEL SEGMENTzeta",
    ]
    keep = read_wikicities(lines, skip_top_level=False)
    assert len(keep) == 2
    assert [s["heading"] for s in keep[0]["sections"]] == ["preface", ""]
    assert keep[0]["sections"][1]["text"] == "gamma delta . gamma epsilon ."
    skip = read_wikicities(lines, skip_top_level=True)
    assert [d["id"] for d in skip] == ["3"]
    assert [s["text"] for s in skip[0]["sections"]] == \
        ["gamma delta . gamma epsilon ."]
