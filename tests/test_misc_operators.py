"""Tests for the long-tail operators: A12 labels, E8/E10 encoders, T9
preprocessor, S9 WNED reader."""

import numpy as np

from texoo_spark.encoders import EmbeddingLookup, HeadingEncoder
from texoo_spark.readers import read_wned_annotations
from texoo_spark.segment import attach_segment_labels
from texoo_spark.textops import minimal_lowercase


def test_attach_segment_labels():
    labels = ["intro", "body", "end"]
    lm = np.eye(3)
    pred = np.array([[0.9, 0.1, 0.0], [0.8, 0.2, 0.0],
                     [0.1, 0.9, 0.1], [0.0, 0.7, 0.3]])
    out = attach_segment_labels(pred, [(0, 2), (2, 4)], lm, labels)
    assert out[0]["label"] == "intro"
    assert out[0]["heading"].startswith("intro/")
    assert out[1]["label"] == "body"
    assert out[1]["confidence"] > 0.5


def test_minimal_lowercase():
    # MinimalLowercaseNewlinePreprocessor.java semantics
    assert minimal_lowercase("\n", newline_marker=True) == "*NL*"
    assert minimal_lowercase("Löser") == "loeser"
    assert minimal_lowercase("Hello, World!") == "hello_world"
    assert minimal_lowercase("Route66") == "route#"
    assert minimal_lowercase("Ärger-Straße") == "aerger-strasse"


def test_embedding_lookup():
    emb = EmbeddingLookup(["cat", "dog"], np.array([[1., 0.], [0., 1.]]))
    assert list(emb.encode("cat")) == [1.0, 0.0]
    assert list(emb.encode("unknown")) == [0.0, 0.0]
    m = emb.encode_tokens(["dog", "cat", "xyz"])
    assert m.shape == (3, 2)
    assert list(m[0]) == [0.0, 1.0]
    assert list(m[2]) == [0.0, 0.0]


def test_heading_encoder():
    enc = HeadingEncoder(["Signs and Symptoms", "Treatment", "Symptoms"])
    v = enc.encode("Symptoms")
    assert v.sum() == 1 and v[0] == 0
    other = enc.encode("Zebra")
    assert other[0] == 1 and other.sum() == 1  # `other` fallback
    multi = enc.encode("signs symptoms")
    assert multi.sum() == 2


def test_read_wned():
    xml = """<?xml version="1.0"?>
    <benchmark>
      <document docName="doc1.txt">
        <annotation><mention>Paris</mention><wikiName>Paris</wikiName>
          <offset>10</offset><length>5</length></annotation>
        <annotation><mention>NIL thing</mention><wikiName>NIL</wikiName>
          <offset>30</offset><length>9</length></annotation>
      </document>
    </benchmark>"""
    docs = read_wned_annotations(xml)
    assert len(docs) == 1
    assert docs[0]["doc_name"] == "doc1.txt"
    assert docs[0]["mentions"][0] == {"surface": "Paris",
                                      "wiki_name": "Paris",
                                      "offset": 10, "length": 5}
