"""Document JSON round-trip (S10), classification eval (V5), encoder set."""

import numpy as np
import pytest

from texoo_spark.encoders import encoder_set
from texoo_spark.metrics import classification_report


def test_encoder_set_concat():
    v = encoder_set(np.array([1.0, 2.0]), np.array([3.0]))
    assert list(v) == [1.0, 2.0, 3.0]
    assert v.dtype == np.float32


def test_classification_report():
    pairs = [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a")]
    rep = classification_report(pairs)
    assert abs(rep["accuracy"] - 3 / 5) < 1e-9
    assert rep["per_class"]["a"]["support"] == 2
    # class a: tp=1 fp=1 fn=1 -> P=R=F1=0.5
    assert abs(rep["per_class"]["a"]["f1"] - 0.5) < 1e-9
    assert abs(rep["micro_f1"] - 0.6) < 1e-9
    assert rep["per_class"]["c"]["recall"] == 0.0


@pytest.mark.spark
def test_document_json_roundtrip(tmp_path):
    from texoo_spark.session import get_spark
    from texoo_spark.pipeline import extract_turns
    from texoo_spark.serializer import (extracted_to_documents,
                                        read_documents_json,
                                        write_documents_json)
    spark = get_spark("texoo-serializer-test", master="local[2]",
                      shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        [("c1", 0, "user", "Aspirin is a drug. It works well.", None)],
        "conv_id string, turn_idx int, role string, text string, tool string")
    docs = extracted_to_documents(extract_turns(df, strip_html_first=False))
    path = str(tmp_path / "docs_json")
    write_documents_json(docs, path)
    back = read_documents_json(spark, path).collect()
    assert len(back) == 1
    d = back[0]
    assert d.id == "c1#0"
    assert d.text == "Aspirin is a drug. It works well."
    assert len(d.sentences) == 2
    assert d.sentences[0].begin == 0
    assert d.end == len(d.text)
