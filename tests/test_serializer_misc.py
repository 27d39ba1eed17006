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


# ---------------------------------------------------------------------------
# round 2: E5 CharClassEncoder parity, E8 word2vec .bin reader,
# annotator bundle save/load round-trip
# ---------------------------------------------------------------------------

def test_char_class_encoder_histogram():
    """Parity with CharClassEncoder.java on a fixture token set, INCLUDING
    the upstream isOpeningQuote/isClosingQuote copy-paste quirk (both test
    the symbols list, java:91-99)."""
    import numpy as np
    from texoo_spark.encoders import CHAR_CLASS_SIZE, char_class_features

    def v(*idx):
        out = np.zeros(CHAR_CLASS_SIZE, dtype=np.float32)
        out[list(idx)] = 1.0
        return out

    cases = {
        "#": v(0, 2, 3),      # symbol AND (quirk) both quote flags
        "$": v(0, 2, 3),
        "&": v(1), "+": v(1), "=": v(1),
        '"': np.zeros(CHAR_CLASS_SIZE, dtype=np.float32),  # quirk: no flag
        "'": np.zeros(CHAR_CLASS_SIZE, dtype=np.float32),
        "(": v(4), "-LRB-": v(4),
        ")": v(5), "-RRB-": v(5),
        "/": v(6), "\\": v(6), "|": v(6),
        ",": v(7),
        "-": v(8), "--": v(8), "–": v(8),
        ".": v(9), "!": v(9), "?": v(9),
        ":": v(10), ";": v(10), "...": v(10),
        "word": np.zeros(CHAR_CLASS_SIZE, dtype=np.float32),
        " . ": v(9),          # java trims before lookup
    }
    for tok, expected in cases.items():
        got = char_class_features(tok)
        assert np.array_equal(got, expected), (tok, got)


def test_word2vec_binary_roundtrip(tmp_path):
    import numpy as np
    from texoo_spark.encoders import (read_word2vec_binary,
                                      write_word2vec_binary)
    words = ["alpha", "beta", "gamma", "über"]
    mat = np.arange(12, dtype=np.float32).reshape(4, 3) / 7.0
    p = str(tmp_path / "tiny.bin")
    write_word2vec_binary(p, words, mat)
    lk = read_word2vec_binary(p)
    assert lk.size == 3
    for i, w in enumerate(words):
        assert np.array_equal(lk.encode(w), mat[i])
    assert np.array_equal(lk.encode("missing"), np.zeros(3,
                                                         dtype=np.float32))
    toks = lk.encode_tokens(["beta", "nope", "über"])
    assert np.array_equal(toks[0], mat[1])
    assert np.array_equal(toks[2], mat[3])
    # golden bytes: header + first word
    raw = open(p, "rb").read()
    assert raw.startswith(b"4 3\nalpha ")


@pytest.mark.spark
def test_pipeline_bundle_roundtrip(tmp_path):
    """Annotator.writeModel/AnnotatorFactory equivalent: descriptor JSON
    round-trip drives the restored pipeline to identical output."""
    from texoo_spark.annotator import (extraction_pipeline,
                                       gazetteer_annotator, load_pipeline,
                                       save_pipeline)
    from texoo_spark.session import get_spark
    spark = get_spark("texoo-bundle-test", master="local[2]",
                      shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        [("c", 0, "user", "Aspirin is a drug. Take the drug daily.", None)],
        "conv_id string, turn_idx int, role string, text string, tool string")
    pipe = extraction_pipeline(strip_html=False)
    pipe.stages.append(gazetteer_annotator(["Aspirin", "drug"]))
    path = str(tmp_path / "bundle.json")
    save_pipeline(pipe, path)
    restored = load_pipeline(path)
    a = pipe.run(df).collect()
    b = restored.run(df).collect()
    assert a == b
    assert len(a[0].m_begin) == 3
    assert restored.provenance()["stages"] == pipe.provenance()["stages"]


@pytest.mark.spark
def test_multistage_bundle_roundtrip(tmp_path):
    """A14 breadth (round 5): a THREE-stage pipeline — extract (T1) ->
    gazetteer (A1) -> linker (A13), three distinct registered builder
    types — survives save/load with equality on the composed output,
    including the linker's alias knowledge base riding in params."""
    from texoo_spark.annotator import (Pipeline, extract_annotator,
                                       gazetteer_annotator,
                                       linker_annotator, load_pipeline,
                                       save_pipeline)
    from texoo_spark.session import get_spark
    spark = get_spark("texoo-bundle-test", master="local[2]",
                      shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        [(0, "spark join table scan"), (1, "no matches here"),
         (2, "table filter table")],
        "doc_id long, text string")
    pipe = Pipeline()
    pipe.stages.append(extract_annotator("DISCARD", False))
    pipe.stages.append(gazetteer_annotator(
        ["spark", "table", "scan", "join", "filter"]))
    pipe.stages.append(linker_annotator(
        [["spark", "E1", 0.9], ["spark", "E9", 0.5],
         ["table", "E2", 0.8], ["join", "E3", 0.7]]))
    path = str(tmp_path / "bundle.json")
    save_pipeline(pipe, path)
    restored = load_pipeline(path)
    cols = ["doc_id", "n_linked", "first_entity"]
    a = sorted(pipe.run(df).select(*cols).collect())
    b = sorted(restored.run(df).select(*cols).collect())
    assert a == b
    byid = {r.doc_id: r for r in a}
    # doc 0: spark/join/table linked, earliest = spark -> top-1 E1
    # (prior 0.9 beats E9's 0.5); scan matched but unlinked
    assert byid[0].n_linked == 3 and byid[0].first_entity == "E1"
    assert byid[1].n_linked == 0 and byid[1].first_entity is None
    assert byid[2].n_linked == 2 and byid[2].first_entity == "E2"
    # the linker's tracked persists (one per run) release on demand
    from texoo_spark.annotator import release_annotator_caches
    assert release_annotator_caches() >= 2
    # non-numeric doc ids must keep working (the id is never cast)
    df2 = spark.createDataFrame([("doc-17", "spark table")],
                                "doc_id string, text string")
    r2 = restored.run(df2).select("doc_id", "n_linked",
                                  "first_entity").collect()[0]
    assert (r2.doc_id, r2.n_linked, r2.first_entity) == ("doc-17", 2, "E1")
    release_annotator_caches()


def test_save_pipeline_rejects_adhoc_stage(tmp_path):
    from texoo_spark.annotator import Annotator, Pipeline, save_pipeline
    p = Pipeline()
    p.stages.append(Annotator("adhoc", lambda df: df))
    with pytest.raises(ValueError):
        save_pipeline(p, str(tmp_path / "x.json"))
