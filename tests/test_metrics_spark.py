"""Distributed evaluation operators must reproduce the pure-Python golden
numbers (same fixtures as test_metrics.py, through Spark)."""

import pytest

pytestmark = pytest.mark.spark


@pytest.fixture(scope="session")
def spark():
    from texoo_spark.session import get_spark
    s = get_spark("texoo-metrics-tests", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_evaluate_ner_spark(spark):
    from texoo_spark.metrics_spark import evaluate_ner
    gold = spark.createDataFrame(
        [("d1", 0, 5), ("d1", 10, 20), ("d1", 30, 35), ("d2", 0, 4)],
        "doc_id string, begin int, end int")
    pred = spark.createDataFrame(
        [("d1", 0, 5), ("d1", 10, 19), ("d1", 40, 45), ("d2", 0, 4)],
        "doc_id string, begin int, end int")
    strong = evaluate_ner(gold, pred, "STRONG")
    assert (strong["tp"], strong["fp"], strong["fn"]) == (2, 2, 2)
    weak = evaluate_ner(gold, pred, "WEAK")
    assert (weak["tp"], weak["fp"], weak["fn"]) == (3, 1, 1)


def test_evaluate_segmentation_spark(spark):
    from texoo_spark.metrics_spark import evaluate_segmentation
    # WindowDiffEvaluationTest golden cases as table rows
    gold = spark.createDataFrame(
        [("a", 13, 0, "s0"), ("a", 13, 4, "s1"), ("a", 13, 8, "s2"),
         ("b", 13, 0, "s0")],
        "doc_id string, n_sentences int, sent_begin int, label string")
    pred = spark.createDataFrame(
        [("a", 13, 0, "p0"),                                  # 1 segment
         ("b", 13, 0, "p0"), ("b", 13, 4, "p1"), ("b", 13, 8, "p2")],
        "doc_id string, n_sentences int, sent_begin int, label string")
    rows = {r.doc_id: r for r in
            evaluate_segmentation(gold, pred).collect()}
    assert rows["a"].k == 2
    assert abs(rows["a"].wd - 0.363636) <= 0.03   # 3 gold vs 1 pred
    assert rows["b"].k == 7
    assert abs(rows["b"].wd - 1.0) <= 0.03        # 1 gold vs 3 pred


def test_evaluate_retrieval_spark(spark):
    from texoo_spark.metrics_spark import evaluate_retrieval
    pred = spark.createDataFrame(
        [("q1", "d1", 0.9), ("q1", "d2", 0.5), ("q1", "d3", 0.1),
         ("q2", "d4", 0.9), ("q2", "d5", 0.5), ("q2", "d6", 0.1),
         ("q3", "d7", 0.9), ("q3", "d8", 0.5), ("q3", "d9", 0.1)],
        "query_id string, result_key string, score double")
    gold = spark.createDataFrame(
        [("q1", "d3", 1), ("q2", "d5", 1), ("q3", "d7", 1)],
        "query_id string, result_key string, relevance int")
    m = evaluate_retrieval(pred, gold)
    assert abs(m["mrr"] - 11 / 18) < 1e-3   # Wikipedia MRR example
    assert abs(m["p_at_1"] - 1 / 3) < 1e-3
    assert abs(m["p_at_3"] - 1 / 3) < 1e-3
