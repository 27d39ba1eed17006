"""Metric fixtures ported from the reference JUnit suites.

Sources:
- texoo-sector/src/test/java/de/datexis/sector/eval/WindowDiffEvaluationTest.java
- texoo-entity-recognition/.../eval/MentionAnnotatorEvaluation.java semantics
- texoo-retrieval/.../eval/RetrievalEvaluation.java formulas (hand-computed)
"""

import math

from texoo_spark.metrics import (
    calculate_k, evaluate_queries, evaluate_query, masses_array, ner_counts,
    pk, positions_array, prf1, window_diff,
)


def seg(n, starts):
    """positions array for segments starting at given sentence indices."""
    return positions_array(n, [(s, f"seg{i}") for i, s in enumerate(starts)])


# --- WindowDiffEvaluationTest.returnZeroWhenSegmentationAnnotationsAreIdentical
def test_wd_identical():
    ref = seg(2, [0])
    hyp = seg(2, [0])
    k = calculate_k(ref)
    assert window_diff(ref, hyp, k) == 0.0
    assert pk(ref, hyp, k) == 0.0


# --- noGoldSegmentsOn13Sentences (java:97-106): WD ~ 1.0
def test_wd_degenerate_one_gold_segment():
    ref = seg(13, [0])
    hyp = seg(13, [0, 4, 8])
    k = calculate_k(ref)
    assert k == 7  # round(13 / 2) = 7
    assert abs(window_diff(ref, hyp, k) - 1.0) <= 0.03


# --- threeGoldSegmentsOn13Sentences (java:109-123): WD ~ 0.363636
def test_wd_three_gold_segments():
    ref = seg(13, [0, 4, 8])
    hyp = seg(13, [0])
    k = calculate_k(ref)
    assert k == 2  # round(13/3/2) = 2
    assert abs(window_diff(ref, hyp, k) - 0.363636) <= 0.03


def test_positions_and_masses():
    pos = positions_array(19, [(0, "a"), (3, "b"), (9, "c"), (13, "d"),
                               (15, "e")])
    assert pos == [1, 1, 1, 2, 2, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 5, 5, 5, 5]
    # (the reference javadoc example says [3,6,3,2,4] but that sums to 18
    # for 19 positions; the correct run-lengths are [3,6,4,2,4])
    assert masses_array(pos) == [3, 6, 4, 2, 4]


def test_positions_merge_same_label():
    # adjacent sections with same label merge (java:240-247)
    pos = positions_array(6, [(0, "x"), (2, "x"), (4, "y")])
    assert pos == [1, 1, 1, 1, 2, 2]


def test_pk_len_special_cases():
    assert pk([1], [1], 2) == 0.0
    assert pk([1, 1], [1, 2], 2) == 1.0
    assert pk([1, 2], [3, 4], 2) == 0.0  # both disagree -> agree on structure


# --- NER P/R/F1 ---

def test_ner_counts_strong():
    gold = [(0, 5), (10, 20), (30, 35)]
    pred = [(0, 5), (10, 19), (40, 45)]
    tp, fp, fn = ner_counts(pred, gold, "STRONG")
    assert (tp, fp, fn) == (1, 2, 2)
    p, r, f = prf1(tp, fp, fn)
    assert abs(p - 1 / 3) < 1e-9
    assert abs(r - 1 / 3) < 1e-9
    assert abs(f - 1 / 3) < 1e-9


def test_ner_counts_weak():
    gold = [(0, 5), (10, 20), (30, 35)]
    pred = [(0, 5), (10, 19), (40, 45)]
    tp, fp, fn = ner_counts(pred, gold, "WEAK")
    assert (tp, fp, fn) == (2, 1, 1)


# --- Retrieval metrics (hand-computed per RetrievalEvaluation.java) ---

def test_retrieval_perfect_single():
    q = evaluate_query([("d1", 0.9)], [("d1", 1)])
    assert q["mrr"] == 1.0
    assert q["ap"] == 1.0
    assert q["recall_n"] == 1.0
    assert q["precision_k"][1] == 1.0
    assert q["ndcg_k"][1] == 1.0


def test_retrieval_rank2():
    # relevant item at rank 2 of 2; one relevant expected
    q = evaluate_query([("d2", 0.9), ("d1", 0.8)], [("d1", 1)])
    assert q["mrr"] == 0.5
    assert q["ap"] == 0.5
    assert q["precision_k"][1] == 0.0
    assert q["precision_k"][2] == 0.5
    # DCG@2 = (2^1-1)/log2(3); IDCG@2 = (2^1-1)/log2(2) = 1
    assert abs(q["ndcg_k"][2] - (1 / math.log2(3))) < 1e-9


def test_retrieval_backfill():
    # fewer retrieved than 10: P@k backfilled with relevant_pred/k
    q = evaluate_query([("d1", 0.9)], [("d1", 1), ("d2", 1)])
    assert q["recall_n"] == 0.5
    assert q["precision_k"][2] == 0.5
    assert q["recall_k"][10] == 0.5


# --- WindowDiffEvaluationTest additional-segment cases (java:121-152) ---

def test_wd_one_additional_segment():
    ref = seg(13, [0, 5, 8])
    hyp = seg(13, [0, 5, 6, 8])
    k = calculate_k(ref)
    assert abs(window_diff(ref, hyp, k) - 0.181818) <= 0.03


def test_wd_one_additional_misaligned_segment():
    ref = seg(13, [0, 5, 8])
    hyp = seg(13, [0, 6, 7, 9])
    k = calculate_k(ref)
    assert abs(window_diff(ref, hyp, k) - 0.272727) <= 0.03


# --- WindowDiffEvaluationTest Hearst-1997 dataset cases (java:156-420) ---

def test_wd_hearst_judge_one():
    ref = seg(21, [0, 3, 6, 9, 10, 13, 19])
    hyp = seg(21, [0, 3, 9, 13, 15, 19])
    k = calculate_k(ref)
    assert abs(window_diff(ref, hyp, k) - 0.31578947) < 1e-6


def test_wd_hearst_judge_one_texoo_style():
    # boundary styles must not change the score (java:162-165)
    ref = seg(21, [0, 2, 5, 8, 9, 12, 18])
    hyp = seg(21, [0, 2, 8, 12, 14, 18])
    k = calculate_k(ref)
    assert abs(window_diff(ref, hyp, k) - 0.31578947) < 1e-6


def test_wd_hearst_judge_two():
    ref = seg(21, [0, 3, 11, 13, 17, 19])
    hyp = seg(21, [0, 2, 8, 12, 14, 18])
    k = calculate_k(ref)
    assert abs(window_diff(ref, hyp, k) - 0.42105263) < 1e-6


# --- RetrievalEvaluationTest (java:82-200): Wikipedia MRR/P@k examples ---

Q1_PRED = [("d1", 0.9), ("d2", 0.5), ("d3", 0.1)]
Q1_GOLD = [("d1", 0), ("d2", 0), ("d3", 1)]
Q2_PRED = [("d4", 0.9), ("d5", 0.5), ("d6", 0.1)]
Q2_GOLD = [("d5", 1)]
Q3_PRED = [("d7", 0.9), ("d8", 0.5), ("d9", 0.1)]
Q3_GOLD = [("d7", 1)]
# DCG wikipedia example: 8 graded golds, 6 ranked predictions
QW_PRED = [("d1", 0.9), ("d2", 0.7), ("d3", 0.5), ("d4", 0.3),
           ("d5", 0.2), ("d6", 0.1)]
QW_GOLD = [("d1", 3), ("d2", 2), ("d3", 3), ("d4", 0), ("d5", 1),
           ("d6", 2), ("d7", 3), ("d8", 2)]


def test_retrieval_mrr_wikipedia_cases():
    assert abs(evaluate_query(Q1_PRED, Q1_GOLD)["mrr"] - 1 / 3) < 1e-3
    assert abs(evaluate_query(Q2_PRED, Q2_GOLD)["mrr"] - 1 / 2) < 1e-3
    assert abs(evaluate_query(Q3_PRED, Q3_GOLD)["mrr"] - 1.0) < 1e-3
    agg = evaluate_queries([evaluate_query(Q1_PRED, Q1_GOLD),
                            evaluate_query(Q2_PRED, Q2_GOLD),
                            evaluate_query(Q3_PRED, Q3_GOLD)])
    assert abs(agg["mrr"] - 11 / 18) < 1e-3
    assert abs(agg["p_at_1"] - 1 / 3) < 1e-3
    assert abs(agg["p_at_3"] - 1 / 3) < 1e-3
    assert abs(agg["r_at_1"] - 1 / 3) < 1e-3
    assert abs(agg["r_at_3"] - 1.0) < 1e-3


def test_retrieval_dcg_wikipedia_case():
    q = evaluate_query(QW_PRED, QW_GOLD)
    assert abs(q["mrr"] - 1.0) < 1e-3
    assert abs(q["precision_k"][1] - 1.0) < 1e-3
    assert abs(q["precision_k"][4] - 3 / 4) < 1e-3
    assert abs(q["precision_k"][5] - 4 / 5) < 1e-3
    assert abs(q["precision_k"][6] - 5 / 6) < 1e-3
    assert abs(q["precision_k"][7] - 5 / 7) < 1e-3  # rank backfill
    assert abs(q["precision_k"][8] - 5 / 8) < 1e-3


def test_retrieval_macro_average():
    q1 = evaluate_query([("a", 1.0)], [("a", 1)])
    q2 = evaluate_query([("b", 1.0), ("a", 0.5)], [("a", 1)])
    agg = evaluate_queries([q1, q2])
    assert abs(agg["mrr"] - 0.75) < 1e-9
    assert abs(agg["map"] - 0.75) < 1e-9
    assert abs(agg["p_at_1"] - 0.5) < 1e-9
