"""Evaluation metrics with the reference's exact formulas (SURVEY.md §2.6).

- NER micro/macro P/R/F1 with STRONG/WEAK matching, one-match-per-pred
  (ref: texoo-entity-recognition/.../ner/eval/MentionAnnotatorEvaluation.java:100-320)
- Segmentation Pk / WindowDiff incl. len==1/len==2 special cases and
  k = max(round(mean gold segment length / 2), 2)
  (ref: texoo-sector/.../eval/SegmentationEvaluation.java:104-251)
- Retrieval MRR / MAP / P@k / R@k / DCG / nDCG@k (k<=10) with rank backfill
  and Kaggle-style DCG (2^rel-1)/log2(p+1)
  (ref: texoo-retrieval/.../eval/RetrievalEvaluation.java:33-140)

Pure Python/numpy; the Spark layer aggregates per-document values with
groupBy().agg() (see queries in __spark_entry__.py).
"""

from __future__ import annotations

import math

from texoo_spark.spans import matches as span_matches

# ---------------------------------------------------------------------------
# NER span P/R/F1
# ---------------------------------------------------------------------------


def ner_counts(pred: list[tuple[int, int]], gold: list[tuple[int, int]],
               strategy: str = "STRONG") -> tuple[int, int, int]:
    """(TP, FP, FN) for one document; one gold match allowed per pred."""
    tp = 0
    for pb, pe in pred:
        if any(span_matches(pb, pe, gb, ge, strategy) for gb, ge in gold):
            tp += 1
    fp = len(pred) - tp
    fn = sum(0 if any(span_matches(pb, pe, gb, ge, strategy)
                      for pb, pe in pred) else 1
             for gb, ge in gold)
    return tp, fp, fn


def prf1(tp: float, fp: float, fn: float) -> tuple[float, float, float]:
    """CoNLL-style precision/recall/F1 (java:292-320)."""
    p = tp / (tp + fp) if tp + fp > 0 else 0.0
    r = tp / (tp + fn) if tp + fn > 0 else 0.0
    f = (2.0 * p * r) / (p + r) if p + r > 0 else 0.0
    return p, r, f


def classification_report(pairs: list[tuple[str, str]]) -> dict:
    """Per-class and aggregate classification scores (V5 shape,
    ref: texoo-core/.../eval/ClassificationEvaluation.java): pairs of
    (gold_label, pred_label) -> accuracy, per-class P/R/F1, micro/macro."""
    labels = sorted({g for g, _ in pairs} | {p for _, p in pairs})
    tp = {c: 0 for c in labels}
    fp = {c: 0 for c in labels}
    fn = {c: 0 for c in labels}
    correct = 0
    for g, p in pairs:
        if g == p:
            correct += 1
            tp[g] += 1
        else:
            fp[p] += 1
            fn[g] += 1
    per_class = {}
    for c in labels:
        p, r, f = prf1(tp[c], fp[c], fn[c])
        per_class[c] = {"precision": p, "recall": r, "f1": f,
                        "support": tp[c] + fn[c]}
    micro = prf1(sum(tp.values()), sum(fp.values()), sum(fn.values()))
    n = max(len(labels), 1)
    macro_p = sum(v["precision"] for v in per_class.values()) / n
    macro_r = sum(v["recall"] for v in per_class.values()) / n
    macro_f = ((2 * macro_p * macro_r) / (macro_p + macro_r)
               if macro_p + macro_r > 0 else 0.0)
    return {"accuracy": correct / len(pairs) if pairs else 0.0,
            "per_class": per_class,
            "micro_f1": micro[2], "macro_f1": macro_f,
            "macro_precision": macro_p, "macro_recall": macro_r}


# ---------------------------------------------------------------------------
# Segmentation Pk / WindowDiff
# ---------------------------------------------------------------------------

def positions_array(n_sentences: int,
                    sections: list[tuple[int, str]],
                    merge_sections: bool = True) -> list[int]:
    """Sentence-level segment-id array from sorted section starts.

    sections: (first_sentence_index, label) sorted by begin. Adjacent
    sections with the same label merge when merge_sections
    (SegmentationEvaluation.getPositionsArray, java:201-251).
    """
    array = [0] * n_sentences
    section_index = 0
    cursor = 0
    last = ""
    for i, (begin, label) in enumerate(sections):
        begin = max(begin, 0)
        for t in range(cursor, min(begin, n_sentences)):
            array[t] = section_index
        cursor = max(cursor, min(begin, n_sentences))
        current = label if merge_sections else f"@{begin}:{i}"
        if current != last:
            section_index += 1
        last = current
    for t in range(cursor, n_sentences):
        array[t] = section_index
    return array


def masses_array(positions: list[int]) -> list[int]:
    """[1,1,2,2,2] -> [2,3] (java:196-216)."""
    result: list[int] = []
    last, count = None, 0
    for curr in positions:
        if curr != last and last is not None:
            result.append(count)
            count = 0
        last = curr
        count += 1
    if count > 0:
        result.append(count)
    return result


def calculate_k(gold_positions: list[int]) -> int:
    """k = max(round(mean gold segment length / 2), 2) (java:173-185).
    Java Math.round = floor(x + 0.5)."""
    masses = masses_array(gold_positions)
    if not masses:
        return 2
    mean = sum(masses) / len(masses)
    return max(int(math.floor(mean / 2.0 + 0.5)), 2)


def _degenerate(reference: list[int], hypothesis: list[int]) -> float | None:
    if len(reference) == 2:
        agree_ref = reference[0] == reference[1]
        agree_hyp = hypothesis[0] == hypothesis[1]
        return 0.0 if agree_ref == agree_hyp else 1.0
    if len(reference) <= 1:
        return 0.0
    return None


def pk(reference: list[int], hypothesis: list[int], k: int) -> float:
    """Window disagreement of segment-id equality at distance k
    (java:104-127)."""
    total, count = 0, 0
    for t in range(len(reference) - k):
        agree_ref = reference[t] == reference[t + k]
        agree_hyp = hypothesis[t] == hypothesis[t + k]
        if agree_ref != agree_hyp:
            total += 1
        count += 1
    d = _degenerate(reference, hypothesis)
    if d is not None and count == 0:
        return d
    return total / count if count > 0 else 0.0


def window_diff(reference: list[int], hypothesis: list[int], k: int) -> float:
    """Boundary-count disagreement in sliding windows of size k
    (java:133-170)."""
    total, count = 0, 0
    for t in range(len(reference) - k):
        sum_ref = sum_hyp = 0
        for j in range(k):
            if reference[t + j] == 0:
                return 1.0  # document not correctly annotated
            if reference[t + j] == reference[t + j + 1]:
                sum_ref += 1
            if hypothesis[t + j] == hypothesis[t + j + 1]:
                sum_hyp += 1
        if sum_ref != sum_hyp:
            total += 1
        count += 1
    d = _degenerate(reference, hypothesis)
    if d is not None and count == 0:
        return d
    return total / count if count > 0 else 0.0


# ---------------------------------------------------------------------------
# Retrieval metrics
# ---------------------------------------------------------------------------

def _dcg_gain(relevance: int, p: int) -> float:
    """Kaggle/Stanford DCG term (java:137-140)."""
    return (2.0 ** relevance - 1.0) / math.log2(p + 1)


def evaluate_query(predicted: list[tuple[str, float]],
                   expected: list[tuple[str, int]]) -> dict:
    """Per-query metrics.

    predicted: (result_key, score) sorted by score desc (rank order).
    expected: (result_key, relevance) in relevance order (IDCG order).
    Result matching = same key (document + STRONG span in the reference,
    Result.java:125-128). Returns per-query sums mirroring
    RetrievalEvaluation.evaluateQueries (java:37-125)."""
    rel_by_key = dict()
    for key, rel in expected:
        rel_by_key.setdefault(key, rel)
    relevance = [rel_by_key.get(key, 0) for key, _ in predicted]
    relevant = [r > 0 for r in relevance]

    idcg = [0.0] * 11
    idcg_sum = 0.0
    p = 0
    for _, rel in expected:
        p += 1
        if p <= 10:
            idcg_sum += _dcg_gain(rel, p)
            idcg[p] = idcg_sum
    while p < 10:
        p += 1
        idcg[p] = idcg_sum

    mrr = 0.0
    for i, r in enumerate(relevant):
        if r:
            mrr = 1.0 / (i + 1)
            break

    relevant_exp = sum(1 for _, rel in expected if rel > 0)
    relevant_pred = 0
    avg_prec = 0.0
    dcg_sum = 0.0
    prec_k = [0.0] * 11
    rec_k = [0.0] * 11
    ndcg_k = [0.0] * 11
    k = 0
    for i, (key, _score) in enumerate(predicted):
        k += 1
        if relevant[i]:
            relevant_pred += 1
        if k <= 10:
            prec_k[k] = relevant_pred / k
            rec_k[k] = relevant_pred / relevant_exp if relevant_exp else 0.0
            dcg_sum += _dcg_gain(relevance[i], k)
            ndcg_k[k] = dcg_sum / idcg[k] if idcg[k] > 0 else 0.0
        if relevant[i]:
            avg_prec += relevant_pred / k
        if relevant_exp and relevant_pred >= relevant_exp:
            break  # found all (java:106)
    while k < 10:
        k += 1
        prec_k[k] = relevant_pred / k
        rec_k[k] = relevant_pred / relevant_exp if relevant_exp else 0.0
        ndcg_k[k] = dcg_sum / idcg[k] if idcg[k] > 0 else 0.0

    recall_n = relevant_pred / relevant_exp if relevant_exp else 0.0
    ap = avg_prec / relevant_exp if relevant_exp else 0.0
    return {"mrr": mrr, "ap": ap, "recall_n": recall_n,
            "precision_k": prec_k, "recall_k": rec_k, "ndcg_k": ndcg_k}


def evaluate_queries(per_query: list[dict]) -> dict:
    """Macro-average per-query metrics over all queries."""
    n = len(per_query)
    if n == 0:
        return {}
    out = {
        "mrr": sum(q["mrr"] for q in per_query) / n,
        "map": sum(q["ap"] for q in per_query) / n,
        "recall_n": sum(q["recall_n"] for q in per_query) / n,
    }
    for k in (1, 3, 5, 10):
        out[f"p_at_{k}"] = sum(q["precision_k"][k] for q in per_query) / n
        out[f"r_at_{k}"] = sum(q["recall_k"][k] for q in per_query) / n
        out[f"ndcg_at_{k}"] = sum(q["ndcg_k"][k] for q in per_query) / n
    return out
