"""Distributed evaluation operators over spans tables.

The pure-Python formulas live in metrics.py (fixture-exact vs the
reference); these wrappers scale them: per-document work runs in
applyInPandas groups (one shuffle on doc_id), aggregation is a groupBy.
At 10^9 documents each group is tiny — the plan is embarrassingly parallel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from texoo_spark.metrics import (calculate_k, evaluate_queries,
                                 evaluate_query, ner_counts, pk,
                                 positions_array, prf1, window_diff)


def evaluate_ner(gold: DataFrame, pred: DataFrame,
                 strategy: str = "STRONG",
                 keys: list[str] | None = None) -> dict:
    """Micro P/R/F1 for span tables gold/pred(keys..., begin, end)
    (MentionAnnotatorEvaluation semantics: one gold match per pred)."""
    keys = keys or ["doc_id"]
    schema = ", ".join(f"{k} string" for k in keys) + \
        ", tp long, fp long, fn long"

    g = gold.select(*keys, F.col("begin").alias("begin"),
                    F.col("end").alias("end"), F.lit("G").alias("src"))
    p = pred.select(*keys, "begin", "end", F.lit("P").alias("src"))
    both = g.unionByName(p)

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        gg = [(int(r.begin), int(r.end))
              for r in pdf[pdf.src == "G"].itertuples()]
        pp = [(int(r.begin), int(r.end))
              for r in pdf[pdf.src == "P"].itertuples()]
        tp, fp, fn = ner_counts(pp, gg, strategy)
        head = {k: [str(pdf[k].iloc[0])] for k in keys}
        return pd.DataFrame({**head, "tp": [tp], "fp": [fp], "fn": [fn]})

    counts = both.groupBy(*keys).applyInPandas(per_doc, schema)
    tot = counts.agg(F.sum("tp").alias("tp"), F.sum("fp").alias("fp"),
                     F.sum("fn").alias("fn")).collect()[0]
    prec, rec, f1 = prf1(tot.tp, tot.fp, tot.fn)
    return {"tp": tot.tp, "fp": tot.fp, "fn": tot.fn,
            "precision": prec, "recall": rec, "f1": f1}


def evaluate_segmentation(gold: DataFrame, pred: DataFrame,
                          doc_key: str = "doc_id") -> DataFrame:
    """Per-document Pk and WindowDiff from section tables
    (doc_key, sent_begin, label) with n_sentences per doc.

    Returns a DataFrame (doc_key, k, pk, wd); average with .agg(avg(...)).
    k = max(round(mean GOLD segment length / 2), 2) per document
    (SegmentationEvaluation.calculateK, java:178-185)."""
    g = gold.select(doc_key, "n_sentences", "sent_begin", "label",
                    F.lit("G").alias("src"))
    p = pred.select(doc_key, "n_sentences", "sent_begin", "label",
                    F.lit("P").alias("src"))
    both = g.unionByName(p)
    schema = f"{doc_key} string, k int, pk double, wd double"

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        n = int(pdf.n_sentences.iloc[0])
        gg = sorted((int(r.sent_begin), str(r.label))
                    for r in pdf[pdf.src == "G"].itertuples())
        hh = sorted((int(r.sent_begin), str(r.label))
                    for r in pdf[pdf.src == "P"].itertuples())
        ref = positions_array(n, gg)
        hyp = positions_array(n, hh)
        k = calculate_k(ref)
        return pd.DataFrame({doc_key: [str(pdf[doc_key].iloc[0])],
                             "k": [k],
                             "pk": [pk(ref, hyp, k)],
                             "wd": [window_diff(ref, hyp, k)]})

    return both.groupBy(doc_key).applyInPandas(per_doc, schema)


def retrieval_per_query(pred: DataFrame, gold: DataFrame,
                        query_key: str = "query_id") -> DataFrame:
    """Per-query MRR/AP/recall/P@k/nDCG@k as a DataFrame (query_key, mrr,
    ap, recall_n, p_at_1, p_at_3, p_at_5, p_at_10, ndcg_at_10) from result
    tables pred(query_id, result_key, score), gold(query_id, result_key,
    relevance ordered desc). One shuffle on query_id; each query group is
    scored by the fixture-exact evaluate_query inside applyInPandas — the
    scale shape for 10^9 queries (no global window, no driver loop)."""
    p = pred.select(query_key, "result_key",
                    F.col("score").cast("double").alias("score"),
                    F.lit(None).cast("int").alias("relevance"),
                    F.lit("P").alias("src"))
    g = gold.select(query_key, "result_key",
                    F.lit(None).cast("double").alias("score"),
                    F.col("relevance").cast("int").alias("relevance"),
                    F.lit("G").alias("src"))
    both = p.unionByName(g)
    schema = (f"{query_key} string, mrr double, ap double, recall_n double,"
              " p_at_1 double, p_at_3 double, p_at_5 double, p_at_10 double,"
              " ndcg_at_10 double")

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        preds = pdf[pdf.src == "P"].sort_values(
            ["score", "result_key"], ascending=[False, True])
        golds = pdf[pdf.src == "G"].sort_values(
            ["relevance", "result_key"], ascending=[False, True])
        q = evaluate_query([(r.result_key, float(r.score))
                            for r in preds.itertuples()],
                           [(r.result_key, int(r.relevance))
                            for r in golds.itertuples()])
        return pd.DataFrame({
            query_key: [str(pdf[query_key].iloc[0])],
            "mrr": [q["mrr"]], "ap": [q["ap"]],
            "recall_n": [q["recall_n"]],
            "p_at_1": [q["precision_k"][1]], "p_at_3": [q["precision_k"][3]],
            "p_at_5": [q["precision_k"][5]],
            "p_at_10": [q["precision_k"][10]],
            "ndcg_at_10": [q["ndcg_k"][10]],
        })

    return both.groupBy(query_key).applyInPandas(per_query, schema)


def evaluate_retrieval(pred: DataFrame, gold: DataFrame,
                       query_key: str = "query_id") -> dict:
    """Macro-averaged MRR/MAP/P@k/nDCG@k over retrieval_per_query."""
    per_q = retrieval_per_query(pred, gold, query_key)
    row = per_q.agg(*[F.avg(c).alias(c) for c in
                      ("mrr", "ap", "recall_n", "p_at_1", "p_at_3",
                       "p_at_5", "p_at_10", "ndcg_at_10")]).collect()[0]
    return {"mrr": row.mrr, "map": row.ap, "recall_n": row.recall_n,
            "p_at_1": row.p_at_1, "p_at_3": row.p_at_3,
            "p_at_5": row.p_at_5, "p_at_10": row.p_at_10,
            "ndcg_at_10": row.ndcg_at_10}
