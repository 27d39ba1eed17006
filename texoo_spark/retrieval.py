"""Distributed BM25 passage/document retrieval (candidate generation).

Reference parity: TeXoo retrieves ranked candidate passages through a Lucene
index with BM25Similarity and a lowercase word analyzer
(texoo-cdv/src/main/java/de/datexis/cdv/index/PassageIndex.java:129,
 texoo-cdv/src/main/java/de/datexis/cdv/index/DocumentIndex.java:26,65-79),
driven per query by QueryRunner
(texoo-cdv/src/main/java/de/datexis/cdv/retrieval/QueryRunner.java:145-160).

Spark-first design (no Lucene, no driver loops): the "index" is a DataFrame
inverted list — (term, doc_id, tf) plus per-term document frequency and
per-doc length — all produced by one explode + two aggregations. Scoring a
query batch is a broadcast join of query terms against the postings table,
a groupBy (query, doc) sum, and a row_number window for top-k. At 10^12
rows the postings build is a single shuffle on term, and query evaluation
touches only the postings of the query's terms (predicate pushdown on the
broadcast-joined term column).

Scoring uses the standard BM25 formula (Robertson & Zaragoza 2009), the
same family Lucene's BM25Similarity implements:
    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q,d) = sum_t idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
(Lucene >= 8 drops per-doc norm quantization; we compute exact dl.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

# lowercase word tokenization, the analyzer equivalent
# (DocumentIndex.buildAnalyzer: lowercase + standard word breaks)
_TOKEN_SPLIT = r"[^a-z0-9]+"


def _terms(col: str):
    return F.filter(F.split(F.lower(F.col(col)), _TOKEN_SPLIT),
                    lambda t: t != "")


def build_bm25_index(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> dict[str, DataFrame]:
    """Build the inverted-list DataFrames for a corpus.

    Returns {"postings": (term, doc_id, tf), "df": (term, df),
             "doclen": (doc_id, dl), "stats": (n_docs, avgdl)}.
    One explode + aggregations; everything shuffles on its natural key.
    postings/doclen are persist()ed so the corpus is tokenized and
    aggregated exactly once per index, however many scoring passes (and
    the stats collect) consume it — call unpersist_bm25_index(idx) when
    done, or write the tables out bucketed for repeated querying at scale.
    """
    terms = (docs.select(F.col(id_col).alias("doc_id"),
                         F.explode(_terms(text_col)).alias("term")))
    postings = (terms.groupBy("term", "doc_id")
                .agg(F.count("*").alias("tf"))).persist()
    df_tbl = (postings.groupBy("term")
              .agg(F.countDistinct("doc_id").alias("df")))
    doclen = (terms.groupBy("doc_id").agg(F.count("*").alias("dl"))).persist()
    stats = doclen.agg(F.count("*").alias("n_docs"),
                       F.avg("dl").alias("avgdl"))
    return {"postings": postings, "df": df_tbl, "doclen": doclen,
            "stats": stats}


# indexes built internally by bm25_scores/bm25_topk (index=None); release
# with release_bm25_caches() — callers who build their own index own its
# lifecycle via unpersist_bm25_index
_INTERNAL_INDEXES: list = []


def unpersist_bm25_index(index: dict[str, DataFrame]) -> None:
    """Release the cached postings/doclen of a build_bm25_index result."""
    index["postings"].unpersist()
    index["doclen"].unpersist()


def release_bm25_caches() -> int:
    """Unpersist every index built internally by bm25_scores/bm25_topk
    calls that did not receive a prebuilt index. Returns the count."""
    n = len(_INTERNAL_INDEXES)
    while _INTERNAL_INDEXES:
        unpersist_bm25_index(_INTERNAL_INDEXES.pop())
    return n


def bm25_scores(docs: DataFrame, queries: DataFrame,
                k1: float = 1.2, b: float = 0.75,
                id_col: str = "doc_id", text_col: str = "text",
                query_id_col: str = "query_id",
                query_text_col: str = "query_text",
                index: dict[str, DataFrame] | None = None) -> DataFrame:
    """BM25 score for every (query, doc) pair sharing a term:
    (query_id, doc_id, score).

    The queries side is expected to be small relative to the corpus and is
    broadcast; corpus-side work is one postings build (persisted — shared
    by the stats collect and the scoring plan, so the corpus is tokenized
    once) and one (query_id, doc_id) aggregation. Pass a prebuilt
    `index` from build_bm25_index to amortize across calls.
    """
    if index is not None:
        idx = index
    else:
        idx = build_bm25_index(docs, id_col, text_col)
        _INTERNAL_INDEXES.append(idx)
    stats = idx["stats"].collect()[0]
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]

    qterms = (queries.select(F.col(query_id_col).alias("query_id"),
                             F.explode(F.array_distinct(
                                 _terms(query_text_col))).alias("term")))
    idf = F.log(F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tf_part = (F.col("tf") * (k1 + 1)
               / (F.col("tf") + k1 * (1 - b + b * F.col("dl")
                                      / F.lit(float(avgdl)))))
    return (idx["postings"]
            .join(F.broadcast(qterms), "term")
            .join(F.broadcast(idx["df"]), "term")
            .join(idx["doclen"], "doc_id")
            .withColumn("part_score", idf * tf_part)
            .groupBy("query_id", "doc_id")
            .agg(F.sum("part_score").alias("score")))


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text",
              query_id_col: str = "query_id",
              query_text_col: str = "query_text",
              rank_round: int | None = None,
              index: dict[str, DataFrame] | None = None) -> DataFrame:
    """Top-k BM25 documents per query: (query_id, rank, doc_id, score).

    Ties break on doc_id for deterministic ranks (Result comparator
    rank->score parity,
    texoo-core/src/main/java/de/datexis/model/Result.java:17-32).
    With rank_round, ranking compares scores rounded to that many decimals
    (still doc_id tie-break) so rank membership reproduces across engines
    whose log-sum orders differ at ~1e-12. Pass a prebuilt `index` to
    amortize the persisted postings across calls (and own its lifecycle
    via unpersist_bm25_index); with index=None each call builds and
    retains its own cached postings/doclen.
    """
    scored = bm25_scores(docs, queries, k1, b, id_col, text_col,
                         query_id_col, query_text_col, index=index)
    rank_key = (F.round(F.col("score"), rank_round)
                if rank_round is not None else F.col("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc(rank_key),
                                               F.col("doc_id"))
    out_round = rank_round if rank_round is not None else 6
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), out_round).alias("score")))
