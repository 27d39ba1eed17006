"""Similarity search over embedding columns (SURVEY.md R6 + BASELINE scope).

- brute_force_topk: exact cosine top-k of every row against a broadcast
  query matrix; JVM-side higher-order-function variant for single queries
  (SQL-expressible, used as the DuckDB oracle anchor) and a numpy/pandas-UDF
  variant for query batches (matmul per Arrow batch — the scale path for
  moderate query counts).
- ivf_topk: IVF-style approximate search: deterministic centroid seeding,
  one assignment pass, search only the probe nearest cells. At 100 TB the
  assignment is a narrow map and the search prunes (1 - probes/cells) of
  the data.

kNN reference semantics: normalized embedding matrix + dot product
(texoo-retrieval/.../index/InMemoryIndex.java:106-118).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def cosine_expr(vec_col: str, query: list[float]):
    """JVM-side cosine similarity of array<float> column against a literal
    query vector via zip_with + aggregate (no Python in the hot path)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(F.zip_with(F.col(vec_col), q, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm_v = F.sqrt(F.aggregate(F.transform(F.col(vec_col), lambda a: a * a),
                                F.lit(0.0), lambda acc, x: acc + x))
    norm_q = float(np.sqrt(np.dot(query, query)))
    return dot / (norm_v * F.lit(norm_q))


def brute_force_topk(df: DataFrame, query: list[float], k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine similarity against one query vector.

    Plan: narrow projection (whole-stage codegen) + TakeOrderedAndProject —
    no shuffle of the full table, only k rows per partition reach the
    driver-side merge."""
    return (df
            .select(F.col(id_col),
                    cosine_expr(vec_col, query).alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


def brute_force_topk_batch(df: DataFrame, queries: np.ndarray, k: int = 10,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           round_decimals: int | None = 6) -> DataFrame:
    """Top-k per query for a query matrix [Q x D]: numpy matmul per Arrow
    batch, then a (query_id, score) window to keep k per query.

    The matmul runs in float64 and ranking compares scores ROUNDED to
    round_decimals with an id tie-break, so rank membership is reproducible
    across engines/BLAS summation orders (pass None for raw-score ranking)."""
    q64 = np.asarray(queries, dtype=np.float64)
    qn = q64 / np.maximum(
        np.linalg.norm(q64, axis=1, keepdims=True), 1e-12)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(qn)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<query_id:int,cosine:double>>")
    def scores_udf(vecs: pd.Series) -> pd.Series:
        qm = bc.value  # [Q x D]
        out = []
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = (mat / norms) @ qm.T  # [B x Q]
        for row in sims:
            out.append([{"query_id": int(qi), "cosine": float(s)}
                        for qi, s in enumerate(row)])
        return pd.Series(out, dtype="object")

    # explode applied DIRECTLY to the UDF call: with a separate projection
    # step Catalyst stacks two identical ArrowEvalPython operators (the UDF
    # runs twice per row — verified on the physical plan); this form plans
    # exactly one Python eval under the Generate
    exploded = (df.select(id_col,
                          F.explode(scores_udf(F.col(vec_col))).alias("s"))
                .select(id_col, F.col("s.query_id").alias("query_id"),
                        F.col("s.cosine").alias("cosine")))
    rank_key = (F.round(F.col("cosine"), round_decimals)
                if round_decimals is not None else F.col("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc(rank_key),
                                               F.col(id_col))
    return (exploded.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def cosine_topk_join(passages: DataFrame, queries: DataFrame, k: int = 5,
                     p_id: str = "doc_id", q_id: str = "query_id",
                     p_vec: str = "embedding", q_vec: str = "embedding",
                     round_decimals: int | None = 6) -> DataFrame:
    """QueryRunner.retrieveAllQueries equivalent (texoo-cdv/.../retrieval/
    QueryRunner.java:77-170): score every passage against every query
    vector by cosine, keep top-k per query -> (query_id, rank, passage id,
    cosine).

    Plan: the (small) query side is broadcast against the passage table —
    the 100TB side never shuffles for the join; cosine is a JVM-side
    zip_with/aggregate (no Python), and the per-query window keeps k rows.
    Ranking compares round_decimals-rounded cosines with a passage-id
    tie-break for reproducible membership."""
    p = passages.select(F.col(p_id).alias("p_id"),
                        F.col(p_vec).alias("pv"))
    q = queries.select(F.col(q_id).alias("query_id"),
                       F.col(q_vec).alias("qv"))
    joined = p.crossJoin(F.broadcast(q))
    dot = F.aggregate(F.zip_with("pv", "qv", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = (F.sqrt(F.aggregate(F.transform("pv", lambda a: a * a),
                               F.lit(0.0), lambda acc, x: acc + x))
            * F.sqrt(F.aggregate(F.transform("qv", lambda a: a * a),
                                 F.lit(0.0), lambda acc, x: acc + x)))
    cos = dot / norm
    if round_decimals is not None:
        cos = F.round(cos, round_decimals)
    scored = joined.select("query_id", F.col("p_id").alias(p_id),
                           cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.col(p_id))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_assign(df: DataFrame, n_cells: int = 16,
               id_col: str = "vec_id", vec_col: str = "embedding",
               seed_stride: int | None = None,
               centroids: np.ndarray | None = None
               ) -> tuple[DataFrame, np.ndarray]:
    """Assign rows to IVF cells. Centroids are seeded deterministically from
    the dataset (every stride-th row by id), so the index is reproducible.
    Returns (df + cell column, centroid matrix).

    Pass precomputed `centroids` to skip the seeding count/collect — at
    100x scale compute them once (this one-pass stride seeding is a hash
    partition by nearest seed, not a trained k-means IVF; that is the
    documented trade: zero training passes, deterministic rebuild).
    All math runs in float64 so assignments reproduce across engines."""
    if centroids is None:
        total = df.count()
        stride = seed_stride or max(total // n_cells, 1)
        seeds = (df.filter((F.col(id_col) % stride == 0))
                 .orderBy(id_col).limit(n_cells)
                 .select(vec_col).collect())
        cents = np.array([np.asarray(r[0], dtype=np.float64) for r in seeds])
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True),
                            1e-12)
    else:
        cents = np.asarray(centroids, dtype=np.float64)
        cents = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    bc = df.sparkSession.sparkContext.broadcast(cents)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def cell_udf(vecs: pd.Series) -> pd.Series:
        cm = bc.value
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax((mat / norms) @ cm.T, axis=1).astype(int))

    return df.withColumn("cell", cell_udf(F.col(vec_col))), cents


def ivf_topk(df_with_cells: DataFrame, centroids: np.ndarray,
             query: list[float], k: int = 10, probes: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             round_decimals: int | None = None) -> DataFrame:
    """Approximate top-k: search only the `probes` cells whose centroids are
    nearest to the query. The cell filter prunes partitions before the
    cosine projection runs. With round_decimals, ranking compares rounded
    cosines (id tie-break) for cross-engine-reproducible membership."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(np.asarray(centroids, dtype=np.float64) @ qn),
                       kind="stable")[:probes]
    cells = [int(c) for c in order]
    cos = cosine_expr(vec_col, query)
    if round_decimals is not None:
        cos = F.round(cos, round_decimals)
    return (df_with_cells
            .filter(F.col("cell").isin(cells))
            .select(F.col(id_col), cos.alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))
