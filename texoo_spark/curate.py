"""End-to-end training-data curation pipeline (capstone composition).

Chains the engine's stages the way a 100TB pretraining-data job would:

  1. extract    — HTML strip + segmentation (mapInArrow hot lane), stable
                  (conv_id, turn_idx) ordering
  2. quality    — JVM-side quality filters on the extracted text (length,
                  digit ratio, stopword ratio); pure Catalyst expressions
  3. exact dedup — survivor = min (conv_id, turn_idx) per sha256(text);
                  one hash shuffle
  4. near dedup — MinHash+LSH banding; drop the higher-id member of every
                  candidate pair (union-free greedy suppression: at most
                  one survivor per duplicate cluster chain)
  5. write      — curated turns + a per-stage funnel metrics row

Every stage is a DataFrame -> DataFrame function usable on its own; run()
wires them and returns the funnel counts. Deterministic end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from texoo_spark.arrow_extract import extract_turns_arrow

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with",
             "as", "by", "at", "it", "that", "this", "be", "are", "was")

# vocab-count DataFrames persisted by unigram_surprisal; release with
# release_curate_caches() when the scored output has been consumed
_PERSISTED: list = []


def release_curate_caches() -> int:
    n = len(_PERSISTED)
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
    return n


def quality_filter(df: DataFrame, text_col: str = "extracted_text",
                   min_words: int = 5, max_digit_ratio: float = 0.3,
                   min_stop_ratio: float = 0.0) -> DataFrame:
    """Keep rows passing cheap JVM-side quality gates (Gopher/C4-style
    heuristics expressed as Catalyst columns, no Python)."""
    words = F.split(F.col(text_col), " ")
    n_chars = F.length(text_col).cast("double")
    digits = (n_chars - F.length(F.regexp_replace(F.col(text_col),
                                                  "[0-9]", ""))) / \
        F.greatest(n_chars, F.lit(1.0))
    stop_ratio = (F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
                  / F.greatest(F.size(words), F.lit(1)))
    return df.filter((F.size(words) >= min_words)
                     & (digits <= max_digit_ratio)
                     & (stop_ratio >= min_stop_ratio))


def unigram_surprisal(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Mean unigram surprisal -ln p(w) per document from corpus-derived
    unigram statistics — the trained-LM-free quality/perplexity proxy
    (Gopher/C4-style filters rank documents by how 'surprising' their
    vocabulary is vs the corpus). Returns (id, mean_surprisal, n_words).

    Plan: two corpus passes total — one explode+aggregation building the
    (persisted) vocab counts, whose sum gives the normalizer without
    another corpus scan, and one explode as the join probe side (AQE
    broadcasts the vocab side when it is small; at web scale it
    hash-partitions on the word), then one per-doc aggregation."""
    words = df.select(F.col(id_col).alias("id"),
                      F.explode(F.split(F.lower(F.col(text_col)), " "))
                      .alias("w"))
    counts = words.groupBy("w").agg(F.count("*").alias("c")).persist()
    _PERSISTED.append(counts)
    total = counts.agg(F.sum("c")).collect()[0][0]
    scored = (words.join(counts, "w")
              .select("id", (-F.log(F.col("c") / F.lit(float(total))))
                      .alias("s")))
    return (scored.groupBy("id")
            .agg(F.round(F.avg("s"), 6).alias("mean_surprisal"),
                 F.count("*").alias("n_words")))


def drop_exact_dupes(df: DataFrame,
                     text_col: str = "extracted_text") -> DataFrame:
    """Keep the first (conv_id, turn_idx) row per distinct text."""
    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(
        "conv_id", "turn_idx")
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def drop_near_dupes(df: DataFrame, text_col: str = "extracted_text",
                    num_hashes: int = 64, bands: int = 16) -> DataFrame:
    """Suppress near-duplicates found by MinHash LSH banding: the
    lower-key member of each candidate pair survives. Anti-join keeps the
    plan shuffle-bounded (bucket join + one anti-join, no cross join)."""
    from texoo_spark.dedup import minhash_lsh_candidates
    # survivor key orders by (conv_id, NUMERIC turn_idx): turn_idx is
    # zero-padded so the lexicographic pair comparison inside the LSH
    # candidate join ranks turn 2 before turn 10 (a plain concat would not)
    keyed = df.withColumn(
        "_k", F.concat_ws("#", "conv_id",
                          F.lpad(F.col("turn_idx").cast("string"), 12, "0")))
    cands = minhash_lsh_candidates(keyed, id_col="_k", text_col=text_col,
                                   num_hashes=num_hashes, bands=bands)
    losers = cands.select(F.col("id_b").alias("_k")).distinct()
    return (keyed.join(losers, "_k", "left_anti").drop("_k"))


def run(spark: SparkSession, input_path: str, output_dir: str,
        min_words: int = 5) -> dict:
    """Full curation: extract -> quality -> exact dedup -> near dedup ->
    write. Returns the funnel {stage: rows}."""
    turns = spark.read.parquet(input_path)
    extracted = extract_turns_arrow(
        turns.sortWithinPartitions("conv_id", "turn_idx"))
    extracted = extracted.persist()
    funnel = {"input": extracted.count()}

    q = quality_filter(extracted, min_words=min_words)
    funnel["after_quality"] = q.count()

    e = drop_exact_dupes(q)
    funnel["after_exact_dedup"] = e.count()

    n = drop_near_dupes(e)
    out = n.sortWithinPartitions("conv_id", "turn_idx")
    out.write.mode("overwrite").parquet(output_dir + "/curated")
    funnel["after_near_dedup"] = spark.read.parquet(
        output_dir + "/curated").count()

    (spark.createDataFrame([tuple(funnel.values())],
                           schema=", ".join(f"{k} long" for k in funnel))
     .write.mode("overwrite").parquet(output_dir + "/_funnel"))
    extracted.unpersist()
    return funnel
