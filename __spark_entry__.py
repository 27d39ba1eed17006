"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    -> flagship extraction pipeline over sf0.001 transcripts
queries()       -> operator queries from SURVEY.md §2 (spark, sf_dir) -> DF
oracle_sql()    -> DuckDB-equivalent SQL per query (correctness gate)

Queries marked rows-only (no oracle entry) exercise operators whose
semantics are not ANSI-SQL-expressible (minhash LSH, simhash, language id,
IVF ANN, embedding segmentation); their exact semantics are pytest-gated
against reference fixtures instead (tests/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: F401,E402 (resolves pandas_udf type hints)
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

SF001 = "/root/testdata/sf0.001"

GAZETTEER_TERMS = ["spark", "table", "scan", "join", "filter"]
# A13 bundle-lane knowledge base: alias -> (entity, prior). 'spark' is
# ambiguous (top-1 must pick E1 by prior); 'scan'/'filter' have no entity
# (matched but unlinked — they count in n_matches, not n_linked).
ALIAS_TABLE = (("spark", "E1", 0.9), ("spark", "E9", 0.5),
               ("table", "E2", 0.8), ("join", "E3", 0.7))
GOLD_TERMS = ("spark", "table", "scan")
PRED_TERMS = ("table", "scan", "join")
STOPLIST = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
# per-language stoplists for the A3 routed lane (quality_scores)
STOPLIST_DE = ("der", "die", "das", "und", "ist", "ein", "nicht", "mit",
               "auf", "für")


def _load(spark: SparkSession, sf_dir: str, name: str,
          widen: bool = True) -> DataFrame:
    """Table load with a small-file parallelism guard: the bundled SF
    tables are single parquet files that scan as ONE split, serializing
    every downstream pandas UDF (or heavy JVM expression) onto one core.
    When the scan yields fewer splits than cores, round-robin repartition
    to core count — a no-op condition at real scale (100 TB tables scan
    as thousands of splits) and a cheap shuffle of a small file locally.
    Filters written by the queries still push down through the
    repartition node.

    widen=False opts a query out: pure-relational probes whose first real
    operator is itself a shuffle (groupBy / window partitionBy) gain
    nothing from pre-spreading a single small split — the map side is a
    trivial scan+partial-agg — so they keep the canonical
    scan->filter->partial->exchange->final plan with no extra Exchange."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if not widen:
        return df
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(par, 8):
        df = df.repartition(par)
    return df


def _extracted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + extraction arrays (shared prefix of several queries)."""
    from texoo_spark.extract import extract_discard_udf
    return (_load(spark, sf_dir, "documents")
            .withColumn("doc", extract_discard_udf(F.col("text")))
            .select("doc_id", "text", "doc.*"))


def _extracted_docs_lean(spark: SparkSession, sf_dir: str,
                         where=None) -> DataFrame:
    """Lean variant for queries that never read token surfaces: no
    tok_text through Arrow (EXTRACT_LEAN_SCHEMA, no HTML gate).
    ``where`` (a Column) filters the scan BEFORE the extraction UDF so
    subset lanes never pay full-table Python extraction (and skip the
    parallelism-widening repartition — a filtered subset is small by
    construction, so the extra exchange would only add a job)."""
    from texoo_spark.extract import _extract_batch_lean
    from pyspark.sql.functions import pandas_udf
    from texoo_spark.schema import EXTRACT_LEAN_SCHEMA
    from texoo_spark import textops

    @pandas_udf(EXTRACT_LEAN_SCHEMA)
    def lean_udf(texts: pd.Series) -> pd.DataFrame:
        return _extract_batch_lean(texts, textops.DISCARD)

    docs = _load(spark, sf_dir, "documents", widen=where is None)
    if where is not None:
        docs = docs.filter(where)
    return (docs.withColumn("doc", lean_udf(F.col("text")))
            .select("doc_id", "text", "doc.*"))


# ---------------------------------------------------------------------------
# flagship entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Full extraction pipeline on sf0.001: synthesize transcripts from the
    documents table (plain / multi-sentence / newline / HTML turns plus a
    skewed conversation), run HTML strip + segmentation + spans, preserve
    stable (conv_id, turn_idx) ordering."""
    from texoo_spark.arrow_extract import extract_turns_arrow
    from texoo_spark.pipeline import with_part_id
    from texoo_spark.transcripts import transcripts_from_documents

    docs = _load(spark, SF001, "documents")
    turns = with_part_id(transcripts_from_documents(docs),
                         n_buckets=16, salt_buckets=4)
    out = (extract_turns_arrow(
               turns.sortWithinPartitions("conv_id", "turn_idx"))
           .select("conv_id", "turn_idx", "role", "part_id",
                   "extracted_text", "n_sentences", "n_tokens"))
    return out


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_extract_tokens(spark, sf_dir):
    """T1/T2 tokenization, BOTH lanes in one probe: the rule tokenizer hot
    path (lane 'rule', lean Arrow schema) and the reference's REAL OpenNLP
    GIS maxent tokenizer model (lane 'maxent', byte-decoded model evaluated
    per candidate split, loaded once per executor). Token counts must agree
    with the whitespace oracle on the documents table for both lanes."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def cnt_udf(texts: pd.Series) -> pd.Series:
        from texoo_spark.maxent import maxent_tokenize_pos
        return pd.Series([len(maxent_tokenize_pos(t or ""))
                          for t in texts])

    rule = (_extracted_docs_lean(spark, sf_dir)
            .select(F.lit("rule").alias("lane"), "doc_id",
                    F.col("n_tokens").cast("long").alias("n_tokens")))
    docs = _load(spark, sf_dir, "documents")
    maxent = docs.select(F.lit("maxent").alias("lane"), "doc_id",
                         cnt_udf(F.col("text")).alias("n_tokens"))
    return rule.unionByName(maxent)


def q_extract_newline_discard(spark, sf_dir):
    """T1/T3/T7 extraction variants in one probe: 'two_sent' appends an
    explicit sentence boundary (' end. Stop now.' -> 2 sentences with exact
    reconstruction); 'nl_discard' prepends 'Header line\\n' exercising the
    Newlines.DISCARD offset algebra end-to-end."""
    from texoo_spark.extract import extract_discard_udf
    docs = _load(spark, sf_dir, "documents")
    two = (docs
           .withColumn("t2", F.concat(F.col("text"), F.lit(" end. Stop now.")))
           .withColumn("doc", extract_discard_udf(F.col("t2")))
           .select(F.lit("two_sent").alias("variant"), "doc_id",
                   F.col("doc.extracted_text").alias("extracted_text"),
                   F.col("doc.n_sentences").cast("long").alias("n_sentences")))
    nld = (docs
           .withColumn("t3", F.concat(F.lit("Header line"), F.lit("\n"),
                                      F.col("text")))
           .withColumn("doc", extract_discard_udf(F.col("t3")))
           .select(F.lit("nl_discard").alias("variant"), "doc_id",
                   F.col("doc.extracted_text").alias("extracted_text"),
                   F.col("doc.n_sentences").cast("long").alias("n_sentences")))
    return two.unionByName(nld)


def q_html_main_content(spark, sf_dir):
    """HTML boilerplate strip: main content equals the wrapped paragraph."""
    from texoo_spark.udfs import strip_html_text_udf
    docs = _load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><head><title>t</title></head><body><nav>'
              '<a href="/a">home</a> <a href="/b">about</a> '
              '<a href="/c">contact</a> <a href="/d">more</a></nav>'
              '<div><p>'),
        F.col("text"),
        F.lit('</p></div><footer><a href="/i">imprint</a> legal notice'
              '</footer></body></html>'))
    return (docs
            .filter(F.size(F.split(F.col("text"), " ")) >= 10)
            .withColumn("html", html)
            .select("doc_id", strip_html_text_udf(F.col("html"))
                    .alias("main_text")))


def q_gazetteer_matches(spark, sf_dir):
    """A1 gazetteer matching + A14 MULTI-STAGE model-bundle round trip.
    The primary column stays the fused extract+match single Python hop
    over every doc. For docs < 100 a THREE-stage pipeline — extract (T1)
    -> gazetteer (A1) -> linker (A13), all registered builder types — is
    written with save_pipeline, reconstructed with load_pipeline through
    the builder registry, and the LOADED pipeline runs end to end from
    RAW text: n_matches_bundle (gazetteer stage), n_linked_bundle and
    first_entity_bundle (linker stage, alias knowledge base serialized
    in params). Any drift in the serialization of any stage — extraction
    config, term list, alias table — breaks the oracle's closed-form
    replay of all three columns."""
    import tempfile

    from texoo_spark.annotator import (Pipeline, extract_annotator,
                                       gazetteer_annotator,
                                       linker_annotator, load_pipeline,
                                       save_pipeline)
    from texoo_spark.udfs import make_gazetteer_count_udf
    gaz = make_gazetteer_count_udf(GAZETTEER_TERMS, "CASE_SENSITIVE")
    docs = _load(spark, sf_dir, "documents")
    fused = docs.select("doc_id", gaz(F.col("text")).alias("n_matches"))

    p = Pipeline()
    # strip_html=False: the oracle states the bundle counts over RAW
    # text tokens, so the invariant must hold structurally — an HTML
    # gate would make it depend on no doc<100 ever looking HTML-like
    p.stages.append(extract_annotator("DISCARD", False))
    p.stages.append(gazetteer_annotator(list(GAZETTEER_TERMS),
                                        "CASE_SENSITIVE"))
    p.stages.append(linker_annotator([list(a) for a in ALIAS_TABLE]))
    path = os.path.join(tempfile.mkdtemp(prefix="texoo_bundle_"),
                        "pipeline.json")
    save_pipeline(p, path)
    loaded = load_pipeline(path)
    sub = (_load(spark, sf_dir, "documents", widen=False)
           .filter(F.col("doc_id") < 100).select("doc_id", "text"))
    bundle = (loaded.run(sub)
              .select("doc_id",
                      F.size("m_begin").cast("long")
                      .alias("n_matches_bundle"),
                      F.col("n_linked").cast("long")
                      .alias("n_linked_bundle"),
                      F.col("first_entity").alias("first_entity_bundle")))
    # bundle side is <= 100 rows: broadcast so the fused lane (the full
    # scan) never shuffles
    return fused.join(F.broadcast(bundle), "doc_id", "left")


def q_token_prf(spark, sf_dir):
    """V1 micro P/R/F1 on token-position STRONG matches of two term sets."""
    toks = (_extracted_docs(spark, sf_dir)
            .select("doc_id", F.explode("tok_text").alias("tok")))
    agg = toks.agg(
        F.sum(F.when(F.col("tok").isin(*[t for t in GOLD_TERMS if t in PRED_TERMS]), 1)
              .otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(F.col("tok").isin(*[t for t in PRED_TERMS if t not in GOLD_TERMS]), 1)
              .otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(F.col("tok").isin(*[t for t in GOLD_TERMS if t not in PRED_TERMS]), 1)
              .otherwise(0)).cast("long").alias("fn"))
    p = F.col("tp") / (F.col("tp") + F.col("fp"))
    r = F.col("tp") / (F.col("tp") + F.col("fn"))
    return agg.select(
        "tp", "fp", "fn",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(2 * p * r / (p + r), 6).alias("f1"))


def q_pricing_summary(spark, sf_dir):
    """R7 group-by aggregation (TPC-H Q1 shape), cents-exact integer sums."""
    li = _load(spark, sf_dir, "lineitem", widen=False)
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
                 F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                 .alias("sum_base_price_cents"),
                 F.count("*").alias("count_order")))


def q_top_order_per_customer(spark, sf_dir):
    """R6 ranking: highest-price order per customer."""
    orders = _load(spark, sf_dir, "orders", widen=False)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey"))
    return (orders.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_custkey", "o_orderkey",
                    F.round(F.col("o_totalprice") * 100).cast("long")
                    .alias("price_cents")))


def q_nation_revenue(spark, sf_dir):
    """R10/R7 join + aggregation; nation broadcast (small dim)."""
    orders = _load(spark, sf_dir, "orders", widen=False)
    cust = _load(spark, sf_dir, "customer", widen=False)
    nation = _load(spark, sf_dir, "nation", widen=False)
    return (orders
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                 .alias("revenue_cents"),
                 F.count("*").alias("n_orders")))


def q_events_hourly(spark, sf_dir):
    """Tumbling window aggregation over the events table."""
    ev = _load(spark, sf_dir, "events", widen=False)
    return (ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                       "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.round(F.col("value") * 100).cast("long"))
                 .alias("value_cents")))


def q_running_user_totals(spark, sf_dir):
    """R8 ordered window + sessionization, TWO lanes in one probe:

    - lane 'running': running event count + cents per user by time
      (seq = event_id, start/end NULL).
    - lane 'sessions': gap-based sessionization (sessions.session_stats,
      8-hour gap, integer-microsecond break arithmetic) — one row per
      (user, session) with count/cents/start/end (seq = session_idx).
      This is the BATCH twin of sessions.stream_sessionize (the
      applyInPandasWithState custom stateful operator, same semantics,
      tested in tests/test_sessions.py); the oracle replays the lag +
      running-sum-of-breaks construction in SQL.

    Session bounds are emitted as BIGINT epoch-microseconds
    (`start_us`/`end_us`, -1 in the running lane) rather than raw
    timestamps so the probe output is hash-render-proof: sub-second /
    NULL timestamp rendering differed between the driver's Spark and
    DuckDB collection paths in round 3 (the only red row)."""
    from texoo_spark.sessions import epoch_us, session_stats
    ev = _load(spark, sf_dir, "events", widen=False)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    running = (ev.select(F.lit("running").alias("lane"), "user_id",
                         F.col("event_id").cast("long").alias("seq"),
                         F.count("*").over(w).alias("n"),
                         F.sum(F.round(F.col("value") * 100).cast("long"))
                         .over(w).alias("cents"))
               .withColumn("start_us", F.lit(-1).cast("long"))
               .withColumn("end_us", F.lit(-1).cast("long")))
    stats = session_stats(ev, "user_id", "ts", gap_sec=28800,
                          value_col="value", order_cols=("event_id",))
    sessions = stats.select(
        F.lit("sessions").alias("lane"), "user_id",
        F.col("session_idx").cast("long").alias("seq"),
        F.col("n_events").alias("n"), "cents",
        epoch_us(stats, "start_ts").alias("start_us"),
        epoch_us(stats, "end_ts").alias("end_us"))
    return running.unionByName(sessions)


def q_dedup_prefix(spark, sf_dir):
    """Exact dedup on a derived key (hash-groupBy; min-id survivor)."""
    docs = _load(spark, sf_dir, "documents", widen=False)
    key = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 3), " ")
    return (docs.withColumn("prefix_key", key)
            .groupBy("prefix_key")
            .agg(F.count("*").alias("n_copies"),
                 F.min("doc_id").alias("keep_id"))
            .filter(F.col("n_copies") > 1))


def _segmentation_eval(spark, sf_dir):
    """V2/V3 shared lane: embeddings rows grouped into 50-sentence docs,
    GOLD sections = label runs, PRED sections = runs of the 1-shifted
    label sequence, evaluated per doc by metrics_spark.evaluate_segmentation
    (applyInPandas partitioned on doc — the scale-correct plan; no global
    window)."""
    from texoo_spark.metrics_spark import evaluate_segmentation
    emb = _load(spark, sf_dir, "embeddings")
    w = Window.partitionBy("doc").orderBy("vec_id")
    base = (emb.select((F.col("vec_id") / 50).cast("long").alias("doc"),
                       "vec_id", "label")
            .withColumn("pos", F.row_number().over(w) - 1)
            .withColumn("hyp", F.coalesce(F.lag("label").over(w),
                                          F.col("label")))
            .withColumn("chg_ref", (F.col("pos") == 0)
                        | (F.col("label") != F.lag("label").over(w)))
            .withColumn("chg_hyp", (F.col("pos") == 0)
                        | (F.col("hyp") != F.lag("hyp").over(w))))
    n_per = base.groupBy("doc").agg(F.count("*").alias("n_sentences"))
    base = base.join(n_per, "doc")
    gold = (base.filter("chg_ref")
            .select("doc", "n_sentences", F.col("pos").alias("sent_begin"),
                    "label"))
    pred = (base.filter("chg_hyp")
            .select("doc", "n_sentences", F.col("pos").alias("sent_begin"),
                    F.col("hyp").alias("label")))
    return evaluate_segmentation(gold, pred, doc_key="doc")


def q_segmentation_metrics(spark, sf_dir):
    """V2 Pk + V3 WindowDiff per 50-sentence document in one pass
    (SegmentationEvaluation.java semantics; distributed applyInPandas
    lane — one shuffle on doc, no global window; both metrics come out of
    the same per-doc evaluation)."""
    return (_segmentation_eval(spark, sf_dir)
            .select("doc", "k", F.round("pk", 6).alias("pk"),
                    F.round("wd", 6).alias("wd")))


def q_retrieval_mrr(spark, sf_dir):
    """V6 per-query MRR/AP/recall/P@5/nDCG@10: one retrieval query per
    label, ranked by a deterministic score (1/(1+vec_id)), relevant =
    vec_id % 3 == 0; scored by the fixture-exact evaluate_query inside
    metrics_spark.retrieval_per_query (applyInPandas per query group —
    the scale shape, no global window)."""
    from texoo_spark.metrics_spark import retrieval_per_query
    emb = _load(spark, sf_dir, "embeddings")
    pred = emb.select(F.col("label").alias("query_id"),
                      F.col("vec_id").cast("string").alias("result_key"),
                      (1.0 / (1 + F.col("vec_id"))).alias("score"))
    gold = (emb.filter(F.col("vec_id") % 3 == 0)
            .select(F.col("label").alias("query_id"),
                    F.col("vec_id").cast("string").alias("result_key"),
                    F.lit(1).alias("relevance")))
    per_q = retrieval_per_query(pred, gold)
    return per_q.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.round("mrr", 6).alias("mrr"),
        F.round("ap", 6).alias("ap"),
        F.round("recall_n", 6).alias("recall_n"),
        F.round("p_at_5", 6).alias("p_at_5"),
        F.round("ndcg_at_10", 6).alias("ndcg_at_10"))


def q_knn_cosine(spark, sf_dir):
    """R6 brute-force cosine top-k, BOTH execution lanes in one probe:

    - lane 'single' (query_id = -1): one query vector against the corpus
      via JVM-side zip_with/aggregate -> TakeOrderedAndProject (no full
      shuffle; the rank is stamped on the 10 surviving rows only, so the
      pre-limit plan keeps its shape).
    - lane 'batch' (query_id 0-4): a query MATRIX against the corpus via
      one float64 numpy matmul per Arrow batch, per-query window top-5
      ranked on round-6 cosine with vec_id tie-break."""
    import numpy as np
    from texoo_spark.knn import brute_force_topk_batch, cosine_expr
    emb = (_load(spark, sf_dir, "embeddings")
           .withColumn("emb_d", F.col("embedding").cast("array<double>")))
    qrows = (emb.filter(F.col("vec_id") < 5)
             .orderBy("vec_id").select("emb_d").collect())
    queries = np.array([np.asarray(r[0], dtype=np.float64) for r in qrows])
    single10 = (emb.select("vec_id",
                           F.round(cosine_expr("emb_d", queries[0].tolist()),
                                   6).alias("cosine"))
                .orderBy(F.desc("cosine"), F.col("vec_id"))
                .limit(10))
    w10 = Window.orderBy(F.desc("cosine"), F.col("vec_id"))
    single = single10.select(
        F.lit("single").alias("lane"), F.lit(-1).cast("long").alias("query_id"),
        F.row_number().over(w10).cast("long").alias("rank"),
        F.col("vec_id").cast("long").alias("vec_id"), "cosine")
    batch = (brute_force_topk_batch(emb, queries, k=5, vec_col="emb_d")
             .select(F.lit("batch").alias("lane"),
                     F.col("query_id").cast("long").alias("query_id"),
                     F.col("rank").cast("long").alias("rank"),
                     F.col("vec_id").cast("long").alias("vec_id"),
                     F.round(F.col("cosine"), 6).alias("cosine")))
    return single.unionByName(batch)


def q_quality_scores(spark, sf_dir):
    """Per-document curation profile in one projection — plus A3
    language routing. Quality features are pure JVM-side SQL expressions
    (length/digit/stopword ratios), the windowed-min-FNV document
    fingerprint and language id are the one Python hop — the columns a
    100TB curation job computes in its first scan over every document.
    The profile is then dispatched through route_by_language
    (GenericMentionAnnotator semantics): an 'en' and a 'de' annotator
    each stamp their route and count THEIR language's stopwords; every
    other/unknown language falls back to the default ('en') annotator.
    The profile is persisted once so the routed union's branches filter
    a cache instead of re-running the UDF scan per branch."""
    from texoo_spark.annotator import Annotator, route_by_language
    from texoo_spark.extract import detect_language_udf
    from texoo_spark.udfs import fingerprint_udf
    docs = _load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words).cast("long")
    n_chars = F.length("text").cast("double")
    digits = (n_chars - F.length(F.regexp_replace(F.col("text"),
                                                  "[0-9]", ""))) / n_chars
    stop_ratio = (F.size(F.filter(words, lambda w: w.isin(*STOPLIST)))
                  / F.size(words))
    profile = docs.select(
        "doc_id", "text", n_words.alias("n_words"),
        F.round(digits, 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        fingerprint_udf(F.col("text")).alias("fingerprint"),
        detect_language_udf(F.col("text")).alias("lang_pred")).persist()

    def stop_annotator(lang: str, stops: tuple) -> Annotator:
        def fn(df):
            ws = F.split(F.col("text"), " ")
            return (df.withColumn("route", F.lit(lang))
                    .withColumn("routed_stopwords",
                                F.size(F.filter(
                                    ws, lambda w: w.isin(*stops)))
                                .cast("long")))
        return Annotator(f"stopwords:{lang}", fn, {"lang": lang})

    routed = route_by_language(
        profile,
        {"en": stop_annotator("en", STOPLIST),
         "de": stop_annotator("de", STOPLIST_DE)},
        default_lang="en", lang_col="lang_pred")
    return routed.select("doc_id", "n_words", "digit_ratio",
                         "stopword_ratio", "fingerprint", "lang_pred",
                         "route", "routed_stopwords")


def q_conv_rebase(spark, sf_dir):
    """T10 Document.append offset algebra: per-turn offsets rebased into
    conversation space via a window cumulative sum (no UDF)."""
    from texoo_spark.conversation import rebase_turn_offsets
    docs = _load(spark, sf_dir, "documents")
    turns = (docs
             .withColumn("conv_id", (F.col("doc_id") % 50).cast("long"))
             .withColumn("turn_idx", (F.col("doc_id") / 50).cast("long")))
    return (rebase_turn_offsets(turns, text_col="text")
            .select("doc_id", "conv_begin", "conv_end"))


def q_newline_segments(spark, sf_dir):
    """A7 newline segmentation: a segment ends at every sentence containing
    a newline token (SectorAnnotator.applySectionsFromNewlines)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType
    from texoo_spark.extract import extract_keep_udf
    from texoo_spark.segment import segments_from_newlines

    @pandas_udf(LongType())
    def n_segments(tok_text: pd.Series, starts: pd.Series,
                   ends: pd.Series) -> pd.Series:
        out = []
        for toks, ts, te in zip(tok_text, starts, ends):
            toks = list(toks)
            has_nl = ["\n" in toks[a:b] for a, b in zip(ts, te)]
            out.append(len(segments_from_newlines(has_nl)))
        return pd.Series(out)

    docs = _load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    three_part = F.concat(
        F.array_join(F.slice(words, 1, 5), " "), F.lit("\n"),
        F.array_join(F.slice(words, 6, 5), " "), F.lit("\n"),
        F.array_join(F.slice(words, 11, F.size(words) - 10), " "))
    return (docs.filter(F.size(words) > 10)
            .withColumn("doc", extract_keep_udf(three_part))
            .select("doc_id",
                    n_segments(F.col("doc.tok_text"),
                               F.col("doc.sent_tok_start"),
                               F.col("doc.sent_tok_end")).alias("n_segments")))


def q_max_overlap_token(spark, sf_dir):
    """R3 max-overlap join: for the probe char range [10, 40), the token
    with the largest overlap, per document."""
    from texoo_spark.conversation import max_overlap_join
    toks = (_extracted_docs_lean(spark, sf_dir)
            .select("doc_id",
                    F.explode(F.arrays_zip("tok_begin", "tok_end")).alias("t"))
            .select("doc_id", F.col("t.tok_begin").alias("c_begin"),
                    F.col("t.tok_end").alias("c_end")))
    probes = (_load(spark, sf_dir, "documents")
              .select("doc_id", F.lit(10).alias("p_begin"),
                      F.lit(40).alias("p_end")))
    return (max_overlap_join(probes, toks, ["doc_id"])
            .select("doc_id", F.col("c_begin").cast("long").alias("best_begin"),
                    F.col("overlap").cast("long").alias("overlap")))


def q_media_features(spark, sf_dir):
    """Multimodal plumbing, FIVE lanes in one probe:

    - lane 'mp4:decoded': the FULL in-container codec loop — synthetic
      Motion-JPEG MP4s (real baseline-JPEG bitstreams as samples,
      fourcc 'mjpa') are container-parsed, keyframe-sampled every
      500 ms, each selected frame's bytes sliced JVM-side, and ONLY the
      sampled frames' bytes enter Python to be entropy-decoded
      (jpegcodec T.81) into pixel statistics. Flat-8x8-block frames at
      quality 100 decode bit-exactly, so the oracle states every
      decoded stat in closed form from (media_id, sample_idx).

    - lane 'mp4': REAL ISO-BMFF container parsing (mp4box.py). Synthetic
      spec-conformant MP4s (sample bytes/sizes/timing closed-form in
      media_id; co64 + version-1 boxes rotate in on id residues) are
      parsed back through the real box walker (stts/stsz/stsc/stco/stss/
      tkhd/mdhd), frames are sampled every 500ms with the
      snap-to-preceding-sync rule as pure DataFrame ops, and each
      selected frame's byte range is sliced JVM-side (binary substring)
      and sha256'd. The oracle rebuilds dts/offset/size/sync, replays the
      selection, and hashes the closed-form frame bytes — a misparse of
      any sample-table box breaks the hash.

    - lane 'frames': feature extraction (payloads as opaque binary ->
      mapInPandas, sha256 + byte counts) joined with the frame-sampling
      PLAN — (media_id, duration_ms) metadata expands to one row per
      sampled frame timestamp WITHOUT touching payload bytes (decode
      happens downstream only for sampled rows). Every 3rd doc is a
      video at 250ms/word; join restricts to those.
    - lane 'decoded': REAL codec round trip. mediacodec.synth_media_payload
      builds spec-conformant PNG / BMP / RIFF-WAV / baseline-JPEG bytes
      per media_id (pixel and sample values are a closed-form function of
      media_id) into an opaque binary column; decode_media_stats parses
      the bytes back through the real codecs (PNG chunk walk + CRC +
      inflate + per-row de-filtering incl. Sub/Up/Average/Paeth, BMP
      header + BGR rows, RIFF chunk walk + PCM16, and for JPEG the full
      T.81 baseline path: marker walk, DQT/DHT, Huffman entropy decode,
      dequantize, IDCT — jpegcodec.py; flat-block quality-100 images make
      the lossy format's round trip bit-exact) and reports value
      statistics. The oracle states width/height/count/mean/first/last in
      closed form from media_id — decoding bugs anywhere in the chain
      break the hash.

    At scale the binary column is the real input (media fetched into the
    table); generation here is the hermetic stand-in, same strategy as
    pdf_layout's bytes lane. Both lanes are per-row-independent
    Arrow-batched maps — no shuffle before the metadata join."""
    from texoo_spark.multimodal import decode_media_stats, \
        extract_media_features, frame_sample_plan
    docs = _load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("mime"),
        F.lit(0).alias("width"), F.lit(0).alias("height"),
        F.lit(0).alias("duration_ms"),
        F.encode(F.col("text"), "utf-8").alias("payload"))
    feats = (extract_media_features(media, dims=8)
             .select("media_id", "sha256", "n_bytes"))
    video_meta = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "video/mp4")
        .otherwise("image/png").alias("mime"),
        (F.size(F.split(F.col("text"), " ")) * F.lit(250)).cast("int")
        .alias("duration_ms"))
    frames = (frame_sample_plan(video_meta, every_ms=1000)
              .select("media_id",
                      F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")))
    frames_lane = (frames.join(feats, "media_id")
                   .select(F.lit("frames").alias("lane"),
                           "media_id", "frame_ts_ms", "sha256", "n_bytes",
                           F.lit(None).cast("string").alias("mime"),
                           F.lit(None).cast("int").alias("width"),
                           F.lit(None).cast("int").alias("height"),
                           F.lit(None).cast("long").alias("v_count"),
                           F.lit(None).cast("double").alias("v_mean"),
                           F.lit(None).cast("double").alias("v_first"),
                           F.lit(None).cast("double").alias("v_last")))

    def synth(batches):
        from texoo_spark.mediacodec import synth_media_payload
        for pdf in batches:
            made = [synth_media_payload(int(i)) for i in pdf["media_id"]]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "mime": [m for m, _ in made],
                                "payload": [p for _, p in made]},
                               columns=["media_id", "mime", "payload"])

    payloads = (docs.select(F.col("doc_id").alias("media_id"))
                .filter(F.col("media_id") < 120)
                .mapInPandas(synth, "media_id long, mime string,"
                                    " payload binary"))
    decoded_lane = (decode_media_stats(payloads)
                    .select(F.lit("decoded").alias("lane"), "media_id",
                            F.lit(None).cast("long").alias("frame_ts_ms"),
                            F.lit(None).cast("string").alias("sha256"),
                            F.lit(None).cast("long").alias("n_bytes"),
                            "mime", "width", "height", "v_count",
                            F.round("v_mean", 6).alias("v_mean"),
                            "v_first", "v_last"))

    from texoo_spark.multimodal import (parse_mp4_samples,
                                        sample_sync_frames,
                                        slice_frame_bytes)

    def synth_v(batches):
        from texoo_spark.mp4box import synth_mp4
        for pdf in batches:
            yield pd.DataFrame(
                {"media_id": pdf["media_id"],
                 "payload": [synth_mp4(int(i)) for i in pdf["media_id"]]},
                columns=["media_id", "payload"])

    # persisted: the synth stage (the stand-in "fetch") feeds BOTH the
    # metadata parse and the frame-slice join — one pass, not two
    videos = (docs.select(F.col("doc_id").alias("media_id"))
              .filter(F.col("media_id") < 90)
              .mapInPandas(synth_v, "media_id long, payload binary")
              .persist())
    picked = sample_sync_frames(parse_mp4_samples(videos), every_ms=500)
    mp4_lane = (slice_frame_bytes(picked, videos)
                .select(F.lit("mp4").alias("lane"), "media_id",
                        F.col("dts_ms").alias("frame_ts_ms"),
                        F.col("frame_sha256").alias("sha256"),
                        F.col("size").cast("long").alias("n_bytes"),
                        F.lit("video/mp4").alias("mime"),
                        "width", "height",
                        F.col("sample_idx").cast("long").alias("v_count"),
                        F.lit(None).cast("double").alias("v_mean"),
                        F.col("offset").cast("double").alias("v_first"),
                        F.col("duration_ms").cast("double").alias("v_last")))

    from texoo_spark.multimodal import decode_jpeg_frame_stats

    def synth_mj(batches):
        from texoo_spark.mp4box import synth_mjpeg_mp4
        for pdf in batches:
            yield pd.DataFrame(
                {"media_id": pdf["media_id"],
                 "payload": [synth_mjpeg_mp4(int(i))
                             for i in pdf["media_id"]]},
                columns=["media_id", "payload"])

    mj_videos = (docs.select(F.col("doc_id").alias("media_id"))
                 .filter((F.col("media_id") >= 90) & (F.col("media_id") < 114))
                 .mapInPandas(synth_mj, "media_id long, payload binary")
                 .persist())
    mj_picked = sample_sync_frames(parse_mp4_samples(mj_videos),
                                   every_ms=500)
    mj_stats = decode_jpeg_frame_stats(
        slice_frame_bytes(mj_picked, mj_videos))
    mjpeg_lane = mj_stats.select(
        F.lit("mp4:decoded").alias("lane"), "media_id",
        F.col("dts_ms").alias("frame_ts_ms"),
        F.lit(None).cast("string").alias("sha256"),
        F.lit(None).cast("long").alias("n_bytes"),
        F.lit("video/mjpeg").alias("mime"),
        "width", "height", "v_count",
        F.round("v_mean", 6).alias("v_mean"), "v_first", "v_last")
    return (frames_lane.unionByName(decoded_lane)
            .unionByName(mp4_lane).unionByName(mjpeg_lane))


def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs: each doc paired with a mutated
    copy (last 2 words dropped) must be rediscovered with its similarity."""
    from texoo_spark.dedup import ngram_jaccard_pairs
    docs = (_load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 200))
    words = F.split(F.col("text"), " ")
    mutated = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(F.slice(words, 1, F.greatest(F.size(words) - 2, F.lit(1))),
                     " ").alias("text"))
    both = docs.select("doc_id", "text").unionByName(mutated)
    return ngram_jaccard_pairs(both, n=3, min_jaccard=0.5)


def q_bm25_topk(spark, sf_dir):
    """Distributed BM25 retrieval, BOTH lanes in one probe (Lucene
    PassageIndex/DocumentIndex + QueryRunner retrieve shape):

    - lane 'scores' (rank NULL): EVERY (query, doc) scored pair — the
      oracle value-verifies the scoring machinery on all pairs, not just
      rank survivors
    - lane 'topk': round-3 rank key with doc_id tie-break for
      cross-engine-exact top-10 rank membership

    Single-build persisted postings, broadcast query terms."""
    from texoo_spark.retrieval import bm25_scores, bm25_topk
    docs = _load(spark, sf_dir, "documents")
    queries = (docs.filter(F.col("doc_id") < 5)
               .select(F.col("doc_id").alias("query_id"),
                       F.array_join(F.slice(F.split(F.col("text"), " "),
                                            1, 3), " ").alias("query_text")))
    scores = (bm25_scores(docs, queries)
              .select(F.lit("scores").alias("lane"), "query_id",
                      F.lit(None).cast("long").alias("rank"), "doc_id",
                      F.round(F.col("score"), 3).alias("score")))
    topk = (bm25_topk(docs, queries, k=10, rank_round=3)
            .select(F.lit("topk").alias("lane"), "query_id",
                    F.col("rank").cast("long").alias("rank"),
                    "doc_id", "score"))
    return scores.unionByName(topk)


def q_train_test_split(spark, sf_dir):
    """R9 split/sample: deterministic key-derived split (md5 of the id)
    into train/val/test 8/1/1 — stable under repartitioning, retries and
    cluster size, unlike randomSplit (whose output depends on seed AND
    partitioning; at 10^12 rows reproducible splits must be key-derived).
    Returns per-split counts + id ranges."""
    docs = _load(spark, sf_dir, "documents", widen=False)
    # md5 of the id string -> first 3 hex digits mod 10: overflow-free at
    # any id magnitude (a raw id*A product overflows BIGINT past ~3.5e9
    # ids), reproducible across engines, bias 4096 % 10 / 4096 < 0.1%
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 3),
               16, 10).cast("long"), F.lit(10))
    split = (F.when(bucket < 8, "train")
             .when(bucket == 8, "val").otherwise("test"))
    return (docs.withColumn("split", split)
            .groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("min_id"),
                 F.max("doc_id").alias("max_id")))


def q_table_snapshots(spark, sf_dir):
    """Transactional table-format lane (the Iceberg/Delta seam,
    texoo_spark/tablelog.py): two appends + a copy-on-write delete + a
    third append against a versioned parquet table, then TIME-TRAVEL
    reads of every version, all in one probe. The oracle states each
    version's exact contents in closed form, so atomicity/visibility
    bugs (torn commits, a delete rewriting the wrong files, version
    skew, schema drift through the log) break the value hash.

    Commit sequence over documents(doc_id < 300):
      v1 append  doc_id % 3 = 0
      v2 append  doc_id % 3 = 1
      v3 delete  doc_id % 2 = 0   (copy-on-write rewrite)
      v4 append  doc_id % 3 = 2   (deleted evens of lane 2 return)
      v5 MERGE   doc_id % 5 = 0 upserts: matched rows' text becomes
                 repeat('m', doc_id % 7 + 3), unmatched insert (the
                 file-pruned copy-on-write upsert path)
      v6 append(merge_schema=True) of doc_id in [300, 330) carrying a
                 NEW nullable column extra = doc_id * 2 — additive
                 schema evolution; every pre-v6 row reads back NULL"""
    import tempfile

    from texoo_spark.tablelog import TableLog
    all_docs = _load(spark, sf_dir, "documents", widen=False)
    docs = (all_docs.filter(F.col("doc_id") < 300)
            .select("doc_id", "text"))
    t = TableLog(tempfile.mkdtemp(prefix="texoo_tablelog_"))
    t.append(docs.filter(F.col("doc_id") % 3 == 0))
    t.append(docs.filter(F.col("doc_id") % 3 == 1))
    t.delete_where(spark, "doc_id % 2 = 0")
    t.append(docs.filter(F.col("doc_id") % 3 == 2))
    src = (docs.filter(F.col("doc_id") % 5 == 0)
           .select("doc_id",
                   F.expr("repeat('m', cast(doc_id % 7 + 3 as int))")
                   .alias("text")))
    t.merge(spark, src, ["doc_id"])
    evolved = (all_docs.filter((F.col("doc_id") >= 300)
                               & (F.col("doc_id") < 330))
               .select("doc_id", "text",
                       (F.col("doc_id") * 2).alias("extra")))
    t.append(evolved, merge_schema=True)
    out = None
    for label, v in [("v1", 1), ("v2", 2), ("v3", 3), ("v4", 4),
                     ("v5", 5), ("latest", None)]:
        df = t.read(spark, v)
        if "extra" not in df.columns:
            df = df.withColumn("extra", F.lit(None).cast("long"))
        lane = df.select(F.lit(label).alias("lane"), "doc_id",
                         F.length("text").cast("long").alias("n_chars"),
                         F.col("extra").cast("long").alias("extra"))
        out = lane if out is None else out.unionByName(lane)
    return out


def q_pdf_layout(spark, sf_dir):
    """PDF layout extraction, BOTH lanes in one probe:

    - lane 'boxes': a deterministic word-box table (3 lines x 4 words,
      paragraph gap before line 3) -> reading-order text via
      groupBy(doc).applyInPandas over pdfops.layout_text (the layout
      stage in isolation).
    - lane 'bytes': REAL PDF decode round trip. pdfgen.make_pdf builds
      spec-conformant PDF bytes per doc (first 16 words, 3 words/line,
      8 words/paragraph; FlateDecode-compressed for doc_id % 3 != 0,
      two-column layout for odd doc_id) into an opaque binary column;
      pdfops.decode_pdf_bytes parses the object graph / inflates streams /
      interprets the content-stream text operators back into word boxes,
      and layout_text reconstructs reading order. Reading order is
      invariant to the compression and column knobs, so the oracle states
      the expected text in SQL: words 1-8 joined, newline, words 9-16.

    At scale the binary column is the real input (PDFs fetched into the
    table); generation here is the hermetic stand-in. Decode is a
    per-row-independent Arrow-batched map — no shuffle."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType, StringType

    from texoo_spark.pdfops import WordBox, layout_text
    docs = _load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    boxes = (docs.filter(F.size(words) >= 12)
             .select("doc_id",
                     F.posexplode(F.slice(words, 1, 12)).alias("i", "w"))
             .withColumn("x0", (F.col("i") % 4) * 50.0)
             .withColumn("x1", F.col("x0") + 48.0)
             .withColumn("line", F.floor(F.col("i") / 4))
             .withColumn("y0", F.when(F.col("line") < 2,
                                      F.col("line") * 12.0).otherwise(44.0))
             .withColumn("y1", F.col("y0") + 10.0))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("i")
        wb = [WordBox(0, r.x0, r.y0, r.x1, r.y1, r.w)
              for r in pdf.itertuples()]
        return pd.DataFrame({"doc_id": [pdf["doc_id"].iloc[0]],
                             "layout_text": [layout_text(wb)]})

    boxes_lane = (boxes.groupBy("doc_id")
                  .applyInPandas(run, "doc_id long, layout_text string")
                  .select(F.lit("boxes").alias("lane"), "doc_id",
                          "layout_text"))

    @pandas_udf(BinaryType())
    def gen_pdf(ids: pd.Series, texts: pd.Series) -> pd.Series:
        from texoo_spark.pdfgen import make_pdf, wrap_words
        out = []
        for i, t in zip(ids, texts):
            ws = (t or "").split(" ")[:16]
            out.append(make_pdf([wrap_words(ws, per_line=3, per_para=8)],
                                two_column=bool(i % 2),
                                compress=(i % 3 != 0)))
        return pd.Series(out)

    @pandas_udf(StringType())
    def decode_layout(pdfs: pd.Series) -> pd.Series:
        from texoo_spark.pdfops import decode_pdf_bytes, layout_text
        return pd.Series([layout_text(decode_pdf_bytes(bytes(b)))
                          for b in pdfs])

    bytes_lane = (docs.filter(F.size(words) >= 16)
                  .withColumn("pdf", gen_pdf(F.col("doc_id"), F.col("text")))
                  .select(F.lit("bytes").alias("lane"), "doc_id",
                          decode_layout(F.col("pdf")).alias("layout_text")))

    return boxes_lane.unionByName(bytes_lane)


def q_conversation_text(spark, sf_dir):
    """T10/R10 conversation assembly: ordered concat of turn texts per
    conversation (Document.append at conversation scope), shuffle-once
    groupBy with deterministic in-group ordering via sort_array."""
    docs = _load(spark, sf_dir, "documents")
    turns = (docs
             .withColumn("conv_id", (F.col("doc_id") % 50).cast("long"))
             .withColumn("turn_idx", (F.col("doc_id") / 50).cast("long")))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
        lambda s: s["text"])
    return (turns.groupBy("conv_id")
            .agg(F.array_join(ordered, "\n").alias("conv_text"),
                 F.count("*").alias("n_turns")))


def q_tagged_mentions(spark, sf_dir):
    """A2/A4 distributed tagger inference + A13 entity linking, one probe:
    broadcast weights -> batched numpy forward -> BIO2 decode (the
    deterministic baseline tags capitalized tokens; first 3 words are
    initcap'd, so n_mentions = alphabetic first-3-word count), JOINED with
    the linking lane: first-word mentions against a broadcast alias table
    derived from the corpus vocabulary, top candidate = the word's entity."""
    from texoo_spark.extract import extract_discard_udf
    from texoo_spark.linking import link_mentions
    from texoo_spark.tagger import LinearTagger, tag_mentions
    docs = _load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    text2 = F.concat(
        F.initcap(F.array_join(F.slice(words, 1, 3), " ")), F.lit(" "),
        F.array_join(F.slice(words, 4, F.greatest(F.size(words) - 3,
                                                  F.lit(1))), " "))
    extracted = (docs.withColumn("doc", extract_discard_udf(text2))
                 .select("doc_id", "doc.*"))
    tagged = (tag_mentions(extracted,
                           LinearTagger.capitalized_mention_baseline())
              .select("doc_id",
                      F.size("m_begin").cast("long").alias("n_mentions")))
    w1 = F.element_at(words, 1)
    mentions = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"), F.lit(0).alias("begin"),
        F.length(w1).cast("int").alias("end"), w1.alias("surface"))
    aliases = (docs.select(F.explode(words).alias("alias"))
               .distinct()
               .select("alias", F.upper("alias").alias("entity_id"),
                       F.length("alias").cast("double").alias("prior")))
    linked = (link_mentions(mentions, aliases, top_k=1)
              .filter(F.col("cand_rank") == 1)
              .select(F.col("conv_id").cast("long").alias("doc_id"),
                      "entity_id"))
    return tagged.join(linked, "doc_id")


def q_tagged_mentions_trained(spark, sf_dir):
    """A2 trained-model lane: the SAME distributed harness as
    tagged_mentions but with weights learned deterministically from the
    reference CoNLL2003 fixture (surface + letter-trigram features,
    full-batch softmax GD — train-set span F1 = 1.0, pinned in
    tests/test_tagger.py). The oracle re-scores every token in SQL with
    the trained weights inlined (trigram weight maps + surface-pattern
    partials) and re-counts decoded spans."""
    from texoo_spark.extract import extract_discard_udf
    from texoo_spark.tagger import tag_mentions, train_conll_tagger
    # restrict to pure-alphabetic lowercase texts so the token surface
    # patterns stay within the three the oracle scores (guards against
    # driver data with digits/mixed case; a no-op on the bundled SFs)
    docs = (_load(spark, sf_dir, "documents")
            .filter(F.col("text").rlike("^[a-z ]+$")))
    words = F.split(F.col("text"), " ")
    text2 = F.concat(
        F.initcap(F.array_join(F.slice(words, 1, 3), " ")), F.lit(" "),
        F.array_join(F.slice(words, 4, F.greatest(F.size(words) - 3,
                                                  F.lit(1))), " "))
    extracted = (docs.withColumn("doc", extract_discard_udf(text2))
                 .select("doc_id", "doc.*"))
    tagger, _enc = train_conll_tagger()
    tagged = tag_mentions(extracted, tagger)
    return tagged.select(
        "doc_id", F.size("m_begin").cast("long").alias("n_mentions"))


def q_tokens_in_range(spark, sf_dir):
    """R2 range query + R4 span<->annotation zip, one probe:

    - tokens in [10, 40) per doc under BOTH reference semantics —
      enclosed and boundary-expanding (Document.java:156-174) — as
      JVM-side higher-order functions over the offset arrays
    - two half-document sentence spans each zipped with the single
      enclosing GOLD annotation (span_zip join)

    Output: one row per (doc, half-span) carrying the zip columns plus
    the doc's range counts."""
    from texoo_spark.conversation import span_zip
    b, e = F.lit(10), F.lit(40)
    z = F.arrays_zip("tok_begin", "tok_end")
    enclosed = F.size(F.filter(
        z, lambda t: (t["tok_begin"] >= b) & (t["tok_end"] <= e)))
    expand = F.size(F.filter(
        z, lambda t: ((t["tok_begin"] <= b) & (t["tok_end"] > b))
        | ((t["tok_begin"] >= b) & (t["tok_end"] <= e))
        | ((t["tok_begin"] < e) & (t["tok_end"] >= e))))
    ranges = (_extracted_docs_lean(spark, sf_dir)
              .select("doc_id", enclosed.cast("long").alias("n_enclosed"),
                      expand.cast("long").alias("n_expand")))
    docs = _load(spark, sf_dir, "documents")
    n = F.length("text")
    half = (n / 2).cast("int")
    spans = docs.select("doc_id", F.lit(0).alias("s_begin"),
                        half.alias("s_end")).unionByName(
        docs.select("doc_id", half.alias("s_begin"),
                    n.cast("int").alias("s_end")))
    anns = docs.select("doc_id", F.lit(0).alias("a_begin"),
                       n.cast("int").alias("a_end"),
                       F.lit("GOLD").alias("a_source"))
    zipped = (span_zip(spans, anns, ["doc_id"])
              .select("doc_id",
                      F.col("s_begin").cast("long").alias("s_begin"),
                      F.col("s_end").cast("long").alias("s_end"),
                      F.col("a_end").cast("long").alias("a_end")))
    return zipped.join(ranges, "doc_id")


def q_span_matches(spark, sf_dir):
    """R5 STRONG + WEAK annotation matching in one probe
    (Annotation.java:143-158, after Cornolti et al. 2013):

    - STRONG (same begin AND end): gold = even-index tokens, pred =
      every-3rd-index tokens; equi-join on (doc, begin, end) counts
      tokens at indices divisible by 6.
    - WEAK (any overlap): gold = token pairs (2i, 2i+1) merged into one
      span; overlap join counts pred tokens intersecting any gold pair.

    One extraction pass feeds both join shapes; per-doc counts joined."""
    toks = (_extracted_docs_lean(spark, sf_dir)
            .select("doc_id", F.posexplode(
                F.arrays_zip("tok_begin", "tok_end")).alias("i", "t"))
            .select("doc_id", "i", F.col("t.tok_begin").alias("begin"),
                    F.col("t.tok_end").alias("end")))
    gold_s = toks.filter(F.col("i") % 2 == 0).select("doc_id", "begin", "end")
    pred = toks.filter(F.col("i") % 3 == 0)
    strong = (gold_s.join(pred.select("doc_id", "begin", "end"),
                          ["doc_id", "begin", "end"])
              .groupBy("doc_id").agg(F.count("*").alias("n_strong")))
    even = toks.filter(F.col("i") % 2 == 0).select(
        "doc_id", (F.col("i") / 2).cast("int").alias("g"),
        F.col("begin").alias("g_begin"))
    odd = toks.filter(F.col("i") % 2 == 1).select(
        "doc_id", ((F.col("i") - 1) / 2).cast("int").alias("g"),
        F.col("end").alias("g_end"))
    gold_w = even.join(odd, ["doc_id", "g"])
    weak = (pred.join(gold_w, ["doc_id"])
            .filter((F.col("begin") < F.col("g_end"))
                    & (F.col("end") > F.col("g_begin")))
            .select("doc_id", "i").distinct()
            .groupBy("doc_id").agg(F.count("*").alias("n_weak")))
    return (strong.join(weak, "doc_id", "full_outer")
            .select("doc_id",
                    F.coalesce("n_strong", F.lit(0)).alias("n_strong"),
                    F.coalesce("n_weak", F.lit(0)).alias("n_weak")))


def q_segmentation_readers(spark, sf_dir):
    """S5 Wiki727 + S6 Choi + S7 MultiSeg readers, one probe: per doc each
    source format is synthesized from the document's words and parsed by
    its real reader inside a pandas UDF; unified output
    (source, doc_id, n_segments, last_text):

    - wiki727: 3 sections in '========,<level>,<heading>.' format
    - choi: 3 '==========' separated segments
    - multiseg: 3 pre-tokenized lines + a label covering lines 0-0 and
      2-2 ONLY — the uncovered middle line must be dropped (MultiSegReader
      line-range semantics), yielding 2 sections"""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n_sections long, last_text string")
    def wiki727_udf(texts: pd.Series) -> pd.DataFrame:
        from texoo_spark.readers import read_wiki727
        ns, lt = [], []
        for t in texts:
            secs = read_wiki727(t, section_level=2)
            ns.append(len(secs))
            lt.append(secs[-1]["text"].strip() if secs else "")
        return pd.DataFrame({"n_sections": ns, "last_text": lt})

    @pandas_udf("n_sections long, last_text string")
    def choi_udf(texts: pd.Series) -> pd.DataFrame:
        from texoo_spark.readers import read_choi
        ns, ls = [], []
        for t in texts:
            segs = read_choi(t)
            ns.append(len(segs))
            ls.append(segs[-1] if segs else "")
        return pd.DataFrame({"n_sections": ns, "last_text": ls})

    @pandas_udf("n_sections long, last_text string")
    def multiseg_udf(texts: pd.Series) -> pd.DataFrame:
        from texoo_spark.readers import read_multiseg
        label = "t 0::0-0 0::2-2"
        ns, ls = [], []
        for t in texts:
            secs = read_multiseg(t, label, 0)
            ns.append(len(secs))
            ls.append(secs[-1]["sentences"][-1] if secs else "")
        return pd.DataFrame({"n_sections": ns, "last_text": ls})

    docs = _load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    seg1 = F.array_join(F.slice(words, 1, 5), " ")
    seg2 = F.array_join(F.slice(words, 6, 5), " ")
    seg3 = F.array_join(F.slice(words, 11, F.size(words) - 10), " ")
    wiki_text = F.concat(
        F.lit("========,1,Intro.\n"), seg1, F.lit("\n"),
        F.lit("========,2,Details.\n"), seg2, F.lit("\n"),
        F.lit("========,2,More.\n"), seg3, F.lit("\n"))
    choi_text = F.concat(
        F.lit("==========\n"), seg1, F.lit("\n==========\n"),
        seg2, F.lit("\n==========\n"), seg3)
    multiseg_text = F.concat(seg1, F.lit("\n"), seg2, F.lit("\n"), seg3)
    base = docs.filter(F.size(words) >= 12)

    def lane(source: str, udf_col) -> DataFrame:
        return (base.withColumn("w", udf_col)
                .select(F.lit(source).alias("source"), "doc_id",
                        F.col("w.n_sections").alias("n_segments"),
                        F.col("w.last_text").alias("last_text")))

    return (lane("wiki727", wiki727_udf(wiki_text))
            .unionByName(lane("choi", choi_udf(choi_text)))
            .unionByName(lane("multiseg", multiseg_udf(multiseg_text))))


def _conll_part(spark, sf_dir):
    """S3 CoNLL reader, distributed: per doc, token-per-line CoNLL text
    with a B-PER/I-PER/O tag cycle is parsed by read_conll inside a pandas
    UDF; mention count = one per B tag = ceil(n_words / 3)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def mention_count_udf(texts: pd.Series) -> pd.Series:
        from texoo_spark.readers import read_conll
        tags = ["B-PER", "I-PER", "O"]
        out = []
        for t in texts:
            lines = [f"{w}\t{tags[i % 3]}"
                     for i, w in enumerate((t or "").split(" "))]
            docs = read_conll(lines)
            out.append(sum(len(d["mentions"]) for d in docs))
        return pd.Series(out)

    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", mention_count_udf(F.col("text")).alias("n_mentions"))


def q_mention_readers(spark, sf_dir):
    """S3 CoNLL + S9 WNED-XML mention readers, one probe: both real
    parsers run per doc and their outputs join on doc_id
    (conll_mentions / wned_mentions counts + WNED first-mention fields)."""
    conll = (_conll_part(spark, sf_dir)
             .select("doc_id", F.col("n_mentions").alias("conll_mentions")))
    wned = (_wned_part(spark, sf_dir)
            .select("doc_id", F.col("n_mentions").alias("wned_mentions"),
                    "first_surface", "first_length"))
    return conll.join(wned, "doc_id")


def _wikisection_part(spark, sf_dir):
    """S4 WikiSection JSON reader, distributed: per doc, a JSON document
    with two GOLD SectionAnnotations (built with to_json, parsed with
    read_wikisection in a pandas UDF); returns section count, first
    heading, and the end offset of the last section."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n_sections long, first_heading string, last_end long")
    def parse_udf(jsons: pd.Series) -> pd.DataFrame:
        from texoo_spark.readers import read_wikisection
        ns, fh, le = [], [], []
        for j in jsons:
            doc = read_wikisection(j)[0]
            secs = doc["sections"]
            ns.append(len(secs))
            fh.append(secs[0]["heading"] if secs else "")
            le.append(secs[-1]["end"] if secs else 0)
        return pd.DataFrame({"n_sections": ns, "first_heading": fh,
                             "last_end": le})

    docs = _load(spark, sf_dir, "documents")
    n = F.length("text")
    payload = F.to_json(F.struct(
        F.col("doc_id").cast("string").alias("id"),
        F.lit("disease").alias("type"),
        F.lit("t").alias("title"),
        F.col("text").alias("text"),
        F.array(
            F.struct(F.lit(0).alias("begin"), F.lit(20).alias("length"),
                     F.lit("Intro").alias("sectionHeading"),
                     F.lit("intro").alias("sectionLabel")),
            F.struct(F.lit(20).alias("begin"), (n - 20).alias("length"),
                     F.lit("Body").alias("sectionHeading"),
                     F.lit("body").alias("sectionLabel")),
        ).alias("annotations")))
    return (docs.filter(n > 20)
            .withColumn("w", parse_udf(payload))
            .select("doc_id", F.col("w.n_sections").alias("n_sections"),
                    F.col("w.first_heading").alias("first_heading"),
                    F.col("w.last_end").alias("last_end")))


def _wikicities_part(spark, sf_dir):
    """S8 WikiCities reader, distributed: per doc, 4 dataset lines (2
    TOP-LEVEL + 2 unheaded) parsed twice — with and without
    skipTopLevelSegment — returning both section counts and the unheaded
    section's assembled ' .'-joined text."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n_skip long, n_keep long, body_text string")
    def parse_udf(l1: pd.Series, l2: pd.Series, l3: pd.Series,
                  l4: pd.Series) -> pd.DataFrame:
        from texoo_spark.readers import read_wikicities
        ns, nk, bt = [], [], []
        for a, b, c, d in zip(l1, l2, l3, l4):
            lines = [a, b, c, d]
            skip = read_wikicities(lines, skip_top_level=True)
            keep = read_wikicities(lines, skip_top_level=False)
            ns.append(sum(len(x["sections"]) for x in skip))
            nk.append(sum(len(x["sections"]) for x in keep))
            bt.append(skip[0]["sections"][-1]["text"] if skip else "")
        return pd.DataFrame({"n_skip": ns, "n_keep": nk, "body_text": bt})

    docs = _load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    j = lambda a, n: F.array_join(F.slice(words, a, n), " ")  # noqa: E731
    line = lambda sno, head, body: F.concat(  # noqa: E731
        F.col("doc_id").cast("string"), F.lit(f",{sno},{head}"), body)
    return (docs.filter(F.size(words) >= 12)
            .withColumn("w", parse_udf(
                line(1, "TOP-LEVEL SEGMENT", j(1, 3)),
                line(2, "TOP-LEVEL SEGMENT", j(4, 3)),
                line(3, "", j(7, 3)),
                line(4, "", j(10, 3))))
            .select("doc_id", F.col("w.n_skip").alias("n_skip"),
                    F.col("w.n_keep").alias("n_keep"),
                    F.col("w.body_text").alias("body_text")))


def q_wiki_readers(spark, sf_dir):
    """S4 WikiSection + S8 WikiCities readers, one probe: both real
    parsers run per doc (JSON annotations / dataset-line format) and
    their per-doc outputs are joined on doc_id — one wide row per doc
    that passes both synthesizers' length gates."""
    return (_wikisection_part(spark, sf_dir)
            .join(_wikicities_part(spark, sf_dir), "doc_id"))


def _wned_part(spark, sf_dir):
    """S9 WNED XML reader, distributed: per doc, a 2-annotation WNED XML
    is parsed by read_wned_annotations inside a pandas UDF."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n_mentions long, first_surface string, first_length long")
    def parse_udf(xmls: pd.Series) -> pd.DataFrame:
        from texoo_spark.readers import read_wned_annotations
        nm, fs, fl = [], [], []
        for x in xmls:
            doc = read_wned_annotations(x)[0]
            ms = doc["mentions"]
            nm.append(len(ms))
            fs.append(ms[0]["surface"] if ms else "")
            fl.append(ms[0]["length"] if ms else 0)
        return pd.DataFrame({"n_mentions": nm, "first_surface": fs,
                             "first_length": fl})

    docs = _load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    w1, w2 = F.element_at(words, 1), F.element_at(words, 2)
    xml = F.concat(
        F.lit('<dataset><document docName="d'),
        F.col("doc_id").cast("string"), F.lit('">'),
        F.lit("<annotation><mention>"), w1, F.lit("</mention>"),
        F.lit("<wikiName>W1</wikiName><offset>0</offset><length>"),
        F.length(w1).cast("string"), F.lit("</length></annotation>"),
        F.lit("<annotation><mention>"), w2, F.lit("</mention>"),
        F.lit("<wikiName>W2</wikiName><offset>"),
        (F.length(w1) + 1).cast("string"), F.lit("</offset><length>"),
        F.length(w2).cast("string"), F.lit("</length></annotation>"),
        F.lit("</document></dataset>"))
    return (docs.filter(F.size(words) >= 2)
            .withColumn("w", parse_udf(xml))
            .select("doc_id", F.col("w.n_mentions").alias("n_mentions"),
                    F.col("w.first_surface").alias("first_surface"),
                    F.col("w.first_length").alias("first_length")))


def q_tokenized_roundtrip(spark, sf_dir):
    """T4 createTokensFromTokenizedText + E2 LetterNGramEncoder in one
    per-doc probe: offsets rebuilt from pre-tokenized input (reconstruction
    must round-trip exactly) plus the padded char-trigram count of the
    first word ('#w#' windows; equals len(word) for len >= 1)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("recon string, n_tokens long, n_trigrams long")
    def rt_udf(texts: pd.Series) -> pd.DataFrame:
        from texoo_spark.encoders import LetterNGramEncoder
        from texoo_spark.textops import document_from_tokenized_text
        enc = LetterNGramEncoder(n=3)
        recon, nt, tg = [], [], []
        for t in texts:
            doc = document_from_tokenized_text(t or "")
            recon.append(doc.text)
            nt.append(len(doc.tokens))
            first = (t or "").split(" ")[0] if t else ""
            tg.append(len(enc.ngrams(first)))
        return pd.DataFrame({"recon": recon, "n_tokens": nt,
                             "n_trigrams": tg})

    docs = _load(spark, sf_dir, "documents")
    return (docs.withColumn("w", rt_udf(F.col("text")))
            .select("doc_id", F.col("w.recon").alias("recon"),
                    F.col("w.n_tokens").alias("n_tokens"),
                    F.col("w.n_trigrams").alias("n_trigrams")))


def q_normalized_text(spark, sf_dir):
    """T8 normalizer chain + T9 MinimalLowercasePreprocessor in one
    per-doc projection: replaceDashes -> replaceNumbers -> replaceSpaces
    on text + '-' + doc_id (WordHelpers.java:171-203), and the
    minimal-lowercase normalization key of the initcap'd first word with
    the doc id appended (digit runs -> '#', lowercase)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def norm_udf(texts: pd.Series) -> pd.Series:
        from texoo_spark.textops import (replace_dashes, replace_numbers,
                                         replace_spaces)
        return pd.Series([
            replace_spaces(replace_numbers(
                replace_dashes(t or "", " "), "#"), "_")
            for t in texts])

    @pandas_udf(StringType())
    def key_udf(words: pd.Series) -> pd.Series:
        from texoo_spark.textops import minimal_lowercase
        return pd.Series([minimal_lowercase(w or "") for w in words])

    docs = _load(spark, sf_dir, "documents")
    raw = F.concat(F.col("text"), F.lit("-"),
                   F.col("doc_id").cast("string"))
    w1 = F.element_at(F.split(F.col("text"), " "), 1)
    key_raw = F.concat(F.initcap(w1), F.col("doc_id").cast("string"))
    return docs.select("doc_id", norm_udf(raw).alias("norm_text"),
                       key_udf(key_raw).alias("norm_key"))


def q_bow_vocab(spark, sf_dir):
    """E1 BagOfWordsEncoder vocabulary construction, distributed: corpus
    term frequencies with min length 2, min frequency 5, stopword filter
    (the CountVectorizer-shaped plan: explode -> filter -> groupBy)."""
    docs = _load(spark, sf_dir, "documents")
    return (docs
            .select(F.explode(F.split(F.lower(F.col("text")), " "))
                    .alias("word"))
            .filter((F.length("word") >= 2) & ~F.col("word").isin(*STOPLIST))
            .groupBy("word").agg(F.count("*").alias("freq"))
            .filter(F.col("freq") >= 5))


def q_classification_prf(spark, sf_dir):
    """V5 classification report, distributed: per-class P/R/F1 + support
    for gold = label, pred = 1-shifted label over the embeddings table
    (ClassificationEvaluation counters as groupBy aggregations)."""
    emb = _load(spark, sf_dir, "embeddings")
    w = Window.orderBy("vec_id")
    pairs = (emb.select("vec_id", F.col("label").alias("gold"))
             .withColumn("pred", F.coalesce(F.lag("gold", 1).over(w),
                                            F.col("gold"))))
    tp = (pairs.filter(F.col("gold") == F.col("pred"))
          .groupBy(F.col("gold").alias("label"))
          .agg(F.count("*").alias("tp")))
    fp = (pairs.filter(F.col("gold") != F.col("pred"))
          .groupBy(F.col("pred").alias("label"))
          .agg(F.count("*").alias("fp")))
    fn = (pairs.filter(F.col("gold") != F.col("pred"))
          .groupBy(F.col("gold").alias("label"))
          .agg(F.count("*").alias("fn")))
    labels = pairs.select(F.col("gold").alias("label")).union(
        pairs.select(F.col("pred").alias("label"))).distinct()
    j = (labels.join(tp, "label", "left").join(fp, "label", "left")
         .join(fn, "label", "left").fillna(0, ["tp", "fp", "fn"]))
    p = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    r = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return j.select("label", "tp", "fp", "fn",
                    F.round(p, 6).alias("precision"),
                    F.round(r, 6).alias("recall"),
                    F.round(f1, 6).alias("f1"),
                    (F.col("tp") + F.col("fn")).alias("support"))


def q_max_segments(spark, sf_dir):
    """A8 MAX segmentation (applySectionsFromTargetLabels) + A12 segment
    labeling (attachVectorsToAnnotations), TWO oracled lanes:

    - lane 'embhot' (one doc per embeddings label group via
      applyInPandas): per-sentence predictions are one-hot at
      1 + argmax(|embedding|) (index 0 reserved as the stable tie-filler
      so the running-mean hysteresis never sticks), which makes both
      operators' outputs exactly predictable by the SQL oracle — segment
      = run of equal hot labels; the attached label is the run's hot
      index, the heading its top-2 neighbours 'hot/0', confidence
      exactly 1.0 — while the full running-mean/top-k machinery of
      segments_from_target_labels AND the mean/normalize/cosine/argsort
      machinery of attach_segment_labels still execute.
    - lane 'sector' (A6's TRAINED model under VALUE verification, round
      5): the frozen bundled SECTOR npz is broadcast, each fixture doc's
      forward pass runs IN AN EXECUTOR (applyInPandas), the per-sentence
      argmax labels are one-hot-ified at 1 + argmax (same index-0
      reservation), and the identical A8+A12 machinery runs over them.
      The oracle bakes the frozen model's per-sentence argmax labels as
      a VALUES literal (computed once, driver-side, from the same npz —
      the SRP-planes/profile-weights pattern) and replays the runs in
      SQL: any drift in the distributed forward, the segmentation, or
      the attach outputs breaks the value hash. BEMD stays rows-only in
      bemd_segments (PCA + gaussian are genuinely non-SQL); the trained
      model's SEGMENTATION DECISIONS are now value-pinned here."""
    import numpy as np
    from texoo_spark.segment import (attach_segment_labels,
                                     segments_from_target_labels)
    emb = _load(spark, sf_dir, "embeddings")

    def _onehot_rows(lane, label, hot, n_labels):
        preds = np.zeros((len(hot), n_labels))
        preds[np.arange(len(hot)), hot] = 1.0
        segs = segments_from_target_labels(preds, np.eye(n_labels))
        att = attach_segment_labels(preds, segs, np.eye(n_labels),
                                    [str(i) for i in range(n_labels)])
        return pd.DataFrame({
            "lane": lane,
            "label": label,
            "seg_idx": range(len(att)),
            "sent_begin": [a["sent_begin"] for a in att],
            "sent_end": [a["sent_end"] for a in att],
            "seg_label": [a["label"] for a in att],
            "heading": [a["heading"] for a in att],
            "confidence": [a["confidence"] for a in att],
        })

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        mat = np.array([np.asarray(v, dtype=np.float64)
                        for v in pdf["embedding"]])
        hot = np.abs(mat).argmax(axis=1) + 1
        return _onehot_rows("embhot", pdf["label"].iloc[0], hot,
                            mat.shape[1] + 2)

    schema = ("lane string, label int, seg_idx long, sent_begin long,"
              " sent_end long, seg_label string, heading string,"
              " confidence double")
    embhot_lane = emb.groupBy("label").applyInPandas(run, schema)

    from texoo_spark.sector import (fixture_documents, model_from_state,
                                    train_fixture_sector)
    state_bc = spark.sparkContext.broadcast(train_fixture_sector().state())
    sents_rows = [(d, i, s)
                  for d, (sents, _) in enumerate(fixture_documents())
                  for i, s in enumerate(sents)]
    sdf = spark.createDataFrame(sents_rows, "doc int, sent_idx int,"
                                            " sentence string")

    def run_sector(pdf: pd.DataFrame) -> pd.DataFrame:
        from texoo_spark.sentemb import sentence_embedding_batch
        pdf = pdf.sort_values("sent_idx")
        model = model_from_state(state_bc.value)
        X = sentence_embedding_batch(list(pdf["sentence"]), model.d_in)
        probs = model.forward(X)[0]
        hot = probs.argmax(axis=1) + 1
        # labels offset by 1000 so the lane never collides with an
        # embeddings label in a sorted compare
        return _onehot_rows("sector", 1000 + int(pdf["doc"].iloc[0]),
                            hot, model.K + 2)

    sector_lane = sdf.groupBy("doc").applyInPandas(run_sector, schema)
    return embhot_lane.unionByName(sector_lane)


def q_serializer_roundtrip(spark, sf_dir):
    """S10 Document-JSON sink/source round trip + S1/S2 raw-text directory
    reader in one probe: every doc goes extraction -> Document JSON rows ->
    write json -> fixed-schema read back (id, end); docs < 10 are also
    written as one UTF-8 file each and read back via spark.read.text
    (wholetext) with filename provenance (n_chars; NULL for docs >= 10)."""
    import tempfile
    from texoo_spark.readers import read_raw_text_documents
    from texoo_spark.serializer import (extracted_to_documents,
                                        read_documents_json,
                                        write_documents_json)
    docs = (_extracted_docs_lean(spark, sf_dir)
            .select(F.col("doc_id").cast("string").alias("conv_id"),
                    F.lit(0).alias("turn_idx"),
                    F.lit("user").alias("role"),
                    "extracted_text", "sent_begin", "sent_end"))
    path = tempfile.mkdtemp(prefix="texoo_json_") + "/docs"
    write_documents_json(extracted_to_documents(docs), path)
    back = read_documents_json(spark, path)
    ser = back.select("id", F.col("end").cast("long").alias("end"))

    raw_rows = (_load(spark, sf_dir, "documents")
                .filter(F.col("doc_id") < 10)
                .select("doc_id", "text").collect())
    d = tempfile.mkdtemp(prefix="texoo_raw_")
    for r in raw_rows:
        with open(os.path.join(d, f"doc_{r.doc_id:04d}.txt"), "w") as f:
            f.write(r.text)
    raw_df = read_raw_text_documents(spark, os.path.join(d, "*.txt"))
    raw_id = F.regexp_extract(F.col("source"), r"doc_(\d+)\.txt", 1) \
        .cast("long")
    raw = raw_df.select(
        F.concat(raw_id.cast("string"), F.lit("#0")).alias("id"),
        F.length("text").cast("long").alias("n_chars"))
    return ser.join(raw, "id", "left")


def q_bio_decode(spark, sf_dir):
    """A4/A5: BIO2 span decode + BIOES conversion validity, per doc over a
    B,I,O tag cycle (one span per B tag; converted BIOES must be valid)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n_spans long, bioes_valid boolean")
    def decode_udf(counts: pd.Series) -> pd.DataFrame:
        from texoo_spark.spans import (bio2_to_bioes, bioes_is_correct,
                                       decode_bio2)
        ns, ok = [], []
        for n in counts:
            tags = [["B", "I", "O"][i % 3] for i in range(int(n))]
            ns.append(len(decode_bio2(tags, None, None)))
            ok.append(bioes_is_correct(bio2_to_bioes(tags)))
        return pd.DataFrame({"n_spans": ns, "bioes_valid": ok})

    docs = _load(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    return (docs.withColumn("w", decode_udf(n_words))
            .select("doc_id", F.col("w.n_spans").alias("n_spans"),
                    F.col("w.bioes_valid").alias("bioes_valid")))


# --- rows-only queries (non-SQL-expressible; pytest-gated semantics) ---


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup via sign-random-projection LSH: every
    vector paired with a perturbed copy must be rediscovered."""
    from texoo_spark.dedup import embedding_near_dups
    emb = _load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    noised = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.0001).alias("embedding"))
    both = emb.select("vec_id", "embedding").unionByName(noised)
    return (embedding_near_dups(both, min_cosine=0.999, dims=64)
            .filter(F.col("id_b") - F.col("id_a") == 1_000_000)
            .select("id_a", "id_b"))

def q_minhash_near_dups(spark, sf_dir):
    """MinHash+LSH near-dup detection: pair each doc with a mutated copy
    (last 2 words dropped); the pipeline must rediscover the pairs."""
    from texoo_spark.dedup import minhash_lsh_candidates
    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    words = F.split(F.col("text"), " ")
    mutated = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(F.slice(words, 1, F.greatest(F.size(words) - 2, F.lit(1))),
                     " ").alias("text"))
    both = docs.select("doc_id", "text").unionByName(mutated)
    cands = minhash_lsh_candidates(both, num_hashes=64, bands=16)
    return (cands.filter(F.col("id_b") - F.col("id_a") == 1_000_000)
            .orderBy("id_a"))


def q_simhash_near_dups(spark, sf_dir):
    from texoo_spark.dedup import simhash_candidates
    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    words = F.split(F.col("text"), " ")
    mutated = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(1))),
                     " ").alias("text"))
    both = docs.select("doc_id", "text").unionByName(mutated)
    return (simhash_candidates(both, max_hamming=3)
            .filter(F.col("id_b") - F.col("id_a") == 1_000_000)
            .orderBy("id_a"))


def q_ivf_knn(spark, sf_dir):
    """IVF-bucketed approximate nearest neighbours (scale path for kNN):
    deterministic stride-seeded cells, float64 assignment, probe the 4
    nearest of 8 cells, rounded-cosine ranking (cross-engine exact)."""
    from texoo_spark.knn import ivf_assign, ivf_topk
    emb = (_load(spark, sf_dir, "embeddings")
           .withColumn("emb_d", F.col("embedding").cast("array<double>")))
    with_cells, cents = ivf_assign(emb, n_cells=8, vec_col="emb_d")
    query = emb.filter(F.col("vec_id") == 0).select("emb_d").collect()[0][0]
    return ivf_topk(with_cells, cents, list(query), k=10, probes=4,
                    vec_col="emb_d", round_decimals=6)


def q_tagged_mentions_neural(spark, sf_dir):
    """A2 reference-architecture neural lane: the POS|SUR|TRI (24,680-dim,
    shipped trigram.tsv.gz vocab) -> Dense(300) -> Dense(300) ->
    Graves-BiLSTM(100, ADD) -> softmax(5 BIOES) network from the bundled
    annotator.xml, trained deterministically on the reference CoNLL
    fixture (weights file not shipped — trained-from-fixture is the
    hermetic ceiling; span F1 1.0 pinned in tests/test_bilstm.py).
    Rows-only: a recurrent forward pass is not SQL-expressible; exact
    semantics are pytest-gated (architecture shapes, fixture goldens,
    V1 span-F1 under MentionAnnotatorEvaluation STRONG matching)."""
    from texoo_spark.bilstm import tag_mentions_neural
    from texoo_spark.extract import extract_discard_udf
    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    words = F.split(F.col("text"), " ")
    text2 = F.concat(
        F.initcap(F.array_join(F.slice(words, 1, 3), " ")), F.lit(" "),
        F.array_join(F.slice(words, 4, F.greatest(F.size(words) - 3,
                                                  F.lit(1))), " "))
    extracted = (docs.withColumn("doc", extract_discard_udf(text2))
                 .select("doc_id", "doc.*"))
    tagged = tag_mentions_neural(extracted)
    return (tagged.select("doc_id",
                          F.size("m_begin").cast("long").alias("n_mentions"))
            .orderBy("doc_id"))


def q_bemd_segments(spark, sf_dir):
    """A6/A9-A11 segmentation, TWO lanes (rows-only: PCA + gaussian
    smoothing + a recurrent forward are genuinely non-SQL):

    - lane 'emd': embedding-deviation segmentation over the embeddings
      table, one document per label group — groupBy(label).applyInPandas
      keeps every group on one executor while groups distribute across
      the cluster (the scale-correct shape — never a coalesce(1)).
    - lane 'sector:max' / 'sector:bemd_fixed': the TRAINED SECTOR lane
      (sector.py — SectorAnnotator.annotate(docs, method) end to end):
      deterministic fixture-trained sentence BiLSTM broadcast to
      executors, per-document forward passes in applyInPandas, MAX
      segmentation over the model's predictions and BEMD_FIXED over its
      OWN fw/bw hidden-state matrices (the vectors SectorTagger
      attachVectors exposes), with per-segment topic labels from the
      mean prediction (attachVectorsToAnnotations)."""
    import numpy as np
    from texoo_spark.sector import fixture_documents, \
        sector_segment_document, train_fixture_sector
    from texoo_spark.segment import segment_emd
    emb = _load(spark, sf_dir, "embeddings")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        mat = np.array([np.asarray(v, dtype=np.float32)
                        for v in pdf["embedding"]])
        segs = segment_emd(mat)
        return pd.DataFrame({
            "lane": "emd",
            "label": pdf["label"].iloc[0],
            "seg_idx": range(len(segs)),
            "sent_begin": [s for s, _ in segs],
            "sent_end": [e for _, e in segs],
            "seg_label": [-1] * len(segs)})

    schema = ("lane string, label int, seg_idx long, sent_begin long,"
              " sent_end long, seg_label int")
    emd_lane = emb.groupBy("label").applyInPandas(run, schema)

    state_bc = spark.sparkContext.broadcast(train_fixture_sector().state())
    sents_rows = [(d, i, s)
                  for d, (sents, _) in enumerate(fixture_documents())
                  for i, s in enumerate(sents)]
    sdf = spark.createDataFrame(sents_rows, "doc int, sent_idx int,"
                                            " sentence string")

    def run_sector(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sent_idx")
        sents = list(pdf["sentence"])
        out = []
        for method, fc in [("max", None), ("bemd_fixed", 3)]:
            segs, seg_labels, _ = sector_segment_document(
                state_bc.value, sents, method, fc)
            for i, ((b, e), sl) in enumerate(zip(segs, seg_labels)):
                out.append(dict(lane=f"sector:{method}",
                                label=int(pdf["doc"].iloc[0]),
                                seg_idx=i, sent_begin=b, sent_end=e,
                                seg_label=sl))
        return pd.DataFrame(out, columns=["lane", "label", "seg_idx",
                                          "sent_begin", "sent_end",
                                          "seg_label"])

    sector_lane = sdf.groupBy("doc").applyInPandas(run_sector, schema)
    return emd_lane.unionByName(sector_lane)


def q_passage_retrieval(spark, sf_dir):
    """SURVEY §3.3 QueryRunner lifecycle end-to-end: passages (each doc's
    first-5-word sentence) and queries (docs < 5, words 6-10) embedded by
    the sentemb producer, cosine-scored via a broadcast query join with
    JVM-side zip_with/aggregate, window top-5 per query."""
    from texoo_spark.knn import cosine_topk_join
    from texoo_spark.sentemb import embed_sentences
    docs = _load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    passages = embed_sentences(
        docs.select("doc_id",
                    F.array_join(F.slice(words, 1, 5), " ")
                    .alias("sentence")))
    queries = embed_sentences(
        docs.filter(F.col("doc_id") < 5)
        .select(F.col("doc_id").alias("query_id"),
                F.array_join(F.slice(words, 6, 5), " ").alias("sentence")))
    return (cosine_topk_join(passages, queries, k=5)
            .select(F.col("query_id").cast("long").alias("query_id"),
                    F.col("rank").cast("long").alias("rank"),
                    F.col("doc_id").cast("long").alias("doc_id"),
                    "cosine"))


def q_contamination(spark, sf_dir):
    """Benchmark-contamination sweep: docs < 400 are 'train'; docs >= 400
    become 'test' with their first 12 words replaced by train doc
    (doc_id - 400)'s first 12 words — every test doc must surface with at
    least the 5 planted 8-word windows (plus any natural overlap)."""
    from texoo_spark.dedup import ngram_contamination
    docs = _load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    train = docs.filter(F.col("doc_id") < 400).select("doc_id", "text")
    src = (docs.filter(F.col("doc_id") < 100)
           .select((F.col("doc_id") + 400).alias("doc_id2"),
                   F.array_join(F.slice(words, 1, 12), " ").alias("prefix")))
    tail_words = F.split(F.col("text"), " ")
    test = (docs.filter(F.col("doc_id") >= 400)
            .join(src, F.col("doc_id") == F.col("doc_id2"))
            .select("doc_id",
                    F.concat(F.col("prefix"), F.lit(" "),
                             F.array_join(
                                 F.slice(tail_words, 13,
                                         F.greatest(F.size(tail_words) - 12,
                                                    F.lit(1))), " "))
                    .alias("text")))
    return ngram_contamination(train, test, n=8)


def q_unigram_surprisal(spark, sf_dir):
    """LM-free quality proxy: mean unigram surprisal per doc from
    corpus-derived word statistics."""
    from texoo_spark.curate import unigram_surprisal
    docs = _load(spark, sf_dir, "documents")
    return (unigram_surprisal(docs)
            .select(F.col("id").alias("doc_id"), "mean_surprisal",
                    "n_words"))


def q_sentence_embeddings(spark, sf_dir):
    """Sentence-embedding producer feeding the SECTOR segmentation lanes
    (SectorTagger sentence vectors stand-in): trigram-hash counts bucketed
    by FNV mod 64, L2-normalized; first 4 components oracled exactly."""
    from texoo_spark.sentemb import embed_sentences
    docs = _load(spark, sf_dir, "documents")
    sents = docs.select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 5), " ")
        .alias("sentence"))
    emb = embed_sentences(sents)
    return emb.select(
        "doc_id",
        *[F.round(F.element_at("embedding", j + 1), 6).alias(f"c{j}")
          for j in range(4)])


def q_curated_turns(spark, sf_dir):
    """Training-data curation funnel (extract -> quality -> exact dedup ->
    MinHash near dedup) over synthetic transcripts; returns survivors.
    Rows-only: the near-dup stage is LSH-based (oracle-able stages are
    covered individually by quality_scores / dedup_prefix)."""
    from texoo_spark import curate
    from texoo_spark.pipeline import with_part_id
    from texoo_spark.transcripts import transcripts_from_documents
    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    turns = with_part_id(transcripts_from_documents(docs), n_buckets=8)
    extracted = curate.extract_turns_arrow(
        turns.sortWithinPartitions("conv_id", "turn_idx"))
    curated = curate.drop_near_dupes(
        curate.drop_exact_dupes(curate.quality_filter(extracted)))
    return (curated.select("conv_id", "turn_idx")
            .orderBy("conv_id", "turn_idx"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry kept at <= 50 entries so the driver's 50-query sample
    value-verifies EVERY entry each round. Overlapping probes from rounds
    1-2 were merged (union/join of same-grain lanes) without dropping any
    operator lane — STATUS.md maps each SURVEY §2 operator to its query."""
    return {
        # extraction + text ops (both tokenizer lanes / both variants)
        "extract_tokens": q_extract_tokens,            # rule + maxent lanes
        "extract_newline_discard": q_extract_newline_discard,  # 2 variants
        "html_main_content": q_html_main_content,
        "gazetteer_matches": q_gazetteer_matches,
        "token_prf": q_token_prf,
        "tokenized_roundtrip": q_tokenized_roundtrip,  # + char trigrams
        "normalized_text": q_normalized_text,          # + minimal-lowercase
        "conv_rebase": q_conv_rebase,
        "conversation_text": q_conversation_text,
        # relational / TPC-H-ish
        "pricing_summary": q_pricing_summary,
        "top_order_per_customer": q_top_order_per_customer,
        "nation_revenue": q_nation_revenue,
        "events_hourly": q_events_hourly,
        "running_user_totals": q_running_user_totals,
        "train_test_split": q_train_test_split,
        # spans / annotators
        "tagged_mentions": q_tagged_mentions,          # + entity linking
        "tagged_mentions_trained": q_tagged_mentions_trained,
        # rows-only: recurrent BiLSTM forward is not SQL-expressible
        "tagged_mentions_neural": q_tagged_mentions_neural,
        "bio_decode": q_bio_decode,
        "span_matches": q_span_matches,                # STRONG + WEAK
        "tokens_in_range": q_tokens_in_range,          # + span_zip
        "max_overlap_token": q_max_overlap_token,
        "newline_segments": q_newline_segments,
        "max_segments": q_max_segments,
        # readers / serialization
        "segmentation_readers": q_segmentation_readers,  # wiki727/choi/mseg
        "wiki_readers": q_wiki_readers,        # wikisection + wikicities
        "mention_readers": q_mention_readers,  # conll + wned
        "serializer_roundtrip": q_serializer_roundtrip,  # + raw-text dir
        "pdf_layout": q_pdf_layout,
        "table_snapshots": q_table_snapshots,
        # encoders / metrics
        "bow_vocab": q_bow_vocab,
        "classification_prf": q_classification_prf,
        "segmentation_metrics": q_segmentation_metrics,  # Pk + WindowDiff
        "retrieval_mrr": q_retrieval_mrr,
        # dedup / curation
        "dedup_prefix": q_dedup_prefix,
        "quality_scores": q_quality_scores,  # + fingerprint + language id
        "ngram_jaccard_dups": q_ngram_jaccard,
        "minhash_near_dups": q_minhash_near_dups,
        "simhash_near_dups": q_simhash_near_dups,
        "embedding_near_dups": q_embedding_near_dups,
        "contamination": q_contamination,
        "unigram_surprisal": q_unigram_surprisal,
        "curated_turns": q_curated_turns,
        # retrieval / ANN
        "knn_cosine": q_knn_cosine,                    # single + batch lanes
        "ivf_knn": q_ivf_knn,
        "bm25_topk": q_bm25_topk,                      # scores + ranks
        "passage_retrieval": q_passage_retrieval,
        "sentence_embeddings": q_sentence_embeddings,
        # multimodal
        "media_features": q_media_features,            # + frame sampling
        # rows-only (genuinely non-SQL-expressible: PCA + gaussian smoothing)
        "bemd_segments": q_bemd_segments,
    }


# ---------------------------------------------------------------------------
# oracle SQL builders for the hash-based operators (FNV-1a / Karp-Rabin /
# Mersenne-61 universal hashing / SimHash replicated in pure DuckDB SQL so
# the near-dup lanes get full value-level oracles)
# ---------------------------------------------------------------------------

# FNV-1a over the UTF-8 BYTES of the string (not code points — Python's
# fnv1a64 hashes s.encode('utf-8'), so the SQL twin reads bytes through
# hex(encode(s)): two hex chars per byte).
_SQL_FNV = ("list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), "
            "list_transform(range(0, octet_length(encode({s}))), ci -> "
            "(strpos('0123456789ABCDEF', hex(encode({s}))[ci * 2 + 1]) - 1)"
            " * 16 + strpos('0123456789ABCDEF', hex(encode({s}))[ci * 2 + 2])"
            " - 1)), (fh, fb) -> (xor(fh, fb) * 1099511628211)"
            " % 18446744073709551616)")

_SQL_POW2 = "[" + ", ".join(f"{1 << i}::HUGEINT" for i in range(64)) + "]"


def _sql_word_hashes(words_col: str) -> str:
    """FNV-1a hash of every word in a list column (HUGEINT list)."""
    return (f"list_transform({words_col}, wq -> "
            + _SQL_FNV.format(s="wq") + ")")


def _sql_shingles(wh_col: str, k: int = 5) -> str:
    """Karp-Rabin k-shingle hashes over a word-hash list column: the same
    spec as dedup._shingle_hashes (sum_j W[i+j] * P^(k-1-j) mod 2^64),
    with the mod-2^64 product done via a 32-bit split so HUGEINT never
    overflows. Assumes len >= k (true for the documents table, min 10
    words)."""
    prime = 1099511628211
    coefs = [pow(prime, k - 1 - j, 1 << 64) for j in range(k)]
    terms = " + ".join(
        f"(({wh_col}[si + {j}] // 4294967296 * {c} % 4294967296)"
        f" * 4294967296 + ({wh_col}[si + {j}] % 4294967296) * {c})"
        for j, c in enumerate(coefs))
    return (f"list_transform(range(1, len({wh_col}) - {k - 2}), si -> "
            f"({terms}) % 18446744073709551616)")


def _sql_minhash_sig(sh_col: str, num_hashes: int = 64) -> str:
    """64-permutation MinHash signature of a shingle-hash list column,
    (a*x + b) mod 2^61-1 with the deterministic RandomState(42) params."""
    from texoo_spark.dedup import _hash_params
    a, b = _hash_params(num_hashes)
    pairs = ", ".join(
        "{'pa': %d::HUGEINT, 'pb': %d::HUGEINT}" % (ai, bi)
        for ai, bi in zip(a.tolist(), b.tolist()))
    return (f"list_transform([{pairs}], pp -> "
            f"list_min(list_transform({sh_col}, sx -> "
            f"(pp.pa * (sx % 2305843009213693951) + pp.pb)"
            f" % 2305843009213693951)))")


def _sql_bands_share(sig_a: str, sig_b: str, bands: int = 16,
                     rows: int = 4) -> str:
    return (f"len(list_filter(range(0, {bands}), bb -> "
            f"{sig_a}[bb * {rows} + 1 : bb * {rows} + {rows}] = "
            f"{sig_b}[bb * {rows} + 1 : bb * {rows} + {rows}])) > 0")


def _sql_simhash(wh_col: str) -> str:
    """64-bit SimHash of a word-hash list column (majority vote per bit)."""
    return (f"list_sum(list_transform(range(0, 64), bi -> "
            f"CASE WHEN 2 * len(list_filter({wh_col}, hh -> "
            f"(hh // ({_SQL_POW2})[bi + 1]) % 2 = 1)) > len({wh_col}) "
            f"THEN ({_SQL_POW2})[bi + 1] ELSE 0::HUGEINT END))")


def _sql_hamming(sa: str, sb: str) -> str:
    return (f"len(list_filter(range(0, 64), bi -> "
            f"({sa} // ({_SQL_POW2})[bi + 1]) % 2 <> "
            f"({sb} // ({_SQL_POW2})[bi + 1]) % 2))")


def _sql_srp_planes(n_planes: int = 12, dims: int = 64,
                    seed: int = 42) -> str:
    """The sign-random-projection plane matrix as a DOUBLE[][] literal
    (same RandomState(seed) spec as dedup.embedding_near_dups)."""
    import numpy as np
    planes = np.random.RandomState(seed).randn(n_planes, dims)
    return "[" + ", ".join(
        "[" + ", ".join(repr(float(x)) for x in row) + "]"
        for row in planes) + "]"


def _tagged_trained_oracle() -> str:
    """The trained CoNLL tagger's forward pass + BIO2 span counting in SQL:
    per-class scores = bias + surface-pattern partial (tokens here are pure
    alphabetic, so only three surface patterns occur) + trigram-weight map
    lookups over the token's distinct padded trigrams; tag = argmax with
    numpy's first-index tie-break (O, B, I CASE order); span count follows
    decode_bio2 (B always starts; I starts only at doc start or after O)."""
    from texoo_spark.tagger import SURFACE_SIZE, train_conll_tagger
    tagger, enc = train_conll_tagger()
    w, b = tagger.weights, tagger.bias
    # surface partials for the three reachable patterns
    s_lower = w[1] + w[3]          # startsLower + allLower
    s_cap_multi = w[0]             # startsUpper
    s_cap_single = w[0] + w[2]     # startsUpper + allUpper
    tri = {g: w[SURFACE_SIZE + i] for g, i in enc.vocab.items()}
    # trigram weights as a VALUES relation + hash join: a MAP literal
    # inside a list_transform lambda is rebuilt on EVERY evaluation
    # (~100x slower, times out at sf0.1 — same lesson as the langid
    # oracle); a join against a one-time relation scales linearly.
    tw_rows = ", ".join(
        "('%s', CAST(%r AS DOUBLE), CAST(%r AS DOUBLE),"
        " CAST(%r AS DOUBLE))" % (g.replace("'", "''"), float(v[0]),
                                  float(v[1]), float(v[2]))
        for g, v in tri.items())

    def score(c: int, tsum: str) -> str:
        return (
            f"CAST({float(b[c])!r} AS DOUBLE)"
            f" + CASE WHEN regexp_matches(tok, '^[A-Z]') THEN"
            f" CASE WHEN length(tok) = 1 THEN"
            f" CAST({float(s_cap_single[c])!r} AS DOUBLE)"
            f" ELSE CAST({float(s_cap_multi[c])!r} AS DOUBLE) END"
            f" ELSE CAST({float(s_lower[c])!r} AS DOUBLE) END"
            f" + {tsum}")

    return (
        f"WITH tw (tg, w_o, w_b, w_i) AS (VALUES {tw_rows}),"
        " d AS (SELECT doc_id, string_split(text, ' ') AS w"
        " FROM documents WHERE regexp_matches(text, '^[a-z ]+$')),"
        " tk0 AS (SELECT doc_id, unnest(w) AS tok0,"
        " unnest(range(1, len(w) + 1)) AS ti FROM d),"
        # initcap semantics: first char uppered, REST lowered
        " tk AS (SELECT doc_id, ti, CASE WHEN ti <= 3 THEN"
        " upper(tok0[1:1]) || lower(tok0[2:]) ELSE tok0 END AS tok"
        " FROM tk0),"
        " tr AS (SELECT doc_id, ti, tok, list_distinct(list_transform("
        " range(1, length('#' || lower(tok) || '#') - 1),"
        " gi -> ('#' || lower(tok) || '#')[gi : gi + 2])) AS tris FROM tk),"
        # every padded token has >=1 trigram, so the per-trigram unnest
        # keeps every (doc_id, ti) group; unmatched trigrams contribute 0
        " trx AS (SELECT doc_id, ti, tok, unnest(tris) AS tg FROM tr),"
        " tsum AS (SELECT doc_id, ti, tok,"
        " COALESCE(SUM(tw.w_o), 0.0) AS t_o,"
        " COALESCE(SUM(tw.w_b), 0.0) AS t_b,"
        " COALESCE(SUM(tw.w_i), 0.0) AS t_i"
        " FROM trx LEFT JOIN tw USING (tg)"
        " GROUP BY doc_id, ti, tok),"
        f" sc AS (SELECT doc_id, ti, {score(0, 't_o')} AS s_o,"
        f" {score(1, 't_b')} AS s_b, {score(2, 't_i')} AS s_i FROM tsum),"
        " tg AS (SELECT doc_id, ti, CASE WHEN s_o >= s_b AND s_o >= s_i"
        " THEN 'O' WHEN s_b >= s_i THEN 'B' ELSE 'I' END AS tag FROM sc),"
        " sp AS (SELECT doc_id, tag, LAG(tag) OVER (PARTITION BY doc_id"
        " ORDER BY ti) AS pt FROM tg)"
        " SELECT doc_id, CAST(SUM(CASE WHEN tag = 'B' OR (tag = 'I'"
        " AND (pt IS NULL OR pt = 'O')) THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_mentions FROM sp GROUP BY doc_id")


def _maybe_tagged_trained_oracle() -> dict[str, str]:
    import os as _os
    from texoo_spark.tagger import conll_fixture_path
    try:
        if not _os.path.exists(conll_fixture_path()):
            return {}
    except (FileNotFoundError, OSError):
        return {}
    return {"tagged_mentions_trained": _tagged_trained_oracle()}


def _detect_language_oracle() -> str:
    """langid.detect_language replicated in SQL: per-script-group n-gram
    profiles (Latin en..tr, Cyrillic ru/uk/bg, Arabic-script ar/fa) with
    INTEGER milli-nat trigram weights as VALUES relations, word
    segmentation over each group's shared explicit letter class, padded
    '#word#' trigram windows, per-language floor for unseen trigrams,
    script short-circuits (kana -> ja, hangul -> ko, han -> zh,
    greek -> el, devanagari -> hi, in that order), script routing to the
    matching group's fixed-order argmax, and the exact integer
    evidence-floor comparison (best < FLOOR_MILLI * n_trigrams)."""
    from texoo_spark.langid import (EVIDENCE_FLOOR_MILLI, GROUPS,
                                    MAX_WORDS, SCRIPT_LANGS,
                                    _ARAB_LETTERS)

    ctes: list[str] = []
    group_case: dict[str, str] = {}
    for tag, (langs, profiles, floors, _, letters) in GROUPS.items():
        prof_rows = ", ".join(
            "('%s', '%s', %d)" % (lang, t.replace("'", "''"), v)
            for lang in langs for t, v in profiles[lang].items())
        floor_rows = ", ".join(
            "('%s', %d)" % (lang, floors[lang]) for lang in langs)
        pivots = ", ".join(
            f"MAX(CASE WHEN lang = '{lang}' THEN s END) AS s_{lang}"
            for lang in langs)
        # fixed-order argmax: lang i wins if >= every later language's
        # score (earlier languages already failed their own >= chain)
        argmax = ""
        for i, lang in enumerate(langs[:-1]):
            conds = " AND ".join(
                f"s_{lang} >= s_{o}" for o in langs[i + 1:])
            argmax += f" WHEN {conds} THEN '{lang}'"
        argmax += f" ELSE '{langs[-1]}'"
        best = "GREATEST(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
        ctes.append(
            f"w_{tag} AS (SELECT doc_id, text, list_filter("
            f"string_split_regex(lower(text), '[^{letters}]+'),"
            f" x -> x <> '')[1:{MAX_WORDS}] AS ws FROM documents),"
            f" g_{tag} AS (SELECT doc_id, text, flatten(list_transform(ws,"
            " wv -> list_transform(range(1, length('#' || wv || '#') - 1),"
            f" gi -> ('#' || wv || '#')[gi : gi + 2]))) AS tris FROM w_{tag}),"
            f" nn_{tag} AS (SELECT doc_id, text, len(tris) AS n FROM g_{tag}),"
            f" t_{tag} AS (SELECT doc_id, unnest(tris) AS tg FROM g_{tag}),"
            # profile weights as a relation (hash join beats a map literal
            # that DuckDB would rebuild inside every lambda evaluation)
            f" prof_{tag}(lang, tg, wt) AS (SELECT * FROM (VALUES {prof_rows})),"
            f" fl_{tag}(lang, fw) AS (SELECT * FROM (VALUES {floor_rows})),"
            f" x_{tag} AS (SELECT doc_id, f.lang, SUM(COALESCE(wt, fw)) AS s"
            f" FROM t_{tag} t CROSS JOIN fl_{tag} f"
            f" LEFT JOIN prof_{tag} p ON p.lang = f.lang AND p.tg = t.tg"
            " GROUP BY doc_id, f.lang),"
            f" piv_{tag} AS (SELECT doc_id, {pivots} FROM x_{tag}"
            " GROUP BY doc_id)")
        group_case[tag] = (
            f"(CASE WHEN nn_{tag}.n = 0 THEN ''"
            f" WHEN {best} < {EVIDENCE_FLOOR_MILLI} * nn_{tag}.n THEN ''"
            f"{argmax} END)")
    joins = " ".join(
        f"LEFT JOIN nn_{tag} ON nn_{tag}.doc_id = b.doc_id"
        f" LEFT JOIN piv_{tag} ON piv_{tag}.doc_id = b.doc_id"
        for tag in GROUPS)
    return (
        "WITH " + " , ".join(ctes) +
        " SELECT b.doc_id, CASE"
        " WHEN b.text IS NULL OR b.text = '' THEN ''"
        " WHEN regexp_matches(b.text, '[ぁ-ゟ゠-ヿ]') THEN 'ja'"
        " WHEN regexp_matches(b.text, '[가-힣ᄀ-ᇿ]') THEN 'ko'"
        " WHEN regexp_matches(b.text, '[一-鿿]') THEN 'zh'"
        " WHEN regexp_matches(b.text, '[Ά-ώἀ-ῼ]') THEN 'el'"
        # letters only (shared with langid._DEVANAGARI / _ARAB_ANY):
        # localized digits are never language evidence
        " WHEN regexp_matches(b.text, '[ऄ-ह]') THEN 'hi'"
        + "".join(f" WHEN regexp_matches(b.text, '[{rng}]') THEN '{lang}'"
                  for lang, rng in SCRIPT_LANGS) +
        f" WHEN regexp_matches(b.text, '[Ѐ-ӿ]') THEN {group_case['cyr']}"
        f" WHEN regexp_matches(b.text, '[{_ARAB_LETTERS}]')"
        f" THEN {group_case['arab']}"
        f" ELSE {group_case['latin']} END AS lang_pred"
        " FROM documents b " + joins)


def _sector_hot_values() -> str:
    """(doc, pos, hot) VALUES rows of the frozen bundled SECTOR model's
    per-sentence argmax labels over the fixture documents (hot =
    argmax + 1, the same index-0 reservation as the Spark lane). Computed
    once driver-side from the deterministic npz — the same
    baked-literal pattern as the SRP planes and langid profile weights —
    so the oracle replays the trained model's segmentation decisions
    without a recurrent forward in SQL."""
    from texoo_spark.sector import fixture_documents, train_fixture_sector
    from texoo_spark.sentemb import sentence_embedding_batch
    model = train_fixture_sector()
    rows = []
    for d, (sents, _) in enumerate(fixture_documents()):
        probs = model.forward(
            sentence_embedding_batch(sents, model.d_in))[0]
        rows.extend(f"({d}, {i}, {int(h)})"
                    for i, h in enumerate(probs.argmax(axis=1) + 1))
    return ", ".join(rows)


def _fingerprint_oracle() -> str:
    """textquality windowed-min-FNV document fingerprint in SQL (8-word
    windows, min FNV-1a, signed 64-bit view)."""
    return (
        "WITH w AS (SELECT doc_id, list_filter(string_split_regex("
        r"lower(text), '\s+'), x -> x <> '') AS ws FROM documents),"
        " f AS (SELECT doc_id, CASE WHEN len(ws) = 0 THEN 0::HUGEINT"
        " ELSE list_min(list_transform(list_transform("
        " range(0, greatest(len(ws) - 8, 0) + 1),"
        " wi -> array_to_string(ws[wi + 1 : wi + least(8, len(ws))],"
        " ' ')), s2 -> " + _SQL_FNV.format(s="s2") + ")) END AS h"
        " FROM w)"
        " SELECT doc_id, CAST(CASE WHEN h >= 9223372036854775808"
        " THEN h - 18446744073709551616 ELSE h END AS BIGINT)"
        " AS fingerprint FROM f")


def _quality_profile_oracle(stop: str) -> str:
    """quality_scores oracle: JVM-side quality ratios + document
    fingerprint + language id joined into the one-scan document profile
    (the fingerprint and langid statements are reused as subqueries),
    plus the A3 route_by_language replay: 'de' dispatches to the German
    stop-counter, everything else (incl. unknown '') falls back to the
    default 'en' annotator."""
    stop_de = ", ".join(f"'{s}'" for s in STOPLIST_DE)
    return (
        f"SELECT d.doc_id,"
        f" CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,"
        f" ROUND((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))"
        f" / CAST(length(text) AS DOUBLE), 6) AS digit_ratio,"
        f" ROUND(len(list_filter(string_split(text, ' '),"
        f" w -> w IN ({stop}))) / CAST(len(string_split(text, ' ')) AS DOUBLE), 6)"
        f" AS stopword_ratio, fp.fingerprint, lg.lang_pred,"
        f" CASE WHEN lg.lang_pred = 'de' THEN 'de' ELSE 'en' END AS route,"
        f" CAST(CASE WHEN lg.lang_pred = 'de'"
        f" THEN len(list_filter(string_split(text, ' '),"
        f" w -> w IN ({stop_de})))"
        f" ELSE len(list_filter(string_split(text, ' '),"
        f" w -> w IN ({stop}))) END AS BIGINT) AS routed_stopwords"
        f" FROM documents d"
        f" JOIN ({_fingerprint_oracle()}) fp ON fp.doc_id = d.doc_id"
        f" JOIN ({_detect_language_oracle()}) lg ON lg.doc_id = d.doc_id")


# Shared CTE skeleton for the per-document segmentation metrics: run-ids
# (positions_array equivalents) for the GOLD label sequence and the
# 1-shifted hypothesis, per-doc k = max(floor(mean_gold_seg_len/2 + 0.5), 2)
# (Java Math.round), and the k-distance window join. Run-id differences give
# both metrics: Pk disagrees when same-segment-ness differs (dref=0 vs
# dhyp=0); WindowDiff disagrees when boundary counts differ (dref vs dhyp).
_SEG_EVAL_SQL = (
    "WITH base AS (SELECT vec_id // 50 AS doc, vec_id, label,"
    " ROW_NUMBER() OVER (PARTITION BY vec_id // 50 ORDER BY vec_id) - 1"
    " AS pos FROM embeddings),"
    " hh AS (SELECT doc, pos, label,"
    " COALESCE(LAG(label) OVER (PARTITION BY doc ORDER BY pos), label)"
    " AS hyp FROM base),"
    " ch AS (SELECT doc, pos, label, hyp,"
    " LAG(label) OVER (PARTITION BY doc ORDER BY pos) AS lref,"
    " LAG(hyp) OVER (PARTITION BY doc ORDER BY pos) AS lhyp FROM hh),"
    " r AS (SELECT doc, pos,"
    " SUM(CASE WHEN pos = 0 OR label <> lref THEN 1 ELSE 0 END)"
    " OVER (PARTITION BY doc ORDER BY pos ROWS UNBOUNDED PRECEDING) AS rr,"
    " SUM(CASE WHEN pos = 0 OR hyp <> lhyp THEN 1 ELSE 0 END)"
    " OVER (PARTITION BY doc ORDER BY pos ROWS UNBOUNDED PRECEDING) AS rh"
    " FROM ch),"
    " kk AS (SELECT doc, COUNT(*) AS n, MAX(rr) AS mrr, MAX(rh) AS mrh,"
    " GREATEST(CAST(FLOOR(COUNT(*) / (2.0 * MAX(rr))"
    " + 0.5) AS INTEGER), 2) AS k FROM r GROUP BY doc),"
    " pw AS (SELECT a.doc, (b.rr - a.rr) AS dref, (b.rh - a.rh) AS dhyp"
    " FROM r a JOIN kk ON kk.doc = a.doc"
    " JOIN r b ON b.doc = a.doc AND b.pos = a.pos + kk.k),"
    # degenerate docs (n <= k: no window pairs) still get a row, matching
    # metrics._degenerate: n == 2 compares same-segment agreement, n <= 1
    # and 2 < n <= k give 0.0 (count == 0 path)
    " pa AS (SELECT doc, AVG(CASE WHEN (dref = 0) <> (dhyp = 0)"
    " THEN 1.0 ELSE 0.0 END) AS pkv,"
    " AVG(CASE WHEN dref <> dhyp THEN 1.0 ELSE 0.0 END) AS wdv"
    " FROM pw GROUP BY doc),"
    " p AS (SELECT kk.doc, kk.k,"
    " COALESCE(pkv, CASE WHEN kk.n = 2 AND ((kk.mrr = 1) <> (kk.mrh = 1))"
    " THEN 1.0 ELSE 0.0 END) AS pkv,"
    " COALESCE(wdv, CASE WHEN kk.n = 2 AND ((kk.mrr = 1) <> (kk.mrh = 1))"
    " THEN 1.0 ELSE 0.0 END) AS wdv"
    " FROM kk LEFT JOIN pa ON pa.doc = kk.doc)")


def oracle_sql() -> dict[str, str]:
    gaz = ", ".join(f"'{t}'" for t in GAZETTEER_TERMS)
    # linker-stage replay: aliases resolved top-1 by (prior DESC,
    # entity_id) — the same tie-break link_mentions applies
    _top1 = {}
    for a, e, pr in sorted(ALIAS_TABLE, key=lambda r: (-r[2], r[1])):
        _top1.setdefault(a, e)
    linked = ", ".join(f"'{a}'" for a in sorted(_top1))
    first_entity = ("CASE lk.lw[1] " + " ".join(
        f"WHEN '{a}' THEN '{_top1[a]}'" for a in sorted(_top1)) + " END")
    both = ", ".join(f"'{t}'" for t in GOLD_TERMS if t in PRED_TERMS)
    pred_only = ", ".join(f"'{t}'" for t in PRED_TERMS if t not in GOLD_TERMS)
    gold_only = ", ".join(f"'{t}'" for t in GOLD_TERMS if t not in PRED_TERMS)
    stop = ", ".join(f"'{s}'" for s in STOPLIST)
    return {
        "extract_tokens": (
            "SELECT 'rule' AS lane, doc_id,"
            " CAST(len(string_split(text, ' ')) AS BIGINT)"
            " AS n_tokens FROM documents"
            " UNION ALL"
            " SELECT 'maxent' AS lane, doc_id,"
            " CAST(len(string_split(text, ' ')) AS BIGINT)"
            " AS n_tokens FROM documents"),
        "extract_newline_discard": (
            "SELECT 'two_sent' AS variant, doc_id,"
            " text || ' end. Stop now.' AS extracted_text,"
            " CAST(2 AS BIGINT) AS n_sentences FROM documents"
            " UNION ALL"
            " SELECT 'nl_discard' AS variant, doc_id,"
            " 'Header line ' || text AS extracted_text,"
            " CAST(2 AS BIGINT) AS n_sentences FROM documents"),
        "html_main_content": (
            "SELECT doc_id, text AS main_text FROM documents"
            " WHERE len(string_split(text, ' ')) >= 10"),
        "gazetteer_matches": (
            # the 3-stage bundle lane (docs < 100) must reproduce the
            # fused count exactly, plus the linker stage's outputs:
            # n_linked counts only matches whose surface has an alias
            # entity, first_entity maps the earliest linked match
            # through the top-1-by-prior alias resolution
            f"WITH lk AS (SELECT doc_id,"
            f" list_filter(string_split(text, ' '),"
            f" w -> w IN ({linked})) AS lw FROM documents)"
            f" SELECT d.doc_id, CAST(len(list_filter("
            f" string_split(d.text, ' '),"
            f" w -> w IN ({gaz}))) AS BIGINT) AS n_matches,"
            f" CASE WHEN d.doc_id < 100 THEN"
            f" CAST(len(list_filter(string_split(d.text, ' '),"
            f" w -> w IN ({gaz}))) AS BIGINT)"
            f" ELSE NULL END AS n_matches_bundle,"
            f" CASE WHEN d.doc_id < 100 THEN CAST(len(lk.lw) AS BIGINT)"
            f" ELSE NULL END AS n_linked_bundle,"
            f" CASE WHEN d.doc_id < 100 THEN ({first_entity})"
            f" ELSE NULL END AS first_entity_bundle"
            f" FROM documents d JOIN lk ON lk.doc_id = d.doc_id"),
        "token_prf": (
            f"WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok"
            f" FROM documents),"
            f" c AS (SELECT"
            f" CAST(SUM(CASE WHEN tok IN ({both}) THEN 1 ELSE 0 END) AS BIGINT) AS tp,"
            f" CAST(SUM(CASE WHEN tok IN ({pred_only}) THEN 1 ELSE 0 END) AS BIGINT) AS fp,"
            f" CAST(SUM(CASE WHEN tok IN ({gold_only}) THEN 1 ELSE 0 END) AS BIGINT) AS fn"
            f" FROM toks)"
            f" SELECT tp, fp, fn,"
            f" ROUND(tp / (tp + fp), 6) AS precision,"
            f" ROUND(tp / (tp + fn), 6) AS recall,"
            f" ROUND(2.0 * (tp/(tp+fp)) * (tp/(tp+fn)) /"
            f" ((tp/(tp+fp)) + (tp/(tp+fn))), 6) AS f1 FROM c"),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus,"
            " CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,"
            " CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
            " AS sum_base_price_cents,"
            " COUNT(*) AS count_order"
            " FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'"
            " GROUP BY l_returnflag, l_linestatus"),
        "top_order_per_customer": (
            "SELECT o_custkey, o_orderkey,"
            " CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents"
            " FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey"
            " ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)"
            " WHERE rn = 1"),
        "nation_revenue": (
            "SELECT n_name,"
            " CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
            " AS revenue_cents, COUNT(*) AS n_orders"
            " FROM orders JOIN customer ON o_custkey = c_custkey"
            " JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"),
        "events_hourly": (
            "SELECT date_trunc('hour', ts) AS hour, event_type,"
            " COUNT(*) AS n_events,"
            " CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)"
            " AS value_cents FROM events GROUP BY 1, 2"),
        "running_user_totals": (
            "WITH s0 AS (SELECT user_id, ts, event_id, value,"
            " CASE WHEN LAG(epoch_us(ts)) OVER w2 IS NULL"
            " OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w2 > 28800000000"
            " THEN 1 ELSE 0 END AS brk FROM events"
            " WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)),"
            " s1 AS (SELECT user_id, ts, value,"
            " SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " AS session_idx FROM s0),"
            " s AS (SELECT user_id, session_idx,"
            " COUNT(*) AS n,"
            " CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)"
            " AS cents, CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_us,"
            " CAST(epoch_us(MAX(ts)) AS BIGINT) AS end_us FROM s1"
            " GROUP BY 1, 2)"
            " SELECT 'running' AS lane, user_id,"
            " CAST(event_id AS BIGINT) AS seq,"
            " COUNT(*) OVER w AS n,"
            " CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)"
            " AS cents, CAST(-1 AS BIGINT) AS start_us,"
            " CAST(-1 AS BIGINT) AS end_us FROM events"
            " WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " UNION ALL SELECT 'sessions' AS lane, user_id,"
            # session_idx is a DuckDB window SUM() -> HUGEINT; uncast it
            # widens the unioned seq column and renders 124.0 vs Spark's
            # BIGINT 124 under pandas/Arrow collection (the r4 red cell).
            " CAST(session_idx AS BIGINT) AS seq,"
            " n, cents, start_us, end_us FROM s"),
        "dedup_prefix": (
            "SELECT array_to_string(string_split(text, ' ')[1:3], ' ')"
            " AS prefix_key, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id"
            " FROM documents GROUP BY 1 HAVING COUNT(*) > 1"),
        "segmentation_metrics": _SEG_EVAL_SQL + (
            " SELECT CAST(doc AS VARCHAR) AS doc, k,"
            " ROUND(pkv, 6) AS pk, ROUND(wdv, 6) AS wd FROM p"),
        "retrieval_mrr": (
            "WITH rk AS (SELECT label AS qid, vec_id,"
            " ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS rn,"
            " CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END AS rel"
            " FROM embeddings),"
            " c AS (SELECT qid, rn, rel, SUM(rel) OVER (PARTITION BY qid"
            " ORDER BY rn ROWS UNBOUNDED PRECEDING) AS cum FROM rk),"
            " t AS (SELECT qid, SUM(rel) AS nrel,"
            " MAX(CASE WHEN rn = 5 THEN cum END) AS cum5,"
            " SUM(CASE WHEN rel = 1 AND cum = 1 THEN 1.0 / rn ELSE 0 END)"
            " AS mrr,"
            " SUM(CASE WHEN rel = 1 THEN CAST(cum AS DOUBLE) / rn ELSE 0 END)"
            " AS apsum,"
            " SUM(CASE WHEN rel = 1 AND rn <= 10 THEN 1.0 / log2(rn + 1)"
            " ELSE 0 END) AS dcg10"
            " FROM c GROUP BY qid)"
            " SELECT CAST(qid AS BIGINT) AS query_id,"
            " ROUND(mrr, 6) AS mrr,"
            " ROUND(CASE WHEN nrel > 0 THEN apsum / nrel ELSE 0 END, 6)"
            " AS ap,"
            " CAST(CASE WHEN nrel > 0 THEN 1.0 ELSE 0.0 END AS DOUBLE)"
            " AS recall_n,"
            " ROUND(COALESCE(cum5, nrel) / 5.0, 6) AS p_at_5,"
            " ROUND(CASE WHEN nrel > 0 THEN dcg10 / list_sum(list_transform("
            " range(1, CAST(LEAST(10, nrel) + 1 AS BIGINT)),"
            " pp -> 1.0 / log2(pp + 1))) ELSE 0 END, 6) AS ndcg_at_10"
            " FROM t"),
        "conv_rebase": (
            "WITH t AS (SELECT doc_id, text, doc_id % 50 AS conv,"
            " doc_id // 50 AS turn FROM documents)"
            " SELECT doc_id,"
            " CAST(COALESCE(SUM(length(text) + 1) OVER w, 0) AS BIGINT)"
            " AS conv_begin,"
            " CAST(COALESCE(SUM(length(text) + 1) OVER w, 0) + length(text)"
            " AS BIGINT) AS conv_end FROM t"
            " WINDOW w AS (PARTITION BY conv ORDER BY turn"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"),
        "newline_segments": (
            "SELECT doc_id, CAST(3 AS BIGINT) AS n_segments FROM documents"
            " WHERE len(string_split(text, ' ')) > 10"),
        "max_overlap_token": (
            "WITH toks AS (SELECT doc_id,"
            " unnest(string_split(text, ' ')) AS tok,"
            " unnest(range(1, len(string_split(text, ' ')) + 1)) AS idx"
            " FROM documents),"
            " pos AS (SELECT doc_id, idx,"
            " CAST(COALESCE(SUM(length(tok) + 1) OVER (PARTITION BY doc_id"
            " ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
            " 0) AS BIGINT) AS b, length(tok) AS l FROM toks),"
            " ov AS (SELECT doc_id, b AS best_begin,"
            " LEAST(b + l, 40) - GREATEST(b, 10) AS overlap,"
            " ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY"
            " LEAST(b + l, 40) - GREATEST(b, 10) DESC, b) AS rn"
            " FROM pos WHERE LEAST(b + l, 40) - GREATEST(b, 10) > 0)"
            " SELECT doc_id, best_begin, CAST(overlap AS BIGINT) AS overlap"
            " FROM ov WHERE rn = 1"),
        "knn_cosine": (
            "WITH single AS (SELECT vec_id, ROUND(list_cosine_similarity("
            " CAST(embedding AS DOUBLE[]),"
            " (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings"
            " WHERE vec_id = 0)), 6) AS cosine"
            " FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10),"
            " sr AS (SELECT 'single' AS lane,"
            " CAST(-1 AS BIGINT) AS query_id,"
            " ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rank,"
            " vec_id, cosine FROM single),"
            " q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[])"
            " AS qv FROM embeddings WHERE vec_id < 5),"
            " s AS (SELECT qid, e.vec_id, ROUND(list_cosine_similarity("
            " CAST(e.embedding AS DOUBLE[]), qv), 6) AS c"
            " FROM embeddings e CROSS JOIN q),"
            " r AS (SELECT qid, vec_id, c, ROW_NUMBER() OVER (PARTITION BY"
            " qid ORDER BY c DESC, vec_id) AS rank FROM s)"
            " SELECT lane, query_id, CAST(rank AS BIGINT) AS rank,"
            " CAST(vec_id AS BIGINT) AS vec_id, cosine FROM sr"
            " UNION ALL"
            " SELECT 'batch' AS lane, CAST(qid AS BIGINT) AS query_id,"
            " CAST(rank AS BIGINT) AS rank, CAST(vec_id AS BIGINT) AS vec_id,"
            " c AS cosine FROM r WHERE rank <= 5"),
        "media_features": (
            "WITH feats AS (SELECT doc_id AS media_id, sha256(text) AS"
            " sha256, CAST(length(text) AS BIGINT) AS n_bytes"
            " FROM documents),"
            " frames AS (SELECT doc_id AS media_id, CAST(unnest(range(0,"
            " greatest(len(string_split(text, ' ')) * 250 - 1, 0) + 1,"
            " 1000)) AS BIGINT) AS frame_ts_ms"
            " FROM documents WHERE doc_id % 3 = 0),"
            # closed-form stats of mediacodec.synth_media_payload (g =
            # id//4): images (kind 0 png / 1 bmp) are W=16*(1+g%2) x
            # H=16*(1+g%3) x 3ch with px = (r*W+c+id%200)%256 (W*H a
            # multiple of 256 -> mean exactly 127.5); audio (kind 2) is
            # n=256*(8+g%5) PCM16 samples s[i]=((i+id%128)%256-128)*16
            # -> mean exactly -8; jpeg (kind 3) is W x H GRAYSCALE with
            # constant 8x8 blocks v(b)=(16b+id%200)%256 at quality 100 —
            # the entropy-coded round trip is bit-exact, so the mean is
            # the average over the (w/8)*(h/8) block values.
            " geo AS (SELECT doc_id AS media_id, doc_id % 4 AS kind,"
            " 16 * (1 + (doc_id // 4) % 2) AS w,"
            " 16 * (1 + (doc_id // 4) % 3) AS h,"
            " 256 * (8 + (doc_id // 4) % 5) AS n,"
            " doc_id % 200 AS mp, doc_id % 128 AS mq"
            " FROM documents WHERE doc_id < 120),"
            # kind 2 alternates WAV / FLAC on (id//4) parity; FLAC is
            # lossless so only the mime changes — decoded stats identical
            " dec AS (SELECT media_id,"
            " CASE kind WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/bmp'"
            " WHEN 2 THEN (CASE WHEN (media_id // 4) % 2 = 1"
            " THEN 'audio/flac' ELSE 'audio/wav' END)"
            " ELSE 'image/jpeg' END AS mime,"
            " CAST(CASE WHEN kind = 2 THEN n ELSE w END AS INTEGER)"
            " AS width,"
            " CAST(CASE WHEN kind = 2 THEN 1 ELSE h END AS INTEGER)"
            " AS height,"
            " CAST(CASE WHEN kind < 2 THEN w * h * 3 WHEN kind = 2 THEN n"
            " ELSE w * h END AS BIGINT) AS v_count,"
            " CASE WHEN kind < 2 THEN 127.5 WHEN kind = 2 THEN -8.0"
            " ELSE list_avg(list_transform(range((w // 8) * (h // 8)),"
            " b -> CAST((16 * b + mp) % 256 AS DOUBLE))) END AS v_mean,"
            " CASE WHEN kind = 2 THEN (mq - 128) * 16.0"
            " ELSE CAST(mp AS DOUBLE) END AS v_first,"
            " CASE WHEN kind < 2 THEN"
            " CAST(((h - 1) * w + w - 1 + mp) % 256 AS DOUBLE)"
            " WHEN kind = 2 THEN ((mq + 255) % 256 - 128) * 16.0"
            " ELSE CAST((16 * ((w // 8) * (h // 8) - 1) + mp) % 256"
            " AS DOUBLE) END AS v_last"
            " FROM geo),"
            " mgeo AS (SELECT doc_id AS media_id, 5 + doc_id % 4 AS n,"
            "  200 + (doc_id % 3) * 100 AS d,"
            "  320 + (doc_id % 16) * 8 AS w, 180 + (doc_id % 9) * 8 AS h"
            "  FROM documents WHERE doc_id < 90),"
            " msamp AS (SELECT media_id, CAST(i AS INTEGER) AS sample_idx,"
            "  CAST(i * d AS BIGINT) AS dts_ms,"
            "  24 + ((media_id + 5 * i) % 17) AS size,"
            "  (i % 3 = 0) AS is_sync, CAST(n * d AS BIGINT) AS duration_ms,"
            "  w, h FROM mgeo, LATERAL (SELECT unnest(range(0, n)) AS i) r),"
            " moff AS (SELECT *, 28 + COALESCE(SUM(size) OVER ("
            "  PARTITION BY media_id ORDER BY sample_idx"
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
            "  AS byte_off FROM msamp),"
            " mtgt AS (SELECT media_id, CAST(unnest(range(0, duration_ms,"
            "  500)) AS BIGINT) AS t FROM"
            "  (SELECT DISTINCT media_id, duration_ms FROM moff)),"
            " mpick AS (SELECT media_id, t, MAX(dts_ms) AS dts_ms"
            "  FROM mtgt JOIN moff USING (media_id)"
            "  WHERE is_sync AND dts_ms <= t GROUP BY 1, 2),"
            # lane 'mp4:decoded': mp4box.synth_mjpeg_rule replay — MJPEG
            # timing/sync selection, then the flat-block decoded stats
            # v(b) = (16*b + 7*i + id%200) % 256 in closed form (quality
            # 100 flat blocks decode bit-exactly; nb equal-sized blocks
            # make the pixel mean the block-value mean, exact in float64
            # because w*h and nb are powers of two)
            " jgeo AS (SELECT doc_id AS media_id, 4 + doc_id % 3 AS n,"
            "  250 + (doc_id % 2) * 250 AS d,"
            "  16 * (1 + doc_id % 2) AS w, 16 AS h,"
            "  4 * (1 + doc_id % 2) AS nb, doc_id % 200 AS base"
            "  FROM documents WHERE doc_id >= 90 AND doc_id < 114),"
            " jsamp AS (SELECT media_id, CAST(i AS INTEGER) AS sample_idx,"
            "  CAST(i * d AS BIGINT) AS dts_ms, (i % 2 = 0) AS is_sync,"
            "  CAST(n * d AS BIGINT) AS duration_ms, w, h, nb, base"
            "  FROM jgeo, LATERAL (SELECT unnest(range(0, n)) AS i) r),"
            " jtgt AS (SELECT media_id, CAST(unnest(range(0, duration_ms,"
            "  500)) AS BIGINT) AS t FROM"
            "  (SELECT DISTINCT media_id, duration_ms FROM jsamp)),"
            " jpick AS (SELECT media_id, t, MAX(dts_ms) AS dts_ms"
            "  FROM jtgt JOIN jsamp USING (media_id)"
            "  WHERE is_sync AND dts_ms <= t GROUP BY 1, 2),"
            " jsel AS (SELECT DISTINCT s.media_id, s.sample_idx, s.dts_ms,"
            "  s.w, s.h, s.nb, s.base FROM jsamp s"
            "  JOIN jpick p ON p.media_id = s.media_id"
            "  AND p.dts_ms = s.dts_ms)"
            " SELECT 'frames' AS lane, media_id, frame_ts_ms, sha256,"
            " n_bytes, CAST(NULL AS VARCHAR) AS mime,"
            " CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER)"
            " AS height, CAST(NULL AS BIGINT) AS v_count,"
            " CAST(NULL AS DOUBLE) AS v_mean, CAST(NULL AS DOUBLE)"
            " AS v_first, CAST(NULL AS DOUBLE) AS v_last"
            " FROM frames JOIN feats USING (media_id)"
            " UNION ALL"
            " SELECT 'decoded' AS lane, media_id,"
            " CAST(NULL AS BIGINT) AS frame_ts_ms,"
            " CAST(NULL AS VARCHAR) AS sha256,"
            " CAST(NULL AS BIGINT) AS n_bytes, mime, width, height,"
            " v_count, ROUND(v_mean, 6) AS v_mean, v_first, v_last"
            " FROM dec"
            " UNION ALL"
            # lane 'mp4': closed-form replay of mp4box.synth_rule /
            # synth_sample_bytes + the every-500ms snap-to-sync selection.
            # offset = 28 (ftyp+mdat header) + running sum of prior sizes;
            # frame bytes are printable ASCII so sha256(VARCHAR) hashes
            # the exact payload bytes.
            " SELECT 'mp4' AS lane, media_id, dts_ms AS frame_ts_ms,"
            " sha256(array_to_string(list_transform(range(0, size),"
            "  j -> chr(CAST(32 + (media_id * 31 + 7 * sample_idx + j) % 95"
            "  AS INTEGER))), '')) AS sha256,"
            " CAST(size AS BIGINT) AS n_bytes, 'video/mp4' AS mime,"
            " CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,"
            " CAST(sample_idx AS BIGINT) AS v_count,"
            " CAST(NULL AS DOUBLE) AS v_mean,"
            " CAST(byte_off AS DOUBLE) AS v_first,"
            " CAST(duration_ms AS DOUBLE) AS v_last"
            " FROM (SELECT DISTINCT m.* FROM moff m"
            "  JOIN mpick p ON p.media_id = m.media_id"
            "  AND p.dts_ms = m.dts_ms)"
            " UNION ALL"
            " SELECT 'mp4:decoded' AS lane, media_id,"
            " dts_ms AS frame_ts_ms, CAST(NULL AS VARCHAR) AS sha256,"
            " CAST(NULL AS BIGINT) AS n_bytes, 'video/mjpeg' AS mime,"
            " CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,"
            " CAST(w * h AS BIGINT) AS v_count,"
            " ROUND(list_avg(list_transform(range(0, nb), b ->"
            "  CAST((16 * b + 7 * sample_idx + base) % 256 AS DOUBLE))), 6)"
            "  AS v_mean,"
            " CAST((7 * sample_idx + base) % 256 AS DOUBLE) AS v_first,"
            " CAST((16 * (nb - 1) + 7 * sample_idx + base) % 256 AS DOUBLE)"
            "  AS v_last FROM jsel"),
        "ngram_jaccard_dups": (
            "WITH base AS ("
            " SELECT doc_id AS id, lower(text) AS text FROM documents"
            "  WHERE doc_id < 200"
            " UNION ALL"
            " SELECT doc_id + 1000000 AS id, lower(array_to_string("
            "  string_split(text, ' ')[1:greatest("
            "  len(string_split(text, ' ')) - 2, 1)], ' ')) AS text"
            " FROM documents WHERE doc_id < 200),"
            " g AS (SELECT id, list_distinct(list_transform("
            "  range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1),"
            "  i -> array_to_string(string_split(text, ' ')[i + 1:i + 3], ' ')"
            " )) AS grams FROM base),"
            " counts AS (SELECT id, len(grams) AS n_grams FROM g),"
            " ex AS (SELECT id, unnest(grams) AS gram FROM g),"
            " shared AS (SELECT l.id AS id_a, r.id AS id_b,"
            "  COUNT(*) AS shared FROM ex l JOIN ex r"
            "  ON l.gram = r.gram AND l.id < r.id GROUP BY 1, 2)"
            " SELECT id_a, id_b, ROUND(shared /"
            "  CAST(ca.n_grams + cb.n_grams - shared AS DOUBLE), 6) AS jaccard"
            " FROM shared JOIN counts ca ON ca.id = id_a"
            " JOIN counts cb ON cb.id = id_b"
            " WHERE ROUND(shared / CAST(ca.n_grams + cb.n_grams - shared"
            "  AS DOUBLE), 6) >= 0.5"),
        "bm25_topk": (
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "  string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''))"
            "  AS term FROM documents),"
            " postings AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks"
            "  GROUP BY 1, 2),"
            " dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df"
            "  FROM postings GROUP BY 1),"
            " doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),"
            " stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl"
            "  FROM doclen),"
            " q AS (SELECT doc_id AS query_id, array_to_string("
            "  string_split(text, ' ')[1:3], ' ') AS qtext FROM documents"
            "  WHERE doc_id < 5),"
            " qterms AS (SELECT query_id, unnest(list_distinct(list_filter("
            "  string_split_regex(lower(qtext), '[^a-z0-9]+'),"
            "  t -> t <> ''))) AS term FROM q),"
            " scored AS (SELECT query_id, p.doc_id, ROUND(SUM("
            "  ln(1 + (s.n_docs - df + 0.5) / (df + 0.5))"
            "  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / s.avgdl))"
            " ), 3) AS score"
            " FROM postings p JOIN qterms USING (term)"
            " JOIN dfreq USING (term)"
            " JOIN doclen dle ON dle.doc_id = p.doc_id"
            " CROSS JOIN stats s"
            " GROUP BY query_id, p.doc_id),"
            " r AS (SELECT query_id, doc_id, score, ROW_NUMBER() OVER ("
            " PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank"
            " FROM scored)"
            " SELECT 'scores' AS lane, query_id,"
            " CAST(NULL AS BIGINT) AS rank, doc_id, score FROM scored"
            " UNION ALL"
            " SELECT 'topk' AS lane, query_id, CAST(rank AS BIGINT) AS rank,"
            " doc_id, score FROM r WHERE rank <= 10"),
        "train_test_split": (
            "WITH b AS (SELECT doc_id,"
            " ((strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[1])"
            " - 1) * 256 +"
            " (strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[2])"
            " - 1) * 16 +"
            " strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[3])"
            " - 1) % 10 AS bucket FROM documents)"
            " SELECT CASE WHEN bucket < 8 THEN 'train'"
            " WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,"
            " COUNT(*) AS n_docs,"
            " MIN(doc_id) AS min_id, MAX(doc_id) AS max_id"
            " FROM b GROUP BY 1"),
        "table_snapshots": (
            # closed-form contents of each tablelog version: v1 append
            # (%3=0), v2 append (%3=1), v3 copy-on-write delete (%2=0),
            # v4 append (%3=2), v5 MERGE upsert (%5=0 -> n_chars =
            # doc_id%7+3, absent ids insert), v6/latest additive schema
            # evolution (ids 300..329 carry extra = doc_id*2; every
            # older row reads NULL)
            "WITH b AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS"
            " n_chars FROM documents WHERE doc_id < 300),"
            " v5 AS (SELECT doc_id,"
            "  CASE WHEN doc_id % 5 = 0 THEN CAST(doc_id % 7 + 3 AS BIGINT)"
            "  ELSE n_chars END AS n_chars FROM b"
            "  WHERE (doc_id % 3 IN (0, 1) AND doc_id % 2 = 1)"
            "  OR doc_id % 3 = 2 OR doc_id % 5 = 0)"
            " SELECT 'v1' AS lane, doc_id, n_chars,"
            " CAST(NULL AS BIGINT) AS extra FROM b"
            " WHERE doc_id % 3 = 0"
            " UNION ALL SELECT 'v2' AS lane, doc_id, n_chars,"
            " CAST(NULL AS BIGINT) AS extra FROM b"
            " WHERE doc_id % 3 IN (0, 1)"
            " UNION ALL SELECT 'v3' AS lane, doc_id, n_chars,"
            " CAST(NULL AS BIGINT) AS extra FROM b"
            " WHERE doc_id % 3 IN (0, 1) AND doc_id % 2 = 1"
            " UNION ALL SELECT 'v4' AS lane, doc_id, n_chars,"
            " CAST(NULL AS BIGINT) AS extra FROM b"
            " WHERE (doc_id % 3 IN (0, 1) AND doc_id % 2 = 1)"
            " OR doc_id % 3 = 2"
            " UNION ALL SELECT 'v5' AS lane, doc_id, n_chars,"
            " CAST(NULL AS BIGINT) AS extra FROM v5"
            " UNION ALL SELECT 'latest' AS lane, doc_id, n_chars,"
            " CAST(NULL AS BIGINT) AS extra FROM v5"
            " UNION ALL SELECT 'latest' AS lane, doc_id,"
            " CAST(length(text) AS BIGINT) AS n_chars,"
            " CAST(doc_id * 2 AS BIGINT) AS extra FROM documents"
            " WHERE doc_id >= 300 AND doc_id < 330"),
        "pdf_layout": (
            # boxes lane: lines 1-2 gap = 2, line 3 gap = 22 > 1.8 x
            # median(2) -> paragraph break before word 9 (pdfops.
            # _paragraphs semantics). bytes lane: real PDF round trip,
            # 16 words wrapped 3/line 8/para -> words 1-8 \n words 9-16;
            # reading order is invariant to the compression / two-column
            # knobs, so the oracle is pure text arithmetic.
            "SELECT 'boxes' AS lane, doc_id,"
            " array_to_string(string_split(text, ' ')[1:8], ' ')"
            " || chr(10) ||"
            " array_to_string(string_split(text, ' ')[9:12], ' ')"
            " AS layout_text FROM documents"
            " WHERE len(string_split(text, ' ')) >= 12"
            " UNION ALL "
            "SELECT 'bytes' AS lane, doc_id,"
            " array_to_string(string_split(text, ' ')[1:8], ' ')"
            " || chr(10) ||"
            " array_to_string(string_split(text, ' ')[9:16], ' ')"
            " AS layout_text FROM documents"
            " WHERE len(string_split(text, ' ')) >= 16"),
        "bio_decode": (
            "SELECT doc_id,"
            " CAST((len(string_split(text, ' ')) + 2) // 3 AS BIGINT)"
            " AS n_spans, TRUE AS bioes_valid FROM documents"),
        "normalized_text": (
            "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace("
            "text || '-' || CAST(doc_id AS VARCHAR),"
            " '[-_/]+', ' ', 'g'), '[0-9]+', '#', 'g'), '\\s+', '_', 'g')"
            " AS norm_text,"
            " lower(string_split(text, ' ')[1]) || '#' AS norm_key"
            " FROM documents"),
        "serializer_roundtrip": (
            "SELECT CAST(doc_id AS VARCHAR) || '#0' AS id,"
            " CAST(length(text) AS BIGINT) AS end,"
            " CASE WHEN doc_id < 10 THEN CAST(length(text) AS BIGINT)"
            " END AS n_chars FROM documents"),
        "tokenized_roundtrip": (
            "SELECT doc_id, text AS recon,"
            " CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,"
            " CAST(length(string_split(text, ' ')[1]) AS BIGINT)"
            " AS n_trigrams FROM documents"),
        "bow_vocab": (
            "WITH w AS (SELECT unnest(string_split(lower(text), ' '))"
            " AS word FROM documents)"
            " SELECT word, COUNT(*) AS freq FROM w"
            " WHERE length(word) >= 2 AND word NOT IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'with')"
            " GROUP BY word HAVING COUNT(*) >= 5"),
        "classification_prf": (
            "WITH pairs AS (SELECT label AS gold,"
            " COALESCE(LAG(label, 1) OVER (ORDER BY vec_id), label) AS pred"
            " FROM embeddings),"
            " tp AS (SELECT gold AS label, COUNT(*) AS tp FROM pairs"
            "  WHERE gold = pred GROUP BY 1),"
            " fp AS (SELECT pred AS label, COUNT(*) AS fp FROM pairs"
            "  WHERE gold <> pred GROUP BY 1),"
            " fn AS (SELECT gold AS label, COUNT(*) AS fn FROM pairs"
            "  WHERE gold <> pred GROUP BY 1),"
            " labels AS (SELECT DISTINCT label FROM (SELECT gold AS label"
            "  FROM pairs UNION ALL SELECT pred FROM pairs)),"
            " j AS (SELECT l.label, COALESCE(tp, 0) AS tp,"
            "  COALESCE(fp, 0) AS fp, COALESCE(fn, 0) AS fn FROM labels l"
            "  LEFT JOIN tp USING (label) LEFT JOIN fp USING (label)"
            "  LEFT JOIN fn USING (label)),"
            " m AS (SELECT label, tp, fp, fn,"
            "  CAST(tp AS DOUBLE) / GREATEST(tp + fp, 1) AS p,"
            "  CAST(tp AS DOUBLE) / GREATEST(tp + fn, 1) AS r FROM j)"
            " SELECT label, tp, fp, fn, ROUND(p, 6) AS precision,"
            " ROUND(r, 6) AS recall,"
            " ROUND(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r)"
            "  ELSE 0.0 END, 6) AS f1, tp + fn AS support FROM m"),
        "segmentation_readers": (
            "WITH base AS (SELECT doc_id,"
            " array_to_string(string_split(text, ' ')"
            " [11:len(string_split(text, ' '))], ' ') AS last_text"
            " FROM documents WHERE len(string_split(text, ' ')) >= 12)"
            " SELECT 'wiki727' AS source, doc_id,"
            " CAST(3 AS BIGINT) AS n_segments, last_text FROM base"
            " UNION ALL SELECT 'choi' AS source, doc_id,"
            " CAST(3 AS BIGINT) AS n_segments, last_text FROM base"
            " UNION ALL SELECT 'multiseg' AS source, doc_id,"
            " CAST(2 AS BIGINT) AS n_segments, last_text FROM base"),
        "wiki_readers": (
            "SELECT doc_id, CAST(2 AS BIGINT) AS n_sections,"
            " 'Intro' AS first_heading,"
            " CAST(length(text) AS BIGINT) AS last_end,"
            " CAST(1 AS BIGINT) AS n_skip, CAST(2 AS BIGINT) AS n_keep,"
            " array_to_string(string_split(text, ' ')[7:9], ' ') || ' . ' ||"
            " array_to_string(string_split(text, ' ')[10:12], ' ') || ' .'"
            " AS body_text"
            " FROM documents WHERE length(text) > 20"
            " AND len(string_split(text, ' ')) >= 12"),
        "mention_readers": (
            "SELECT doc_id, CAST((len(string_split(text, ' ')) + 2) // 3"
            " AS BIGINT) AS conll_mentions,"
            " CAST(2 AS BIGINT) AS wned_mentions,"
            " string_split(text, ' ')[1] AS first_surface,"
            " CAST(length(string_split(text, ' ')[1]) AS BIGINT)"
            " AS first_length FROM documents"
            " WHERE len(string_split(text, ' ')) >= 2"),
        "span_matches": (
            "WITH toks AS (SELECT doc_id,"
            " unnest(string_split(text, ' ')) AS tok,"
            " unnest(range(1, len(string_split(text, ' ')) + 1)) AS idx"
            " FROM documents),"
            " pos AS (SELECT doc_id, idx,"
            " CAST(COALESCE(SUM(length(tok) + 1) OVER (PARTITION BY doc_id"
            " ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
            " 0) AS BIGINT) AS b, length(tok) AS l FROM toks),"
            " strong AS (SELECT doc_id, CAST(SUM(CASE WHEN (idx - 1) % 6 = 0"
            " THEN 1 ELSE 0 END) AS BIGINT) AS n_strong"
            " FROM pos GROUP BY doc_id),"
            " ev AS (SELECT doc_id, (idx + 1) // 2 AS g, b AS g_begin"
            "  FROM pos WHERE idx % 2 = 1),"
            " od AS (SELECT doc_id, idx // 2 AS g, b + l AS g_end"
            "  FROM pos WHERE idx % 2 = 0),"
            " gold AS (SELECT doc_id, g, g_begin, g_end FROM ev"
            "  JOIN od USING (doc_id, g)),"
            " pred AS (SELECT doc_id, idx, b, l FROM pos"
            "  WHERE (idx - 1) % 3 = 0),"
            " wk AS (SELECT DISTINCT p.doc_id, p.idx FROM pred p"
            "  JOIN gold gd ON p.doc_id = gd.doc_id"
            "  AND p.b < gd.g_end AND p.b + p.l > gd.g_begin),"
            " weak AS (SELECT doc_id, COUNT(*) AS n_weak FROM wk"
            " GROUP BY doc_id)"
            " SELECT COALESCE(s.doc_id, w.doc_id) AS doc_id,"
            " COALESCE(n_strong, 0) AS n_strong,"
            " COALESCE(n_weak, 0) AS n_weak"
            " FROM strong s FULL OUTER JOIN weak w ON s.doc_id = w.doc_id"),
        "tokens_in_range": (
            "WITH toks AS (SELECT doc_id,"
            " unnest(string_split(text, ' ')) AS tok,"
            " unnest(range(1, len(string_split(text, ' ')) + 1)) AS idx"
            " FROM documents),"
            " pos AS (SELECT doc_id, idx,"
            " CAST(COALESCE(SUM(length(tok) + 1) OVER (PARTITION BY doc_id"
            " ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
            " 0) AS BIGINT) AS b, length(tok) AS l FROM toks),"
            " rng AS (SELECT doc_id,"
            " CAST(SUM(CASE WHEN b >= 10 AND b + l <= 40 THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_enclosed,"
            " CAST(SUM(CASE WHEN (b <= 10 AND b + l > 10)"
            " OR (b >= 10 AND b + l <= 40)"
            " OR (b < 40 AND b + l >= 40) THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_expand"
            " FROM pos GROUP BY doc_id),"
            " zp AS (SELECT doc_id, CAST(0 AS BIGINT) AS s_begin,"
            " CAST(length(text) // 2 AS BIGINT) AS s_end,"
            " CAST(length(text) AS BIGINT) AS a_end FROM documents"
            " UNION ALL"
            " SELECT doc_id, CAST(length(text) // 2 AS BIGINT),"
            " CAST(length(text) AS BIGINT),"
            " CAST(length(text) AS BIGINT) FROM documents)"
            " SELECT zp.doc_id, s_begin, s_end, a_end, n_enclosed, n_expand"
            " FROM zp JOIN rng ON rng.doc_id = zp.doc_id"),
        "conversation_text": (
            "SELECT doc_id % 50 AS conv_id,"
            " string_agg(text, chr(10) ORDER BY doc_id // 50) AS conv_text,"
            " COUNT(*) AS n_turns FROM documents GROUP BY 1"),
        "tagged_mentions": (
            "SELECT doc_id, CAST(len(list_filter("
            " string_split(text, ' ')[1:3],"
            " w -> regexp_matches(w, '^[a-z]'))) AS BIGINT) AS n_mentions,"
            " upper(string_split(text, ' ')[1]) AS entity_id"
            " FROM documents"),
        "quality_scores": _quality_profile_oracle(stop),
        "max_segments": (
            # A8 runs + A12 attach: per run of equal hot labels, the
            # attached label is the hot index (one-hot segment mean ->
            # cosine 1.0 with its own identity row), heading = 'hot/0'
            # (second neighbour is the first zero-sim index, stably 0),
            # confidence exactly 1.0. Lane 'sector' replays the same run
            # machinery over the frozen SECTOR model's per-sentence
            # argmax labels (baked VALUES — see _sector_hot_values).
            "WITH h AS (SELECT label, vec_id, ROW_NUMBER() OVER ("
            " PARTITION BY label ORDER BY vec_id) - 1 AS pos,"
            " list_position("
            " list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)),"
            " list_max(list_transform(CAST(embedding AS DOUBLE[]),"
            " x -> abs(x)))) AS hot FROM embeddings),"
            " d AS (SELECT label, pos, hot, CASE WHEN LAG(hot) OVER ("
            " PARTITION BY label ORDER BY pos) IS DISTINCT FROM hot"
            " THEN 1 ELSE 0 END AS brk FROM h),"
            " s AS (SELECT label, pos, hot, SUM(brk) OVER (PARTITION BY"
            " label ORDER BY pos) AS seg FROM d),"
            " segs AS (SELECT label, seg - 1 AS seg_idx,"
            " MIN(pos) AS sent_begin, MAX(pos) + 1 AS sent_end,"
            " MIN(hot) AS hot FROM s GROUP BY label, seg),"
            f" sh(doc, pos, hot) AS (SELECT * FROM (VALUES"
            f" {_sector_hot_values()})),"
            " sd AS (SELECT doc, pos, hot, CASE WHEN LAG(hot) OVER ("
            " PARTITION BY doc ORDER BY pos) IS DISTINCT FROM hot"
            " THEN 1 ELSE 0 END AS brk FROM sh),"
            " ss AS (SELECT doc, pos, hot, SUM(brk) OVER (PARTITION BY"
            " doc ORDER BY pos) AS seg FROM sd),"
            " ssegs AS (SELECT doc, seg - 1 AS seg_idx,"
            " MIN(pos) AS sent_begin, MAX(pos) + 1 AS sent_end,"
            " MIN(hot) AS hot FROM ss GROUP BY doc, seg)"
            " SELECT 'embhot' AS lane, CAST(label AS INTEGER) AS label,"
            " CAST(seg_idx AS BIGINT) AS seg_idx,"
            " CAST(sent_begin AS BIGINT) AS sent_begin,"
            " CAST(sent_end AS BIGINT) AS sent_end,"
            " CAST(hot AS VARCHAR) AS seg_label,"
            " hot || '/0' AS heading,"
            # DOUBLE, not the bare 1.0 literal: DuckDB types that DECIMAL,
            # which collects as Decimal('1.0') and renders differently
            " CAST(1.0 AS DOUBLE) AS confidence FROM segs"
            " UNION ALL SELECT 'sector' AS lane,"
            " CAST(1000 + doc AS INTEGER) AS label,"
            " CAST(seg_idx AS BIGINT) AS seg_idx,"
            " CAST(sent_begin AS BIGINT) AS sent_begin,"
            " CAST(sent_end AS BIGINT) AS sent_end,"
            " CAST(hot AS VARCHAR) AS seg_label,"
            " hot || '/0' AS heading,"
            " CAST(1.0 AS DOUBLE) AS confidence FROM ssegs"),
        "ivf_knn": (
            "WITH st AS (SELECT GREATEST(COUNT(*) // 8, 1) AS stride"
            " FROM embeddings),"
            " sd AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,"
            " CAST(embedding AS DOUBLE[]) AS cv FROM embeddings, st"
            " WHERE vec_id % stride = 0 ORDER BY vec_id LIMIT 8),"
            " sn AS (SELECT cell, list_transform(cv, x -> x / GREATEST("
            " sqrt(list_inner_product(cv, cv)), 1e-12)) AS cn FROM sd),"
            " ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
            " FROM embeddings),"
            " en AS (SELECT vec_id, v, list_transform(v, x -> x / GREATEST("
            " sqrt(list_inner_product(v, v)), 1e-12)) AS vn FROM ev),"
            " asg AS (SELECT vec_id, v, cell, ROW_NUMBER() OVER (PARTITION"
            " BY vec_id ORDER BY list_inner_product(vn, cn) DESC, cell)"
            " AS arn FROM en CROSS JOIN sn),"
            " cells AS (SELECT vec_id, v, cell FROM asg WHERE arn = 1),"
            " qv AS (SELECT v AS q, vn AS qn FROM en WHERE vec_id = 0),"
            " probe AS (SELECT cell FROM (SELECT cell, ROW_NUMBER() OVER ("
            " ORDER BY list_inner_product(cn, qn) DESC, cell) AS pr"
            " FROM sn CROSS JOIN qv) WHERE pr <= 4)"
            " SELECT vec_id, ROUND(list_cosine_similarity(v, q), 6)"
            " AS cosine FROM cells JOIN probe USING (cell) CROSS JOIN qv"
            " ORDER BY cosine DESC, vec_id LIMIT 10"),
        # the trained-tagger oracle needs the reference CoNLL fixture at
        # build time (deterministic training, cached per process); on a
        # machine without /root/reference the entry degrades to rows-only
        # instead of breaking the whole oracle dict
        **_maybe_tagged_trained_oracle(),
        "passage_retrieval": (
            "WITH pg AS (SELECT doc_id, flatten(list_transform("
            " string_split(text, ' ')[1:5], wv -> list_transform("
            " range(1, length('#' || lower(wv) || '#') - 1),"
            " gi -> ('#' || lower(wv) || '#')[gi : gi + 2]))) AS grams"
            " FROM documents),"
            " pc AS (SELECT doc_id, list_transform(range(0, 64), j ->"
            " CAST(len(list_filter(list_transform(grams, g2 -> CAST("
            + _SQL_FNV.format(s="g2") + " % 64 AS BIGINT)), bk -> bk = j))"
            " AS DOUBLE)) AS cv FROM pg),"
            " qg AS (SELECT doc_id AS query_id, flatten(list_transform("
            " string_split(text, ' ')[6:10], wv -> list_transform("
            " range(1, length('#' || lower(wv) || '#') - 1),"
            " gi -> ('#' || lower(wv) || '#')[gi : gi + 2]))) AS grams"
            " FROM documents WHERE doc_id < 5),"
            " qc AS (SELECT query_id, list_transform(range(0, 64), j ->"
            " CAST(len(list_filter(list_transform(grams, g2 -> CAST("
            + _SQL_FNV.format(s="g2") + " % 64 AS BIGINT)), bk -> bk = j))"
            " AS DOUBLE)) AS qv FROM qg),"
            " s AS (SELECT query_id, doc_id,"
            " ROUND(list_inner_product(cv, qv) / (sqrt(list_inner_product("
            " cv, cv)) * sqrt(list_inner_product(qv, qv))), 6) AS cosine"
            " FROM pc CROSS JOIN qc),"
            " r AS (SELECT query_id, doc_id, cosine, ROW_NUMBER() OVER ("
            " PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rank"
            " FROM s)"
            " SELECT CAST(query_id AS BIGINT) AS query_id,"
            " CAST(rank AS BIGINT) AS rank, CAST(doc_id AS BIGINT)"
            " AS doc_id, cosine FROM r WHERE rank <= 5"),
        "contamination": (
            "WITH src AS (SELECT doc_id + 400 AS doc_id2,"
            " array_to_string(string_split(text, ' ')[1:12], ' ')"
            " AS prefix FROM documents WHERE doc_id < 100),"
            " test AS (SELECT d.doc_id, prefix || ' ' ||"
            " COALESCE(array_to_string(string_split(d.text, ' ')"
            " [13:len(string_split(d.text, ' '))], ' '), '') AS text"
            " FROM documents d JOIN src ON d.doc_id = doc_id2"
            " WHERE d.doc_id >= 400),"
            " trw AS (SELECT list_filter(string_split_regex(lower(text),"
            r" '\s+'), x -> x <> '') AS ws"
            " FROM documents WHERE doc_id < 400),"
            " trh AS (SELECT " + _sql_word_hashes("ws") + " AS wh FROM trw),"
            " th AS (SELECT DISTINCT unnest("
            + _sql_shingles("wh", 8) + ") AS h FROM trh),"
            " tew AS (SELECT doc_id AS test_id,"
            " list_filter(string_split_regex(lower(text),"
            r" '\s+'), x -> x <> '') AS ws FROM test),"
            " teh AS (SELECT test_id, " + _sql_word_hashes("ws")
            + " AS wh FROM tew),"
            " te AS (SELECT test_id, unnest(list_distinct("
            + _sql_shingles("wh", 8) + ")) AS h FROM teh)"
            " SELECT test_id, COUNT(*) AS n_contaminated"
            " FROM te JOIN th USING (h) GROUP BY test_id"),
        "unigram_surprisal": (
            "WITH w AS (SELECT doc_id, unnest(string_split(lower(text),"
            " ' ')) AS wd FROM documents),"
            " c AS (SELECT wd, COUNT(*) AS c FROM w GROUP BY wd),"
            " t AS (SELECT COUNT(*) AS total FROM w)"
            " SELECT doc_id, ROUND(AVG(-ln(c / CAST(total AS DOUBLE))), 6)"
            " AS mean_surprisal, COUNT(*) AS n_words"
            " FROM w JOIN c USING (wd) CROSS JOIN t GROUP BY doc_id"),
        "sentence_embeddings": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ')[1:5] AS ws"
            " FROM documents),"
            " g AS (SELECT doc_id, flatten(list_transform(ws, wv ->"
            " CASE WHEN length('#' || lower(wv) || '#') < 3"
            " THEN ['#' || lower(wv) || '#']"
            " ELSE list_transform(range(1, length('#' || lower(wv) || '#')"
            " - 1), gi -> ('#' || lower(wv) || '#')[gi : gi + 2]) END))"
            " AS grams FROM w),"
            " b AS (SELECT doc_id, list_transform(grams, g2 -> CAST("
            + _SQL_FNV.format(s="g2") + " % 64 AS BIGINT)) AS bks FROM g),"
            " c AS (SELECT doc_id, list_transform(range(0, 64), j ->"
            " CAST(len(list_filter(bks, bk -> bk = j)) AS DOUBLE))"
            " AS cnts FROM b),"
            " n AS (SELECT doc_id, cnts, sqrt(list_sum(list_transform(cnts,"
            " x -> x * x))) AS nrm FROM c)"
            " SELECT doc_id, ROUND(cnts[1] / nrm, 6) AS c0,"
            " ROUND(cnts[2] / nrm, 6) AS c1, ROUND(cnts[3] / nrm, 6) AS c2,"
            " ROUND(cnts[4] / nrm, 6) AS c3 FROM n"),
        "simhash_near_dups": (
            "WITH base AS (SELECT doc_id, list_filter(string_split_regex("
            r"lower(text), '\s+'), x -> x <> '')"
            " AS wa FROM documents WHERE doc_id < 200),"
            " wl AS (SELECT doc_id, wa,"
            " wa[1 : greatest(len(wa) - 1, 1)] AS wb FROM base),"
            " hs AS (SELECT doc_id, " + _sql_word_hashes("wa") + " AS ha, "
            + _sql_word_hashes("wb") + " AS hb FROM wl),"
            " sg AS (SELECT doc_id, " + _sql_simhash("ha") + " AS sa, "
            + _sql_simhash("hb") + " AS sb FROM hs),"
            " hm AS (SELECT doc_id, " + _sql_hamming("sa", "sb")
            + " AS hamming FROM sg)"
            " SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,"
            " CAST(hamming AS INTEGER) AS hamming FROM hm"
            " WHERE hamming <= 3"),
        "minhash_near_dups": (
            "WITH base AS (SELECT doc_id, list_filter(string_split_regex("
            r"lower(text), '\s+'), x -> x <> '')"
            " AS wa FROM documents WHERE doc_id < 200),"
            " wl AS (SELECT doc_id, wa,"
            " wa[1 : greatest(len(wa) - 2, 1)] AS wb FROM base),"
            " hs AS (SELECT doc_id, " + _sql_word_hashes("wa") + " AS ha, "
            + _sql_word_hashes("wb") + " AS hb FROM wl),"
            " sh AS (SELECT doc_id, " + _sql_shingles("ha") + " AS sha, "
            + _sql_shingles("hb") + " AS shb FROM hs),"
            " sg AS (SELECT doc_id, " + _sql_minhash_sig("sha") + " AS siga, "
            + _sql_minhash_sig("shb") + " AS sigb FROM sh)"
            " SELECT doc_id AS id_a, doc_id + 1000000 AS id_b FROM sg"
            " WHERE " + _sql_bands_share("siga", "sigb")),
        "embedding_near_dups": (
            "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
            " FROM embeddings WHERE vec_id < 200),"
            " pp AS (SELECT vec_id, v, list_transform(v, x -> x * 1.0001)"
            " AS v2 FROM e),"
            " b AS (SELECT vec_id, v, v2,"
            " list_transform(range(0, 3), band -> list_sum(list_transform("
            " range(0, 4), pj -> CASE WHEN list_inner_product("
            " (" + _sql_srp_planes() + ")[band * 4 + pj + 1], v) > 0"
            " THEN 1 << pj ELSE 0 END))) AS ca,"
            " list_transform(range(0, 3), band -> list_sum(list_transform("
            " range(0, 4), pj -> CASE WHEN list_inner_product("
            " (" + _sql_srp_planes() + ")[band * 4 + pj + 1], v2) > 0"
            " THEN 1 << pj ELSE 0 END))) AS cb FROM pp)"
            " SELECT vec_id AS id_a, vec_id + 1000000 AS id_b FROM b"
            " WHERE len(list_filter(range(0, 3), band ->"
            " ca[band + 1] = cb[band + 1])) > 0"
            " AND list_cosine_similarity(v, v2) >= 0.999"),
        "curated_turns": (
            "WITH ex AS (SELECT doc_id,"
            " CASE doc_id % 4 WHEN 0 THEN text"
            " WHEN 1 THEN text || ' end. Stop now.'"
            " WHEN 2 THEN 'Header line ' || text ELSE text END AS xt,"
            " CASE WHEN doc_id % 7 = 0 THEN 'conv-skew'"
            " ELSE 'conv-' || CAST(doc_id // 8 AS VARCHAR) END AS conv_id,"
            " CAST(doc_id AS INTEGER) AS turn_idx"
            " FROM documents WHERE doc_id < 200),"
            " q AS (SELECT * FROM ex"
            " WHERE len(string_split(xt, ' ')) >= 5"
            " AND (length(xt) - length(regexp_replace(xt, '[0-9]', '', 'g')))"
            " / CAST(length(xt) AS DOUBLE) <= 0.3),"
            " ed AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY xt"
            " ORDER BY conv_id, turn_idx) AS ern FROM q),"
            " sv AS (SELECT conv_id, turn_idx, xt,"
            " conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 12, '0')"
            " AS sk FROM ed WHERE ern = 1),"
            " wl AS (SELECT sk, conv_id, turn_idx,"
            " list_filter(string_split_regex(lower(xt),"
            r" '\s+'), x -> x <> '') AS ws FROM sv),"
            " hs AS (SELECT sk, conv_id, turn_idx, "
            + _sql_word_hashes("ws") + " AS wh FROM wl),"
            " sh AS (SELECT sk, conv_id, turn_idx, "
            + _sql_shingles("wh") + " AS sgl FROM hs),"
            " sg AS (SELECT sk, conv_id, turn_idx, "
            + _sql_minhash_sig("sgl") + " AS sig FROM sh),"
            " losers AS (SELECT DISTINCT r.sk FROM sg l JOIN sg r"
            " ON l.sk < r.sk AND " + _sql_bands_share("l.sig", "r.sig") + ")"
            " SELECT conv_id, turn_idx FROM sg"
            " WHERE sk NOT IN (SELECT sk FROM losers)"),
    }


if __name__ == "__main__":
    from texoo_spark.session import get_spark
    spark = get_spark("texoo-entry-smoke")
    df = entry(spark)
    print("entry rows:", df.count())
    df.show(5, truncate=60)
