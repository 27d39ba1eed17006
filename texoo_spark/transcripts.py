"""Deterministic synthetic transcript generation (BASELINE input_hint shape).

Builds a (conv_id, turn_idx, role, text, tool, ts) table from the driver's
documents parquet: real text payloads, punctuation/newline/HTML variants
injected deterministically, plus a skewed long conversation to exercise
salting. Used by tests and bench.py; no external data, seed-free (keyed on
doc_id arithmetic only, so the same input yields the same table on any
cluster size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def transcripts_from_documents(docs: DataFrame, copies: int = 1,
                               skew_conv_every: int = 7) -> DataFrame:
    """Expand the documents table into a transcript table.

    - conv_id groups 8 turns; every skew_conv_every-th document instead
      lands in one giant conversation ("conv-skew") to create realistic skew
    - text variants by doc_id % 4: plain / two sentences / newline header /
      HTML-wrapped (boilerplate + main content)
    - copies > 1 replicates rows with distinct conv ids (bench scaling)
    """
    base = docs.select("doc_id", "text")
    if copies > 1:
        base = base.crossJoin(
            F.broadcast(
                docs.sparkSession.range(copies).select(
                    F.col("id").alias("copy"))))
    else:
        base = base.withColumn("copy", F.lit(0))

    uid = (F.col("doc_id") + F.col("copy") * 1_000_000).cast("long")
    variant = F.pmod(F.col("doc_id"), F.lit(4))

    html_text = F.concat(
        F.lit('<html><head><title>t</title></head><body><nav>'
              '<a href="/a">home</a> <a href="/b">about</a> '
              '<a href="/c">contact</a> <a href="/d">more</a></nav>'
              '<div><p>'),
        F.col("text"),
        F.lit('</p></div><footer><a href="/i">imprint</a> legal notice'
              '</footer></body></html>'))

    text = (F.when(variant == 1,
                   F.concat(F.col("text"), F.lit(" end. Stop now.")))
            .when(variant == 2,
                  F.concat(F.lit("Header line"), F.lit("\n"), F.col("text")))
            .when(variant == 3, html_text)
            .otherwise(F.col("text")))

    conv = (F.when(F.pmod(F.col("doc_id"), F.lit(skew_conv_every)) == 0,
                   F.lit("conv-skew"))
            .otherwise(F.concat(F.lit("conv-"),
                                (uid / 8).cast("long").cast("string"))))

    return (base
            .withColumn("conv_id", conv)
            .withColumn("turn_idx", F.pmod(uid, F.lit(100_000)).cast("int"))
            .withColumn("role",
                        F.when(uid % 3 == 0, F.lit("user"))
                        .when(uid % 3 == 1, F.lit("assistant"))
                        .otherwise(F.lit("tool")))
            .withColumn("text", text)
            .withColumn("tool",
                        F.when(uid % 3 == 2, F.lit("browser"))
                        .otherwise(F.lit(None).cast("string")))
            .withColumn("ts", F.timestamp_seconds(
                F.lit(1700000000) + uid * 60))
            .select("conv_id", "turn_idx", "role", "text", "tool", "ts"))
