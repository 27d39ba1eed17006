"""Conversation-level operators: offset rebasing and span joins.

- rebase_turn_offsets: per-turn char offsets -> conversation space, the
  Document.append / addSentence offset algebra (shift by end+1,
  ref: texoo-core/.../model/Document.java:198-242) expressed as a window
  cumulative sum — no UDF, whole-stage codegen.
- max_overlap_join (R3): for each probe span, the candidate with the
  largest char overlap (AnnotationHelpers.java:56-65).
- span_zip (R4): pair each span with its enclosing annotation
  (AnnotationHelpers.getSpanAnnotationsMap, java:86-116).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def rebase_turn_offsets(turns: DataFrame,
                        text_col: str = "extracted_text") -> DataFrame:
    """Add conv_begin/conv_end: the turn's char range inside the
    whole-conversation text (turns joined by one separator char, mirroring
    Document.append's end+1 shift)."""
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    prev = F.coalesce(F.sum(F.length(F.col(text_col)) + 1).over(w), F.lit(0))
    return (turns
            .withColumn("conv_begin", prev.cast("long"))
            .withColumn("conv_end",
                        (prev + F.length(F.col(text_col))).cast("long")))


def max_overlap_join(probes: DataFrame, candidates: DataFrame,
                     keys: list[str]) -> DataFrame:
    """R3: per probe span, the candidate span with largest char overlap.

    probes(keys..., p_begin, p_end), candidates(keys..., c_begin, c_end).
    Range join on overlap within the same keys, then a window keeps the
    best candidate (largest overlap, earliest begin as tiebreak)."""
    overlap = (F.least(F.col("p_end"), F.col("c_end"))
               - F.greatest(F.col("p_begin"), F.col("c_begin")))
    joined = (probes.join(candidates, keys, "left")
              .withColumn("overlap", overlap)
              .filter(F.col("overlap") > 0))
    w = (Window.partitionBy(*keys, "p_begin", "p_end")
         .orderBy(F.desc("overlap"), F.col("c_begin")))
    return (joined.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))


def span_zip(spans: DataFrame, annotations: DataFrame,
             keys: list[str]) -> DataFrame:
    """R4: pair each span with the annotation enclosing it (assumes
    non-overlapping annotations, like the reference's merge-walk)."""
    enclosed = ((F.col("s_begin") >= F.col("a_begin"))
                & (F.col("s_end") <= F.col("a_end")))
    return (spans.join(annotations, keys, "left")
            .filter(enclosed | F.col("a_begin").isNull()))
