"""Pipeline facade: composable DataFrame -> DataFrame annotator stages.

Spark equivalent of the reference's Annotator/AnnotatorFactory component
registry (texoo-core/.../annotator/Annotator.java:66-107,
AnnotatorFactory.java): an Annotator is a named stage with provenance; a
Pipeline composes stages and records lineage (stage names + code version)
for the manifest rows (Provenance.java equivalent).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from texoo_spark.pipeline import CODE_VERSION


@dataclass
class Annotator:
    """A named DataFrame transformation stage."""
    name: str
    fn: Callable[[DataFrame], DataFrame]
    params: dict = field(default_factory=dict)

    def annotate(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


@dataclass
class Pipeline:
    """Ordered composition of annotators with provenance."""
    stages: list[Annotator] = field(default_factory=list)

    def add(self, name: str, fn: Callable[[DataFrame], DataFrame],
            **params) -> "Pipeline":
        self.stages.append(Annotator(name, fn, params))
        return self

    def run(self, df: DataFrame) -> DataFrame:
        for stage in self.stages:
            df = stage.annotate(df)
        return df

    def provenance(self) -> dict:
        return {
            "code_version": CODE_VERSION,
            "stages": [{"name": s.name, "params": s.params}
                       for s in self.stages],
        }


def extraction_pipeline(newlines: str = "DISCARD",
                        strip_html: bool = True) -> Pipeline:
    """The standard transcript extraction pipeline (Annotator.annotate
    equivalent for the hot path, SURVEY.md §3.1)."""
    from texoo_spark import textops
    from texoo_spark.pipeline import extract_turns

    return Pipeline().add(
        "extract",
        lambda df: extract_turns(df, newlines=newlines,
                                 strip_html_first=strip_html),
        newlines=newlines, strip_html=strip_html)


def route_by_language(df: DataFrame,
                      annotators: dict[str, Annotator],
                      default_lang: str = "en",
                      lang_col: str = "lang") -> DataFrame:
    """A3 (GenericMentionAnnotator.java:64-78): dispatch rows to a
    per-language annotator and union the results. Missing languages fall
    back to the default annotator."""
    from pyspark.sql import functions as F
    default = annotators[default_lang]
    known = list(annotators)
    parts = [ann.annotate(df.filter(F.col(lang_col) == lang))
             for lang, ann in annotators.items()]
    parts.append(default.annotate(df.filter(~F.col(lang_col).isin(known)
                                            | F.col(lang_col).isNull())))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def gazetteer_annotator(terms: list[str],
                        case_strategy: str = "CASE_SENSITIVE",
                        label: str = "GENERIC") -> Annotator:
    """MatchingAnnotator-equivalent stage: adds m_begin/m_end/m_label
    arrays of SILVER mention spans."""
    from pyspark.sql import functions as F
    from texoo_spark.udfs import make_gazetteer_udf
    gaz = make_gazetteer_udf(terms, case_strategy)

    def fn(df: DataFrame) -> DataFrame:
        return (df.withColumn("m", gaz(F.col("extracted_text"),
                                       F.col("tok_begin"),
                                       F.col("tok_end")))
                .select("*", "m.*").drop("m"))

    return Annotator("gazetteer", fn,
                     {"terms": len(terms), "case_strategy": case_strategy,
                      "label": label})
