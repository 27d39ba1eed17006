"""Additional Arrow-batched pandas UDFs (HTML, PDF, spans, quality)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

from texoo_spark.schema import HTML_SCHEMA, MATCH_SCHEMA


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


@pandas_udf(LongType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    """Rolling-hash document fingerprint (winnowing-style), as signed
    int64 — vectorized batch FNV (bit-identical to the scalar path)."""
    from texoo_spark.textquality import document_fingerprints_batch
    return pd.Series([_signed64(v)
                      for v in document_fingerprints_batch(texts)])


@pandas_udf(HTML_SCHEMA)
def strip_html_udf(texts: pd.Series) -> pd.DataFrame:
    from texoo_spark.html import strip_html
    return pd.DataFrame([strip_html(t or "") for t in texts])


@pandas_udf(StringType())
def strip_html_text_udf(texts: pd.Series) -> pd.Series:
    from texoo_spark.html import strip_html
    return pd.Series([strip_html(t or "")["main_text"] for t in texts],
                     dtype="object")


@pandas_udf(StringType())
def pdf_layout_text_udf(boxes: pd.Series) -> pd.Series:
    """Reading-order text from an array<struct<page,x0,y0,x1,y1,text>> column."""
    from texoo_spark.pdfops import WordBox, layout_text
    out = []
    for rows in boxes:
        if rows is None:
            out.append("")
            continue
        words = [WordBox(int(r["page"]), float(r["x0"]), float(r["y0"]),
                         float(r["x1"]), float(r["y1"]), str(r["text"]))
                 for r in rows]
        out.append(layout_text(words))
    return pd.Series(out, dtype="object")


def make_gazetteer_count_udf(terms: list[str],
                             case_strategy: str = "LOWERCASE"):
    """Fused extract+match: segments the raw text AND counts boundary-
    aligned gazetteer matches in ONE Python hop (one ArrowEvalPython node
    instead of extract-then-match)."""
    from texoo_spark.spans import GazetteerMatcher
    from texoo_spark.textops import DISCARD, extract_arrays_lean
    matcher = GazetteerMatcher(terms, case_strategy)

    @pandas_udf(LongType())
    def gazetteer_count_udf(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            _, begins, ends, _sents, ext = extract_arrays_lean(
                text or "", DISCARD)
            out.append(len(matcher.match(ext, begins, ends)))
        return pd.Series(out)

    return gazetteer_count_udf


def make_gazetteer_udf(terms: list[str], case_strategy: str = "LOWERCASE"):
    """Gazetteer matcher UDF factory: the term automaton is built once per
    executor (broadcast-equivalent closure), applied per Arrow batch.

    Matches the reference MatchingAnnotator semantics (longest match,
    non-overlapping, token-boundary aligned); see spans.py.
    """
    from texoo_spark.spans import GazetteerMatcher
    matcher = GazetteerMatcher(terms, case_strategy)

    @pandas_udf(MATCH_SCHEMA)
    def gazetteer_udf(texts: pd.Series, tok_begins: pd.Series,
                      tok_ends: pd.Series) -> pd.DataFrame:
        rows = {"m_begin": [], "m_end": [], "m_label": []}
        for text, tbs, tes in zip(texts, tok_begins, tok_ends):
            matches = matcher.match(
                text or "",
                list(tbs) if tbs is not None else [],
                list(tes) if tes is not None else [])
            rows["m_begin"].append([m[0] for m in matches])
            rows["m_end"].append([m[1] for m in matches])
            rows["m_label"].append([m[2] for m in matches])
        return pd.DataFrame(rows)

    return gazetteer_udf
