"""Dataset readers (SURVEY.md §2.1 S1-S10), fixture-format ingestion.

Pure-Python parsers returning row dicts (testable without Spark) plus Spark
wrappers. At scale the primary source is the transcripts/parquet table; these
readers exist for reference-corpus parity (CoNLL, WikiSection, Wiki727, Choi).
"""

from __future__ import annotations

import json
import re

from texoo_spark.spans import decode_bio2
from texoo_spark.textops import (
    SKIP_SPACE_AFTER, SKIP_SPACE_BEFORE, Token, document_from_tokens,
)

# ---------------------------------------------------------------------------
# CoNLL token-per-line reader (S3)
# ref: texoo-entity-recognition/.../reader/CoNLLDatasetReader.java:133-254
# ---------------------------------------------------------------------------

_DOCSTART = "-DOCSTART-"


def _conll_tag(label: str, prev_type: str | None,
               forced_type: str | None = None) -> tuple[str, str | None]:
    """(bio2, type); I with a different type than previous becomes B
    (java:231-252)."""
    parts = label.split("-")
    tag = parts[0]
    typ = forced_type or (parts[1] if len(parts) > 1 else "GENERIC")
    if tag == "O":
        return "O", None
    if tag == "B":
        return "B", typ
    if tag == "I":
        return ("I", typ) if typ == prev_type else ("B", typ)
    return "O", None


def read_conll(lines, tag_index: int = -1, forced_type: str | None = None):
    """Parse CoNLL lines into documents.

    Returns list of dicts {tokens: [Token], bio2: [str], types: [str|None],
    doc: ExtractedDoc, mentions: [(begin, end, type)]}.
    Whitespace is re-guessed via the skip-space lists; blank lines emit a
    newline token; -DOCSTART- splits documents (java:133-203)."""
    docs = []
    tokens: list[Token] = []
    tags: list[str] = []
    types: list[str | None] = []
    cursor = 0
    last = ""
    prev_type: str | None = None

    def end_document():
        nonlocal tokens, tags, types, cursor, last, prev_type
        if tokens:
            docs.append(_assemble_conll_doc(tokens, tags, types))
        tokens, tags, types = [], [], []
        cursor, last, prev_type = 0, "", None

    for raw in lines:
        line = raw.strip()
        if line.startswith(_DOCSTART):
            end_document()
        elif not line:
            if tokens:
                tokens.append(Token("\n", cursor, cursor + 1))
                tags.append("O")
                types.append(None)
                cursor += 1
                last = "\n"
            prev_type = None
        else:
            csv = line.split()
            text = csv[0]
            pos = tag_index if tag_index >= 0 else len(csv) - 1
            bio2, typ = _conll_tag(csv[pos], prev_type, forced_type)
            b, e = cursor, cursor + len(text)
            if last not in SKIP_SPACE_AFTER and text not in SKIP_SPACE_BEFORE:
                b, e = b + 1, e + 1
            tokens.append(Token(text, b, e))
            tags.append(bio2)
            types.append(typ)
            cursor = e
            prev_type = typ
            last = text
    end_document()
    return docs


def _assemble_conll_doc(tokens, tags, types):
    doc = document_from_tokens(tokens)
    # re-align tags to the assembled token list (newline tokens are dropped
    # by sentence assembly)
    kept = {(t.begin, t.end): i for i, t in enumerate(tokens)}
    doc_tags, doc_types, sent_bounds = [], [], []
    for s in doc.sentences:
        for t in doc.tokens[s.tok_start:s.tok_end]:
            i = kept[(t.begin, t.end)]
            doc_tags.append(tags[i])
            doc_types.append(types[i] or "")
        sent_bounds.append(s.tok_end)
    spans = decode_bio2(doc_tags, doc_types, None, sent_bounds)
    mentions = [(doc.tokens[s].begin, doc.tokens[e - 1].end, typ)
                for s, e, typ, _ in spans]
    return {"doc": doc, "bio2": doc_tags, "types": doc_types,
            "mentions": mentions}


# ---------------------------------------------------------------------------
# WikiSection JSON reader (S4)
# ref: texoo-sector/.../reader/WikiSectionReader.java:31-45
# ---------------------------------------------------------------------------

def read_wikisection(json_text: str):
    """Parse WikiSection-format JSON: all annotations become GOLD with
    confidence 1.0. Returns list of dicts with id/type/title/text/sections."""
    data = json.loads(json_text)
    if isinstance(data, dict):
        data = [data]
    out = []
    for d in data:
        anns = []
        for a in d.get("annotations", []):
            begin = int(a.get("begin", 0))
            length = int(a.get("length", 0))
            anns.append({
                "begin": begin, "end": begin + length,
                "heading": a.get("sectionHeading", ""),
                "label": a.get("sectionLabel", ""),
                "source": "GOLD", "confidence": 1.0,
            })
        out.append({"id": d.get("id"), "type": d.get("type"),
                    "title": d.get("title"), "abstract": d.get("abstract"),
                    "text": d.get("text", ""), "sections": anns})
    return out


# ---------------------------------------------------------------------------
# Wiki727 / Choi segmentation corpora readers (S5, S6)
# ref: texoo-sector/.../reader/Wiki727Reader.java:29-120, ChoiDatasetReader.java
# ---------------------------------------------------------------------------

_WIKI727_SECTION = re.compile(r"^========,(\d+),(.+?)\.$")
_CHOI_SEPARATOR = "=========="
_MARKUP = re.compile(r"\*\*\*(LIST|formula|codice)\*\*\*")


def read_wiki727(text: str, section_level: int = 2):
    """Parse Wiki727-format text into (heading, section_text) pairs at the
    requested heading depth; heading paths join with ' | '."""
    sections = []
    heading = ""
    buf: list[str] = []

    def flush():
        body = "".join(buf)
        if body.strip():
            sections.append({"heading": heading, "text": body})

    for line in text.split("\n"):
        m = _WIKI727_SECTION.match(line)
        if line.startswith("=====") and m:
            level = int(m.group(1))
            h = m.group(2)
            if section_level == 0 or level <= section_level:
                flush()
                split = 0
                lvl = level
                while lvl - 1 > 1:
                    lvl -= 1
                    split = heading.find(" | ", split + 1)
                if split > 0:
                    heading = heading[:split] + " | "
                elif split < 0:
                    heading = heading + " | "
                else:
                    heading = ""
                heading += h
                buf = []
        else:
            cleaned = _MARKUP.sub("", line)
            if cleaned.strip():
                if buf:
                    buf.append(" ")
                buf.append(cleaned + "\n")
    flush()
    return sections


def read_choi(text: str):
    """Choi corpus: segments separated by ========== lines."""
    segments = []
    buf: list[str] = []
    for line in text.split("\n"):
        if line.strip().startswith(_CHOI_SEPARATOR):
            body = "\n".join(buf).strip()
            if body:
                segments.append(body)
            buf = []
        else:
            buf.append(line)
    body = "\n".join(buf).strip()
    if body:
        segments.append(body)
    return segments


# ---------------------------------------------------------------------------
# WNED entity-linking benchmark reader (S9)
# ref: texoo-entity-linking/.../nel/reader/WNEDDataset.java
# ---------------------------------------------------------------------------

def read_wned_annotations(xml_text: str):
    """Parse a WNED dataset XML into per-document linked-mention rows:
    {doc_name, mentions: [(surface, wiki_name, offset, length)]}.
    Raw document texts live in sibling files (resolved by the caller)."""
    import xml.etree.ElementTree as ET
    root = ET.fromstring(xml_text)
    out = []
    for doc in root.iter("document"):
        mentions = []
        for ann in doc.iter("annotation"):
            def _text(tag):
                el = ann.find(tag)
                return el.text if el is not None else None
            mentions.append({
                "surface": _text("mention"),
                "wiki_name": _text("wikiName"),
                "offset": int(_text("offset") or 0),
                "length": int(_text("length") or 0),
            })
        out.append({"doc_name": doc.get("docName"), "mentions": mentions})
    return out


# ---------------------------------------------------------------------------
# Spark wrappers
# ---------------------------------------------------------------------------

def read_raw_text_documents(spark, path_glob: str):
    """S1/S2: whole-file text documents with filename provenance."""
    from pyspark.sql import functions as F
    return (spark.read.text(path_glob, wholetext=True)
            .select(F.input_file_name().alias("source"),
                    F.col("value").alias("text"))
            .orderBy("source"))


def read_wikisection_spark(spark, path: str):
    from pyspark.sql import functions as F
    from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                                   StructField, StructType)
    schema = StructType([
        StructField("id", StringType()),
        StructField("type", StringType()),
        StructField("title", StringType()),
        StructField("abstract", StringType()),
        StructField("text", StringType()),
        StructField("annotations", ArrayType(StructType([
            StructField("class", StringType()),
            StructField("begin", IntegerType()),
            StructField("length", IntegerType()),
            StructField("sectionHeading", StringType()),
            StructField("sectionLabel", StringType()),
        ]))),
    ])
    df = spark.read.schema(schema).json(path)
    return df.select(
        "id", "type", "title", "text",
        F.transform("annotations", lambda a: F.struct(
            a["begin"].alias("begin"),
            (a["begin"] + a["length"]).alias("end"),
            a["sectionHeading"].alias("heading"),
            a["sectionLabel"].alias("label"),
            F.lit("GOLD").alias("source"),
            F.lit(1.0).alias("confidence"))).alias("sections"))


# ---------------------------------------------------------------------------
# MultiSeg reader (S7)
# ref: texoo-sector/.../reader/MultiSegReader.java:45-112 (line-range
# sections from a sibling .label file; Titov "Multi-document topic
# segmentation", CIKM '10)
# ---------------------------------------------------------------------------

def parse_multiseg_label(label_text: str, doc_num: int
                         ) -> tuple[set[int], set[int]]:
    """Section start/end line sets for one document from a .label file.

    Label line format: `topicLabel docId::start-end docId::start-end ...`
    (MultiSegReader.readSectionsFromLabel, java:139-167)."""
    starts: set[int] = set()
    ends: set[int] = set()
    for line in (label_text or "").splitlines():
        toks = [t for t in line.split(" ") if t]
        for token in toks[1:]:
            did, pts = token.split("::")
            s, e = pts.split("-")
            if int(did) == doc_num:
                starts.add(int(s))
                ends.add(int(e))
    return starts, ends


def read_multiseg(doc_text: str, label_text: str, doc_num: int):
    """Parse one MultiSeg document (one sentence per line, pre-tokenized)
    against its label file: returns [{heading, sentences: [reconstructed
    sentence texts]}] in emission order (heading = running section index).

    Mirrors MultiSegReader.readDocumentFromFile java:76-103: text resets at
    a start line, a section is emitted at an end line (skipping
    whitespace-only sections), lines outside any [start, end] range are
    dropped; each line becomes one sentence via fromTokenizedText (the
    paper's paragraph-per-line convention, java:116-122)."""
    from texoo_spark.textops import document_from_tokenized_text
    starts, ends = parse_multiseg_label(label_text, doc_num)
    sections = []
    buf: list[str] = []
    n = 0
    for i, line in enumerate((doc_text or "").splitlines()):
        if i in starts:
            buf = []
        buf.append(line)
        if i in ends:
            if "\n".join(buf).strip():
                sentences = [document_from_tokenized_text(ln.strip()).text
                             for ln in buf]
                sections.append({"heading": str(n), "sentences": sentences})
                n += 1
            buf = []
    return sections


# ---------------------------------------------------------------------------
# WikiCities reader (S8)
# ref: texoo-sector/.../reader/WikiCitiesReader.java:47-157 (Chen et al.
# 2009 "Global models of document structure using latent permutations")
# ---------------------------------------------------------------------------

_WIKICITIES_LINE = re.compile(r"^(\d+),(\d+),(.*)$")
_TOPLEVEL = "TOP-LEVEL SEGMENT"


def read_wikicities(lines, skip_top_level: bool = True):
    """Parse WikiCities `docNo,sentenceNo,headingText` lines into
    [{id, sections: [{heading, label, text}]}].

    The dataset fuses heading and sentence without a delimiter
    (WikiCitiesReader.java:36 attempts `(.+?)(.+?)$`, which degenerates to a
    one-char heading); we implement the evident intent: the heading is the
    TOP-LEVEL SEGMENT prefix when present, else empty. Document boundaries
    at sentenceNo == 1, section boundaries at heading changes, sentences
    joined with ' .' appended (java:82-121), heading lowercased with
    TOP-LEVEL mapped to 'preface' and label = heading spaces->underscores
    (java:141-152); empty documents are dropped."""
    docs = []
    doc_id = None
    sections: list[dict] = []
    cur: list[str] = []
    heading = ""

    def flush_section():
        nonlocal cur
        text = " ".join(cur)
        if text.strip():
            head = "preface" if heading == _TOPLEVEL else \
                heading.strip().lower()
            sections.append({"heading": head,
                             "label": re.sub(r"\s+", "_", head),
                             "text": text})
        cur = []

    def flush_doc():
        nonlocal sections
        flush_section()
        if sections:
            docs.append({"id": doc_id, "sections": sections})
        sections = []

    for raw in lines:
        m = _WIKICITIES_LINE.match(raw.rstrip("\n"))
        if not m:
            continue
        dno, sno, body = m.group(1), int(m.group(2)), m.group(3)
        if body.startswith(_TOPLEVEL):
            line_heading, sentence = _TOPLEVEL, body[len(_TOPLEVEL):]
        else:
            line_heading, sentence = "", body
        if sno == 1:
            flush_doc()
            doc_id = dno
            heading = ""
        if skip_top_level and line_heading == _TOPLEVEL:
            continue
        if line_heading != heading:
            flush_section()
            heading = line_heading
        cur.append(sentence + " .")
    flush_doc()
    return docs
