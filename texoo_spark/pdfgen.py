"""Deterministic minimal PDF writer (stdlib-only; fixture + query input).

Emits real, spec-conformant PDF 1.4 bytes: catalog/pages/page objects, a
Type1 Helvetica font resource, and per-page content streams using the text
operators (BT/ET, Tf, TL, Td, T*, Tj), optionally FlateDecode-compressed
(zlib IS the PDF Flate filter), with a correct xref table and trailer.

The writer is the hermetic stand-in for "documents arrived as PDFs": the
engine's decode lane (pdfops.decode_pdf_bytes) must read these bytes back
through the real grammar — object graph, stream filters, content-stream
tokenizer, text-matrix tracking — exactly as it would any simple text PDF.
Layout is caller-controlled (explicit lines, paragraph gaps, one or two
columns), so expected extraction output is computable independently.

Reference scope: TeXoo has no PDF reader; this lane is net-new per the
BASELINE north rule ("PDF/layout parse"). Geometry model: letter page
(612x792), baseline starts at y=720, line leading LEADING, paragraph
advance PARA_ADVANCE, column x anchors COL_X.
"""

from __future__ import annotations

import zlib

PAGE_W = 612
PAGE_H = 792
TOP_Y = 720
LEADING = 12
PARA_ADVANCE = 30
FONT_SIZE = 10
COL_X = (72, 320)  # left / right column baseline anchors


def _esc(s: str) -> bytes:
    """PDF literal-string escaping (ISO 32000 7.3.4.2)."""
    out = []
    for ch in s:
        if ch in "\\()":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    return "".join(out).encode("latin-1", "replace")


def _column_ops(paragraphs: list[list[str]], x: int) -> list[bytes]:
    """Text operators for one column of paragraphs at column anchor x."""
    ops: list[bytes] = [b"BT", b"/F1 %d Tf" % FONT_SIZE, b"%d TL" % LEADING,
                        b"%d %d Td" % (x, TOP_Y)]
    first_line = True
    for pi, lines in enumerate(paragraphs):
        if pi > 0:
            ops.append(b"0 -%d Td" % PARA_ADVANCE)
        for li, line in enumerate(lines):
            if not first_line and li > 0:
                ops.append(b"T*")  # advance one leading down
            first_line = False
            ops.append(b"(" + _esc(line) + b") Tj")
    ops.append(b"ET")
    return ops


def page_content(paragraphs: list[list[str]], two_column: bool) -> bytes:
    """Content stream for one page. ``paragraphs`` is a list of paragraphs,
    each an explicit list of line strings (the caller owns line wrapping,
    which makes expected reading-order text computable). Two-column mode
    splits the paragraph list in half: first half left, second half right —
    reading order (left column top-down, then right) is unchanged."""
    if two_column and len(paragraphs) >= 2:
        mid = (len(paragraphs) + 1) // 2
        ops = (_column_ops(paragraphs[:mid], COL_X[0])
               + _column_ops(paragraphs[mid:], COL_X[1]))
    else:
        ops = _column_ops(paragraphs, COL_X[0])
    return b"\n".join(ops) + b"\n"


def make_pdf(pages: list[list[list[str]]], two_column: bool = False,
             compress: bool = True) -> bytes:
    """Build a complete PDF. ``pages[p]`` = paragraphs of page p, each a
    list of line strings. Returns the full file bytes (header, objects,
    xref, trailer)."""
    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page:
    # (4+2i) page object, (5+2i) its content stream
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        3: (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>"),
    }
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objs[2] = (b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>"
               % n_pages)
    for i, paragraphs in enumerate(pages):
        page_num, cont_num = 4 + 2 * i, 5 + 2 * i
        objs[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]"
            b" /Resources << /Font << /F1 3 0 R >> >>"
            b" /Contents %d 0 R >>" % (PAGE_W, PAGE_H, cont_num))
        data = page_content(paragraphs, two_column)
        if compress:
            data = zlib.compress(data, 6)
            objs[cont_num] = (b"<< /Length %d /Filter /FlateDecode >>"
                              b"\nstream\n" % len(data)
                              + data + b"\nendstream")
        else:
            objs[cont_num] = (b"<< /Length %d >>\nstream\n" % len(data)
                              + data + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_obj = max(objs) + 1
    out += b"xref\n0 %d\n" % n_obj
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n_obj, xref_at))
    return bytes(out)


def wrap_words(words: list[str], per_line: int,
               per_para: int) -> list[list[str]]:
    """Deterministic wrapping: ``per_para`` words per paragraph,
    ``per_line`` words per line — the geometry the oracle can replicate
    (expected text = per-paragraph word joins, paragraphs by newline)."""
    paragraphs: list[list[str]] = []
    for p0 in range(0, len(words), per_para):
        chunk = words[p0:p0 + per_para]
        paragraphs.append([" ".join(chunk[i:i + per_line])
                           for i in range(0, len(chunk), per_line)])
    return paragraphs
