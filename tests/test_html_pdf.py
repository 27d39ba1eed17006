"""HTML boilerplate strip + PDF layout reconstruction fixtures.

Construction-based (SURVEY.md §2.7 / FIXTURES.md F8): boilerplate is
generated around known main-content paragraphs, so the expected main text is
exact by construction. PDF fixtures lay out known text into word boxes.
"""

import pytest

from texoo_spark.html import classify_blocks, segment_blocks, strip_html
from texoo_spark.langid import detect_language
from texoo_spark.pdfops import WordBox, decode_pdf_bytes, layout_text
from texoo_spark.textops import DISCARD, extract_document

PARA1 = ("Several specific diagnostic criteria can be used to diagnose "
         "vascular dementia, including the DSM-IV criteria and the ICD-10 "
         "criteria from the National Institute.")
PARA2 = ("The recommended investigations for cognitive impairment include "
         "blood tests, chest X-Ray, ECG, and neuroimaging with a functional "
         "or metabolic sensitivity beyond a simple CT.")


def wrap_html(paras, nav_links=6):
    nav = "".join(f'<li><a href="/p{i}">Link {i}</a></li>'
                  for i in range(nav_links))
    body = "".join(f"<p>{p}</p>" for p in paras)
    return (f"<html><head><title>T</title><style>p{{x}}</style></head><body>"
            f"<nav><ul>{nav}</ul></nav>"
            f"<div id='content'>{body}</div>"
            f"<div class='share'><a href='/s'>Share this page now</a></div>"
            f"<footer><p>Copyright 2024 Example Corp. "
            f"<a href='/imprint'>Imprint</a></p></footer>"
            f"<script>var x = '<p>not text</p>';</script>"
            f"</body></html>")


def test_strip_html_main_content_exact():
    out = strip_html(wrap_html([PARA1, PARA2]))
    assert out["main_text"] == PARA1 + "\n" + PARA2
    assert out["kept_blocks"] == 2


def test_strip_html_drops_nav_footer_links():
    out = strip_html(wrap_html([PARA1]))
    assert "Link" not in out["main_text"]
    assert "Copyright" not in out["main_text"]
    assert "Share" not in out["main_text"]


def test_strip_html_plain_text_passthrough():
    out = strip_html("just plain text, no markup")
    assert out["main_text"] == "just plain text, no markup"


def test_strip_html_entities():
    html = "<html><body><p>" + ("A&amp;B say &quot;hello&quot; to C &lt;3 "
                                "and keep talking for a while longer here") \
        + "</p></body></html>"
    out = strip_html(html)
    assert out["main_text"].startswith('A&B say "hello" to C <3')


def test_strip_html_continuation_blocks():
    # short block between two long kept blocks is kept (continuation rule)
    html = (f"<html><body><p>{PARA1}</p><p>Short but relevant note.</p>"
            f"<p>{PARA2}</p></body></html>")
    out = strip_html(html)
    assert out["main_text"] == f"{PARA1}\nShort but relevant note.\n{PARA2}"


def test_html_then_segmentation_offsets():
    # the extracted text is the contract: segmentation offsets must
    # reconstruct it exactly
    main = strip_html(wrap_html([PARA1, PARA2]))["main_text"]
    doc = extract_document(main, DISCARD)
    assert doc.text == main.replace("\n", " ")
    assert len(doc.sentences) == 2


def test_block_scores():
    blocks = segment_blocks(wrap_html([PARA1]))
    keep = classify_blocks(blocks)
    kept = [b for b, k in zip(blocks, keep) if k]
    assert len(kept) == 1
    assert kept[0].link_density == 0.0


# --- PDF layout ---

def layout_words(lines, page=0, y0=100.0, line_h=12.0, gap=3.0,
                 x0=72.0, char_w=6.0):
    """Place each line's words left-to-right; consecutive lines stacked."""
    boxes = []
    y = y0
    for line in lines:
        if line is None:  # paragraph break: extra gap
            y += 2.5 * (line_h + gap)
            continue
        x = x0
        for w in line.split():
            boxes.append(WordBox(page, x, y, x + char_w * len(w),
                                 y + line_h, w))
            x += char_w * (len(w) + 1)
        y += line_h + gap
    return boxes


def test_pdf_single_column():
    boxes = layout_words(["The quick brown fox", "jumps over the dog"])
    assert layout_text(boxes) == "The quick brown fox jumps over the dog"


def test_pdf_paragraph_break():
    boxes = layout_words(["First paragraph line one", "and line two",
                          None, "Second paragraph starts here"])
    assert layout_text(boxes) == ("First paragraph line one and line two\n"
                                  "Second paragraph starts here")


def test_pdf_two_columns():
    left = layout_words(["Left column first", "left column second",
                         "left column third", "left column fourth"], x0=72.0)
    right = layout_words(["Right column first", "right column second",
                          "right column third", "right column fourth"],
                         x0=400.0)
    text = layout_text(left + right)
    assert text.index("left column fourth") < text.index("Right column first")


def test_pdf_pages_ordered():
    p1 = layout_words(["Page one text here"], page=0)
    p2 = layout_words(["Page two text here"], page=1)
    text = layout_text(p2 + p1)
    assert text == "Page one text here\nPage two text here"


# --- real PDF byte decode (pdfgen writer -> pdfops reader round trip) ---

WORDS16 = [f"word{i:02d}" for i in range(16)]


def _pdf_roundtrip(two_column, compress):
    from texoo_spark.pdfgen import make_pdf, wrap_words
    pdf = make_pdf([wrap_words(WORDS16, per_line=3, per_para=8)],
                   two_column=two_column, compress=compress)
    return layout_text(decode_pdf_bytes(pdf))


EXPECTED16 = (" ".join(WORDS16[:8]) + "\n" + " ".join(WORDS16[8:]))


@pytest.mark.parametrize("two_column", [False, True])
@pytest.mark.parametrize("compress", [False, True])
def test_pdf_roundtrip_exact(two_column, compress):
    assert _pdf_roundtrip(two_column, compress) == EXPECTED16


def test_pdf_roundtrip_multipage():
    from texoo_spark.pdfgen import make_pdf
    pdf = make_pdf([[["page one text"]], [["page two text"]]],
                   compress=True)
    assert layout_text(decode_pdf_bytes(pdf)) == \
        "page one text\npage two text"


def test_pdf_roundtrip_escapes():
    # literal-string escaping: backslash, parens, tab (writer escapes,
    # reader un-escapes)
    from texoo_spark.pdfgen import make_pdf
    pdf = make_pdf([[[r"a\b (c) d"]]], compress=False)
    words = [w.text for w in decode_pdf_bytes(pdf)]
    assert words == ["a\\b", "(c)", "d"]


def test_pdf_decode_hex_and_tj(tmp_path=None):
    # hand-written content exercising <hex>, TJ arrays with kern
    # adjustments, and octal escapes — paths pdfgen doesn't emit
    content = (b"BT /F1 10 Tf 12 TL 72 720 Td "
               b"[<68656c6c6f> -1000 (world)] TJ T* "
               b"(\\110\\151) Tj ET\n")
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R"
           b" /MediaBox [0 0 612 792] /Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(content)).encode() +
           b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
           b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    # TJ -1000 widens the gap by size * 1 pt -> separate words on the
    # baseline; T* drops to the next line, same paragraph
    assert layout_text(decode_pdf_bytes(pdf)) == "hello world Hi"


def test_pdf_decode_indirect_length():
    # /Length as an indirect reference (common in incremental writers)
    content = b"BT /F1 10 Tf 72 720 Td (indirect length works) Tj ET\n"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
           b"endobj\n"
           b"4 0 obj\n<< /Length 5 0 R >>\nstream\n" + content +
           b"\nendstream\nendobj\n"
           b"5 0 obj\n" + str(len(content)).encode() + b"\nendobj\n"
           b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n")
    assert layout_text(decode_pdf_bytes(pdf)) == "indirect length works"


def test_pdf_decode_no_pages_raises():
    with pytest.raises(ValueError):
        decode_pdf_bytes(b"%PDF-1.4")


def test_pdf_decode_encrypted_raises():
    with pytest.raises(NotImplementedError):
        decode_pdf_bytes(b"%PDF-1.4\n1 0 obj\n<< /Encrypt 2 0 R >>\nendobj")


# --- language id ---

def test_langid():
    assert detect_language("The quick brown fox jumps over the lazy dog "
                           "and the cat sat on the mat") == "en"
    assert detect_language("Der Hund ist ein Tier und die Katze ist auch "
                           "ein Tier mit Fell") == "de"
    assert detect_language("") == ""
    assert detect_language("xyzzy qwerty 12345") == ""
