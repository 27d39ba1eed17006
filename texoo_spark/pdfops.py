"""PDF layout-aware text reconstruction (net-new per BASELINE north star).

The container has no PDF binary decoder, so the decode step (PDF bytes ->
glyph/word boxes) is stubbed (see decode_pdf_bytes). The layout analysis —
the part that determines extraction quality — is real and tested: given a
word-box table (page, x0, y0, x1, y1, text), reconstruct reading order:

1. cluster word boxes into lines by vertical overlap,
2. detect a two-column layout from a persistent x-gap,
3. order lines top-to-bottom within column, columns left-to-right,
4. merge lines into paragraphs at vertical-gap breaks,
5. join: words by ' ', lines in a paragraph by ' ', paragraphs by '\n'
   (so the downstream sentence detector treats them as boundaries).

Deterministic and hermetic; fixtures construct boxes from known text.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class WordBox:
    page: int
    x0: float
    y0: float  # top (y grows downward)
    x1: float
    y1: float
    text: str


def decode_pdf_bytes(data: bytes) -> list[WordBox]:
    """STUB: binary PDF decoding requires a PDF library not present in this
    environment. The Spark-side plumbing (schema, partitioning, UDF batch
    shape) and the layout reconstruction below are real; plug a decoder in
    here on a real cluster."""
    raise NotImplementedError(
        "PDF binary decoding is stubbed in this environment; "
        "provide word boxes directly (see layout_text).")


def _cluster_lines(words: list[WordBox]) -> list[list[WordBox]]:
    """Group word boxes into lines by vertical-center proximity."""
    if not words:
        return []
    words = sorted(words, key=lambda w: ((w.y0 + w.y1) / 2, w.x0))
    heights = sorted(w.y1 - w.y0 for w in words)
    med_h = heights[len(heights) // 2] or 1.0
    lines: list[list[WordBox]] = []
    cur: list[WordBox] = [words[0]]
    cur_mid = (words[0].y0 + words[0].y1) / 2
    for w in words[1:]:
        mid = (w.y0 + w.y1) / 2
        if abs(mid - cur_mid) <= 0.5 * med_h:
            cur.append(w)
            cur_mid = min(cur_mid, mid)  # keep stable anchor
        else:
            lines.append(sorted(cur, key=lambda x: x.x0))
            cur, cur_mid = [w], mid
    lines.append(sorted(cur, key=lambda x: x.x0))
    return lines


def _split_columns(lines: list[list[WordBox]]) -> list[list[list[WordBox]]]:
    """Detect a persistent vertical gutter; return one or two columns."""
    if len(lines) < 4:
        return [lines]
    x_min = min(w.x0 for ln in lines for w in ln)
    x_max = max(w.x1 for ln in lines for w in ln)
    width = x_max - x_min
    if width <= 0:
        return [lines]
    # candidate gutter: midpoint region free of words in >=80% of lines
    best_gap = None
    for frac in (0.5, 0.45, 0.55, 0.4, 0.6):
        gx = x_min + frac * width
        crossing = sum(1 for ln in lines for w in ln if w.x0 < gx < w.x1)
        spanning = sum(1 for ln in lines if any(w.x0 < gx < w.x1 for w in ln))
        if crossing == 0 and spanning == 0:
            left = [[w for w in ln if w.x1 <= gx] for ln in lines]
            right = [[w for w in ln if w.x0 >= gx] for ln in lines]
            n_left = sum(1 for ln in left if ln)
            n_right = sum(1 for ln in right if ln)
            if n_left >= 2 and n_right >= 2:
                best_gap = (left, right)
                break
    if best_gap is None:
        return [lines]
    left, right = best_gap
    return [[ln for ln in left if ln], [ln for ln in right if ln]]


def _paragraphs(lines: list[list[WordBox]]) -> list[str]:
    """Merge ordered lines into paragraphs at vertical-gap breaks."""
    if not lines:
        return []
    texts = [" ".join(w.text for w in ln) for ln in lines]
    tops = [min(w.y0 for w in ln) for ln in lines]
    bots = [max(w.y1 for w in ln) for ln in lines]
    gaps = [tops[i + 1] - bots[i] for i in range(len(lines) - 1)]
    # lower median: the typical intra-paragraph gap (robust when a
    # paragraph break inflates half the gaps)
    med_gap = sorted(gaps)[(len(gaps) - 1) // 2] if gaps else 0.0
    paras: list[list[str]] = [[texts[0]]]
    for i, g in enumerate(gaps):
        if med_gap > 0 and g > 1.8 * med_gap:
            paras.append([texts[i + 1]])
        else:
            paras[-1].append(texts[i + 1])
    return [" ".join(p) for p in paras]


def layout_text(words: list[WordBox]) -> str:
    """Reading-order text from word boxes across pages."""
    pages: dict[int, list[WordBox]] = {}
    for w in words:
        pages.setdefault(w.page, []).append(w)
    out: list[str] = []
    for page in sorted(pages):
        lines = _cluster_lines(pages[page])
        for column in _split_columns(lines):
            out.extend(_paragraphs(column))
    return "\n".join(out)
