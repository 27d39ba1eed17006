"""PDF layout-aware text reconstruction (net-new per BASELINE north star).

Two real stages, both stdlib-only and hermetic:

1. decode_pdf_bytes: PDF bytes -> word boxes. A from-scratch reader of the
   text subset of ISO 32000: object graph scan (N G obj ... endobj, exact
   /Length stream slicing), FlateDecode via zlib (zlib IS the PDF Flate
   filter — no external codec involved), page tree walk in /Kids order,
   content-stream tokenizer (literal/hex strings with escapes, numbers,
   names, arrays) and a text-state interpreter for BT/ET, Tf, TL, Td, TD,
   Tm, T*, Tj, ', ", TJ (with per-element advance adjustments), Tc/Tw
   spacing. Glyph advances use a fixed fraction of the font size
   (_ADVANCE) — exact for metric-free layout recovery: line membership
   comes from the (exact) baseline y, in-line order from monotone x.
   Out of scope, by design: encrypted files, CID/Type0 composite fonts,
   embedded-font glyph metrics, image XObjects.

2. layout_text: word boxes -> reading-order text:
   - cluster word boxes into lines by vertical-center proximity,
   - detect a two-column layout from a wide persistent free gutter
     (merged x-interval gap >= 8% of the text span, centered),
   - order lines top-to-bottom within column, columns left-to-right,
   - merge lines into paragraphs at vertical-gap breaks,
   - join: words by ' ', lines in a paragraph by ' ', paragraphs by '\n'
     (so the downstream sentence detector treats them as boundaries).

Deterministic; fixtures in texoo_spark.pdfgen build real PDF bytes with
known expected reading order.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass


@dataclass(frozen=True)
class WordBox:
    page: int
    x0: float
    y0: float  # top (y grows downward)
    x1: float
    y1: float
    text: str


# ---------------------------------------------------------------------------
# PDF bytes -> word boxes
# ---------------------------------------------------------------------------

_ADVANCE = 0.5  # glyph advance as fraction of font size (metric-free model)

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"\bstream(?:\r\n|\n|\r)")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?:\s+(\d+)\s+R)?")
_FILTER_FLATE_RE = re.compile(rb"/Filter\s*(?:\[[^\]]*?/FlateDecode|"
                              rb"/FlateDecode)")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)")
_INT_OBJ_RE = re.compile(rb"^\s*(\d+)\s*$")

_ESCAPES = {ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
            ord("b"): "\b", ord("f"): "\f",
            ord("("): "(", ord(")"): ")", ord("\\"): "\\"}


class _Obj:
    __slots__ = ("head", "stream")

    def __init__(self, head: bytes, stream: bytes | None):
        self.head = head      # dictionary / value source (before stream)
        self.stream = stream  # decoded stream bytes, or None


def _parse_objects(data: bytes) -> dict[int, _Obj]:
    """Scan every `N G obj` in the file; slice streams by their exact
    /Length (resolving one level of indirect length), inflate Flate."""
    objs: dict[int, _Obj] = {}
    raw: dict[int, tuple[bytes, bytes | None, bytes]] = {}
    matches = list(_OBJ_RE.finditer(data))
    for m in matches:
        num = int(m.group(1))
        body_at = m.end()
        sm = _STREAM_RE.search(data, body_at)
        end_obj = data.find(b"endobj", body_at)
        if sm is not None and (end_obj == -1 or sm.start() < end_obj):
            head = data[body_at:sm.start()]
            raw[num] = (head, None, data[sm.end():])
        else:
            head = data[body_at:end_obj if end_obj != -1 else len(data)]
            raw[num] = (head, head, b"")
    for num, (head, _, tail) in raw.items():
        stream = None
        if tail != b"":
            lm = _LENGTH_RE.search(head)
            if lm is not None and lm.group(2) is not None:
                # indirect /Length N 0 R -> the referenced integer object
                ref = raw.get(int(lm.group(1)))
                im = _INT_OBJ_RE.match(ref[0]) if ref else None
                length = int(im.group(1)) if im else None
            elif lm is not None:
                length = int(lm.group(1))
            else:
                length = None
            if length is None:
                end = tail.find(b"endstream")
                stream = tail[:end if end != -1 else len(tail)]
                stream = stream.rstrip(b"\r\n")
            else:
                stream = tail[:length]
            if _FILTER_FLATE_RE.search(head):
                stream = zlib.decompress(stream)
        objs[num] = _Obj(head, stream)
    return objs


def _page_order(objs: dict[int, _Obj]) -> list[int]:
    """Page object numbers in document order: walk /Pages /Kids
    (depth-first); fall back to object-number order of /Type /Page."""
    pages = {n for n, o in objs.items()
             if re.search(rb"/Type\s*/Page\b(?!s)", o.head)}
    roots = [n for n, o in objs.items()
             if re.search(rb"/Type\s*/Pages\b", o.head)]
    order: list[int] = []
    seen: set[int] = set()

    def walk(num: int) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        if num in pages:
            order.append(num)
            return
        head = objs[num].head
        km = re.search(rb"/Kids\s*\[([^\]]*)\]", head)
        if km:
            for rm in _REF_RE.finditer(km.group(1)):
                walk(int(rm.group(1)))

    for r in roots:
        walk(r)
    for n in sorted(pages - set(order)):
        order.append(n)
    return order


def _tokenize_content(src: bytes):
    """Yield content-stream tokens: ('str', text) | ('num', float) |
    ('name', bytes) | ('op', bytes) | ('[', None) | (']', None)."""
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in b" \t\r\n\x0c\x00":
            i += 1
        elif c == 0x25:  # % comment
            j = src.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c == 0x28:  # ( literal string
            out: list[str] = []
            depth, i = 1, i + 1
            while i < n and depth:
                b = src[i]
                if b == 0x5C and i + 1 < n:  # backslash
                    nxt = src[i + 1]
                    if nxt in _ESCAPES:
                        out.append(_ESCAPES[nxt])
                        i += 2
                    elif 0x30 <= nxt <= 0x37:  # octal \ddd
                        j = i + 1
                        oct_digits = b""
                        while j < n and len(oct_digits) < 3 and \
                                0x30 <= src[j] <= 0x37:
                            oct_digits += src[j:j + 1]
                            j += 1
                        out.append(chr(int(oct_digits, 8)))
                        i = j
                    elif nxt in b"\r\n":  # line continuation
                        i += 2
                        if nxt == 0x0D and i < n and src[i] == 0x0A:
                            i += 1
                    else:
                        out.append(chr(nxt))
                        i += 2
                elif b == 0x28:
                    depth += 1
                    out.append("(")
                    i += 1
                elif b == 0x29:
                    depth -= 1
                    if depth:
                        out.append(")")
                    i += 1
                else:
                    out.append(chr(b))
                    i += 1
            yield ("str", "".join(out))
        elif c == 0x3C and i + 1 < n and src[i + 1] == 0x3C:
            i += 2  # << dict open (ignored in content)
        elif c == 0x3E and i + 1 < n and src[i + 1] == 0x3E:
            i += 2
        elif c == 0x3C:  # <hex string>
            j = src.find(b">", i)
            j = n if j == -1 else j
            hx = re.sub(rb"\s", b"", src[i + 1:j])
            if len(hx) % 2:
                hx += b"0"
            yield ("str", bytes.fromhex(hx.decode("ascii")).decode("latin-1"))
            i = j + 1
        elif c == 0x5B:
            yield ("[", None)
            i += 1
        elif c == 0x5D:
            yield ("]", None)
            i += 1
        elif c == 0x2F:  # /Name
            j = i + 1
            while j < n and src[j] not in b" \t\r\n\x0c\x00()<>[]{}/%":
                j += 1
            yield ("name", src[i + 1:j])
            i = j
        elif c in b"+-.0123456789":
            j = i + 1
            while j < n and src[j] in b"+-.0123456789":
                j += 1
            try:
                yield ("num", float(src[i:j]))
            except ValueError:
                pass
            i = j
        else:  # operator
            j = i + 1
            while j < n and src[j] not in b" \t\r\n\x0c\x00()<>[]{}/%":
                j += 1
            yield ("op", src[i:j])
            i = j


def _emit_words(out: list[WordBox], page: int, page_h: float, text: str,
                x: float, y: float, size: float, tc: float,
                tw: float) -> float:
    """Append word boxes for one shown string starting at baseline (x, y);
    return the advanced x."""
    adv = _ADVANCE * size
    i, n = 0, len(text)
    while i < n:
        if text[i] == " ":
            x += adv + tc + tw
            i += 1
            continue
        j = i
        while j < n and text[j] != " ":
            j += 1
        w = text[i:j]
        x1 = x + len(w) * adv + (len(w) - 1) * tc
        out.append(WordBox(page, x, page_h - y - size, x1, page_h - y, w))
        x = x1 + tc
        i = j
    return x


def decode_pdf_bytes(data: bytes) -> list[WordBox]:
    """Decode the text content of a (simple, unencrypted) PDF into word
    boxes. Raises ValueError when the bytes contain no page objects."""
    if b"/Encrypt" in data:
        raise NotImplementedError("encrypted PDFs are out of scope")
    objs = _parse_objects(data)
    page_nums = _page_order(objs)
    if not page_nums:
        raise ValueError("no page objects found in PDF bytes")
    out: list[WordBox] = []
    for page_idx, num in enumerate(page_nums):
        page = objs[num]
        mb = _MEDIABOX_RE.search(page.head)
        page_h = float(mb.group(4)) if mb else 792.0
        cm = re.search(rb"/Contents\s+(\[[^\]]*\]|\d+\s+\d+\s+R)", page.head)
        if cm is None:
            continue
        streams = []
        for rm in _REF_RE.finditer(cm.group(1)):
            obj = objs.get(int(rm.group(1)))
            if obj is not None and obj.stream is not None:
                streams.append(obj.stream)
        src = b"\n".join(streams)

        size = 12.0
        leading = 0.0
        tc = tw = 0.0
        lx = ly = 0.0   # line matrix origin
        x = y = 0.0     # current position
        stack: list = []
        in_array = False
        arr: list = []
        for kind, val in _tokenize_content(src):
            if kind == "[":
                in_array, arr = True, []
            elif kind == "]":
                in_array = False
                stack.append(("arr", arr))
            elif in_array:
                arr.append((kind, val))
            elif kind in ("num", "str", "name", "arr"):
                stack.append((kind, val))
            elif kind == "op":
                op = val
                if op == b"BT":
                    lx = ly = x = y = 0.0
                elif op == b"Tf" and len(stack) >= 2:
                    size = float(stack[-1][1])
                elif op == b"TL" and stack:
                    leading = float(stack[-1][1])
                elif op in (b"Td", b"TD") and len(stack) >= 2:
                    tx, ty = float(stack[-2][1]), float(stack[-1][1])
                    if op == b"TD":
                        leading = -ty
                    lx, ly = lx + tx, ly + ty
                    x, y = lx, ly
                elif op == b"Tm" and len(stack) >= 6:
                    lx, ly = float(stack[-2][1]), float(stack[-1][1])
                    x, y = lx, ly
                elif op == b"T*":
                    ly -= leading
                    x, y = lx, ly
                elif op == b"Tc" and stack:
                    tc = float(stack[-1][1])
                elif op == b"Tw" and stack:
                    tw = float(stack[-1][1])
                elif op == b"Tj" and stack and stack[-1][0] == "str":
                    x = _emit_words(out, page_idx, page_h, stack[-1][1],
                                    x, y, size, tc, tw)
                elif op == b"'" and stack and stack[-1][0] == "str":
                    ly -= leading
                    x, y = lx, ly
                    x = _emit_words(out, page_idx, page_h, stack[-1][1],
                                    x, y, size, tc, tw)
                elif op == b'"' and len(stack) >= 3 and \
                        stack[-1][0] == "str":
                    tw, tc = float(stack[-3][1]), float(stack[-2][1])
                    ly -= leading
                    x, y = lx, ly
                    x = _emit_words(out, page_idx, page_h, stack[-1][1],
                                    x, y, size, tc, tw)
                elif op == b"TJ" and stack and stack[-1][0] == "arr":
                    for k, v in stack[-1][1]:
                        if k == "str":
                            x = _emit_words(out, page_idx, page_h, v,
                                            x, y, size, tc, tw)
                        elif k == "num":
                            x -= v / 1000.0 * size
                stack.clear()
    return out


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
    """Detect a persistent vertical gutter; return one or two columns.

    A gutter is a WIDE free gap: merge every word's x-interval across all
    lines and look for a hole >= 8% of the text span whose center falls in
    the central 60% of the span. Width matters — inter-word gaps are a few
    points, a true column gutter is tens of points — so ordinary word
    spacing can never trigger a split regardless of how gaps align."""
    if len(lines) < 2:
        return [lines]
    intervals = sorted((w.x0, w.x1) for ln in lines for w in ln)
    if not intervals:
        return [lines]
    x_min = intervals[0][0]
    x_max = max(b for _, b in intervals)
    width = x_max - x_min
    if width <= 0:
        return [lines]
    gaps: list[tuple[float, float]] = []
    cur_end = intervals[0][1]
    for a, b in intervals[1:]:
        if a > cur_end:
            gaps.append((cur_end, a))
        cur_end = max(cur_end, b)
    best = None
    for a, b in gaps:
        gw, center = b - a, (a + b) / 2
        if gw >= 0.08 * width and \
                x_min + 0.2 * width <= center <= x_min + 0.8 * width:
            if best is None or gw > best[0]:
                best = (gw, center)
    if best is None:
        return [lines]
    gx = best[1]
    left = [[w for w in ln if w.x1 <= gx] for ln in lines]
    right = [[w for w in ln if w.x0 >= gx] for ln in lines]
    if sum(1 for ln in left if ln) < 2 or sum(1 for ln in right if ln) < 2:
        return [lines]
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
