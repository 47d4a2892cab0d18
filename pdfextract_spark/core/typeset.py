"""Virtual typesetter (SURVEY.md S1-S4).

Replaces the reference's PDF content-stream scan + glyph-matrix layout
(lib/pdf/extract/model/characters.rb:62-126, font_metrics.rb:28-71) with
a deterministic transcript-text -> positioned-glyph layout so the layout
analysis pipeline (chunks -> regions -> margins -> zones -> columns ->
sections -> titles -> references) stays meaningful over plain text.

Text protocol (how a turn's ``text`` payload maps to geometry):
- paragraphs split on blank lines (``\\n\\n+``)
- a single ``\\n`` is a *hard line break*: the following line gets an
  extra ``hard_break_extra`` of vertical gap and keeps its leading
  spaces as an indent (hanging-indent reference styles)
- words wrap greedily at ``usable_width``; a word longer than the
  remaining space that also exceeds a full line is hyphen-split with a
  trailing '-' (exercising the hyphen-join rule spatial.rb:13-19)
- the first paragraph is typeset in the title font when it is short,
  single-line, and more text follows (exercising titles.rb:22-53)
- every page carries a small centered footer ("p. N") below the body
  (exercising margins.rb:46-80 / zones.rb:55-113 on every turn)

All geometry is float64 with exact-dyadic constants where possible so
results are bit-stable across platforms.
"""

from __future__ import annotations

import re
from bisect import bisect_right
from itertools import accumulate

from ..settings import Settings, Typesetter
from .fontmetrics import (
    BY_NAME,
    SPACE_UNITS,
    FontMetrics,
    width_units,
    word_width_units,
)

_PARA_RE = re.compile(r"\n{2,}")

# A paragraph consisting of exactly this marker switches the rest of
# the document to two-column flow (exercises the scanline column
# detector, columns.rb:52-83, with genuinely multi-column layouts).
COLUMN_MARKER = "<<2col>>"

# Typeset rows are plain dicts (the hot path runs once per turn inside
# the Arrow batch — dataclass construction + vars() conversion was
# ~10% of kernel time).  Field set mirrors the reference's spatial
# attribute convention (spatial.rb:11, characters.rb:102-113):
#   x, y (bottom, PDF-style origin), width, height, line_height,
#   content, font, page, page_width, page_height


def _wrap_paragraph(
    para: str, avail_units: int, fm: FontMetrics
) -> list[tuple[str, int, float, int]]:
    """-> list of (line_text, indent_units, extra_gap_flag, width_units).

    Splits the paragraph at hard breaks, preserving leading-space
    indents, then greedily wraps each logical line by MEASURED width
    (per-glyph metrics, S3) in integer milli-em units — exact
    arithmetic, no float drift.  extra_gap is 1.0 for lines that start
    after an explicit hard break (other than the first).  width_units
    is the exact glyph width of the emitted text (word widths +
    SPACE_UNITS gaps — the same sum line_width_units would compute),
    threaded through so the placer never re-measures the line.
    """
    mono = not fm.proportional

    def w_units(word: str) -> int:
        return 500 * len(word) if mono else word_width_units(word)

    out: list[tuple[str, int, float, int]] = []
    for i, logical in enumerate(para.split("\n")):
        stripped = logical.lstrip(" ")
        n_indent = len(logical) - len(stripped)
        indent = min(n_indent * SPACE_UNITS, max(avail_units - 1000, 0))
        words = stripped.split()
        hard = 1.0 if i > 0 else 0.0
        if not words:
            continue
        avail = avail_units - indent

        widths = [w_units(w) for w in words]
        if max(widths) <= avail:
            # fast path (no word wider than a line, i.e. almost every
            # logical line): greedy wrap via prefix sums + bisect —
            # O(lines log words) instead of a per-word Python loop.
            # cs[k] = sum of the first k (width + SPACE) terms; words
            # [i, j) fit iff cs[j] <= avail + SPACE + cs[i], exactly
            # the greedy `cur_w + SPACE + ww <= avail` condition.
            cs = [0]
            cs.extend(accumulate(w + SPACE_UNITS for w in widths))
            start = 0
            first = True
            n = len(words)
            while start < n:
                end = bisect_right(cs, avail + SPACE_UNITS + cs[start]) - 1
                out.append(
                    (
                        " ".join(words[start:end]),
                        indent,
                        hard if first else 0.0,
                        cs[end] - cs[start] - SPACE_UNITS,
                    )
                )
                first = False
                start = end
            continue

        cur: list[str] = []
        cur_w = 0       # wrap-control accumulator (sentinel after hyphen)
        cur_true = 0    # exact glyph width of ' '.join(cur)
        first_of_logical = True

        def flush() -> None:
            nonlocal cur, cur_w, cur_true, first_of_logical
            if cur:
                out.append(
                    (
                        " ".join(cur),
                        indent,
                        hard if first_of_logical else 0.0,
                        cur_true,
                    )
                )
                first_of_logical = False
                cur = []
                cur_w = 0
                cur_true = 0

        hyphen_w = width_units("-") if not mono else 500
        for word in words:
            ww = w_units(word)
            need = ww if not cur else cur_w + SPACE_UNITS + ww
            if need <= avail:
                cur.append(word)
                cur_true += ww if len(cur) == 1 else SPACE_UNITS + ww
                cur_w = need
                continue
            # word does not fit on the current line
            if ww <= avail:
                flush()
                cur = [word]
                cur_w = ww
                cur_true = ww
                continue
            # word wider than a full line: hyphen-split by width
            rest = word
            while w_units(rest) > avail:
                space_left = avail - cur_w - (SPACE_UNITS if cur else 0)
                # take glyphs while head + '-' still fits
                taken = 0
                used = hyphen_w
                for ch in rest:
                    cw = 500 if mono else width_units(ch)
                    if used + cw > space_left:
                        break
                    used += cw
                    taken += 1
                if taken == 0 and not cur:
                    # pathological geometry: not even one glyph plus a
                    # hyphen fits on an empty line (tiny page / huge
                    # font).  Force one glyph so the loop always makes
                    # progress instead of spinning forever.
                    taken = 1
                    used = hyphen_w + (
                        500 if mono else width_units(rest[0])
                    )
                if taken >= 1:
                    cur_true += used if not cur else SPACE_UNITS + used
                    cur.append(rest[:taken] + "-")
                    cur_w = avail  # force wrap
                    rest = rest[taken:]
                flush()
            cur = [rest] if rest else []
            cur_w = w_units(rest)
            cur_true = cur_w
        flush()
    return out


def _is_title_para(paras: list[str], ts: Typesetter) -> bool:
    if len(paras) < 2:
        return False
    first = paras[0]
    if "\n" in first:
        return False
    n = len(first.strip())
    title_chars = int(ts.usable_width // ts.char_width(ts.title_size))
    return 2 <= n <= min(ts.title_max_chars, title_chars)


def typeset_lines(text: str, settings: Settings | None = None) -> list[dict]:
    """Typeset one turn's text into positioned lines across pages."""
    st = settings or Settings()
    ts = st.typesetter
    text = text or ""
    paras = [p for p in _PARA_RE.split(text) if p.strip()]
    if not paras:
        return []

    title_first = _is_title_para(paras, ts)
    body_fm = BY_NAME[ts.body_font]
    title_fm = BY_NAME[ts.title_font]

    lines: list[dict] = []
    page = 1
    # cursor = y of the TOP of the next line's box
    cursor = ts.page_height - ts.margin
    bottom_limit = ts.margin

    # two-column state (activated by a COLUMN_MARKER paragraph):
    # col = -1 -> single column; 0/1 -> current column index
    col = -1
    col_top = cursor  # y where column flow began on this page
    gutter = 24.0
    col_width = (ts.usable_width - gutter) / 2.0

    def col_x(c: int) -> float:
        return ts.margin + c * (col_width + gutter)

    def place(content: str, indent_units: int, size: float,
              font: str, leading: float, wunits: int) -> None:
        nonlocal cursor, page, col, col_top
        if cursor - size < bottom_limit:
            if col == 0:
                col = 1
                cursor = col_top
            else:
                page += 1
                cursor = ts.page_height - ts.margin
                col_top = cursor
                if col == 1:
                    col = 0
        x0 = ts.margin if col < 0 else col_x(col)
        lines.append(
            {
                "x": x0 + indent_units * size / 1000.0,
                # width from the wrap pass's exact unit sum — the same
                # integer line_width_units(content) would produce, so
                # the float result is bit-identical to re-measuring
                "width": wunits * size / 1000.0,
                "y": cursor - size,
                "height": size,
                "line_height": size,
                "content": content,
                "font": font,
                "page": page,
                "page_width": ts.page_width,
                "page_height": ts.page_height,
            }
        )
        cursor -= leading

    for pi, para in enumerate(paras):
        if para.strip() == COLUMN_MARKER:
            # switch to two-column flow for the rest of the document
            if col < 0:
                cursor -= ts.paragraph_extra
                col = 0
                col_top = cursor
            continue
        if pi > 0:
            cursor -= ts.paragraph_extra
        if pi == 0 and title_first:
            size, fm, font, leading = (
                ts.title_size, title_fm, ts.title_font, ts.title_leading,
            )
        else:
            size, fm, font, leading = (
                ts.body_size, body_fm, ts.body_font, ts.body_leading,
            )
        # usable width in milli-em units of this face's size
        width_pts = ts.usable_width if col < 0 else col_width
        avail_units = int(width_pts * 1000.0 // size)
        for content, indent_units, hard, wunits in _wrap_paragraph(
            para, avail_units, fm
        ):
            if hard:
                cursor -= ts.hard_break_extra
            place(content, indent_units, size, font, leading, wunits)

    # per-page footer (below the body margin)
    n_pages = lines[-1]["page"] if lines else 0
    f_fm = BY_NAME[ts.footer_font]
    for p in range(1, n_pages + 1):
        content = f"p. {p}"
        w = f_fm.text_width(content, ts.footer_size)
        lines.append(
            {
                "x": (ts.page_width - w) / 2.0,
                "y": ts.footer_y,
                "width": w,
                "height": ts.footer_size,
                "line_height": ts.footer_size,
                "content": content,
                "font": ts.footer_font,
                "page": p,
                "page_width": ts.page_width,
                "page_height": ts.page_height,
            }
        )
    return lines


def typeset_chars(text: str, settings: Settings | None = None) -> list[dict]:
    """Char-level emission (parity mode; SURVEY.md S2).

    One row per glyph, words separated by a one-glyph-width gap (no
    space glyphs are emitted — the chunks kernel re-joins words with
    ' ' exactly as the reference's word_slop merge does,
    chunks.rb:66-70).  Used by tests to prove the line fast path equals
    the char-level pipeline; production uses typeset_lines.
    """
    st = settings or Settings()
    out: list[dict] = []
    for ln in typeset_lines(text, st):
        fm = BY_NAME[ln["font"]]
        x = ln["x"]
        h = ln["height"]
        for ch in ln["content"]:
            cw = fm.char_width(ch, h)
            if ch != " ":
                out.append(
                    {
                        "x": x, "y": ln["y"], "width": cw, "height": h,
                        "line_height": ln["line_height"], "content": ch,
                        "font": ln["font"], "page": ln["page"],
                        "page_width": ln["page_width"],
                        "page_height": ln["page_height"],
                    }
                )
            x += cw
    return out
