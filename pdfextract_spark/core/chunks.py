"""chars -> chunks (reference: lib/pdf/extract/model/chunks.rb).

SURVEY.md A1-A3 + P1.  Per page:

A1  chars bucketed into rows keyed on *exact* float y, sorted-insert by
    x (chunks.rb:35-45); row iteration follows first-emission order of
    each y (Ruby insertion-ordered Hash).
A2  char -> word merge with char_slop/word_slop and the carried
    char_width of the last alphanumeric char (chunks.rb:54-82).
A3  cross-row overlap merge: sort chunks by x, pairwise-merge while the
    y-overlap ratio >= overlap_slop (chunks.rb:85-107).
P1  drop chunks whose stripped content is empty (chunks.rb:111).
"""

from __future__ import annotations

import re

from ..settings import Settings
from . import spatial

_NON_ALNUM = re.compile(r"[^A-Za-z0-9]")


def chunks_for_page(chars: list[dict], settings: Settings) -> list[dict]:
    """Exact replication of chunks.rb:47-111 for one page's chars,
    given in emission order."""
    if not chars:
        return []
    char_slop = settings.char_slop
    word_slop = settings.word_slop
    overlap_slop = settings.overlap_slop

    # A1: rows keyed by exact y, insertion-ordered; sorted insert by x
    # (insert before the first element with obj.x >= char.x).
    rows: dict[float, list[dict]] = {}
    for c in chars:
        y = c["y"]
        row = rows.setdefault(y, [])
        idx = next((i for i, obj in enumerate(row) if c["x"] <= obj["x"]), None)
        if idx is None:
            row.append(dict(c))
        else:
            row.insert(idx, dict(c))

    # A2: pairwise left-to-right merge within each row.
    text_chunks: list[dict] = []
    for _y, row in rows.items():
        char_width = row[0]["width"]
        while len(row) > 1:
            left, right = row[0], row[1]
            if left["x"] + left["width"] + char_width * char_slop >= right["x"]:
                row[0] = spatial.merge(left, right)
                del row[1]
                if not _NON_ALNUM.search(right["content"].strip()):
                    char_width = right["width"]
            elif left["x"] + left["width"] + char_width * word_slop >= right["x"]:
                row[0] = spatial.merge(left, right, separator=" ")
                del row[1]
                if not _NON_ALNUM.search(right["content"].strip()):
                    char_width = right["width"]
            else:
                text_chunks.append(left)
                del row[0]
                char_width = row[0]["width"]
        text_chunks.append(row[0])

    # A3: merge slightly-different-y chunks that mostly overlap in y.
    # Ruby sort_by! is unstable; geometry from the typesetter gives
    # unique x per chunk so a stable sort is observationally identical.
    text_chunks.sort(key=lambda o: o["x"])
    merged: list[dict] = []
    while len(text_chunks) > 1:
        left, right = text_chunks[0], text_chunks[1]
        m = min(left["height"], right["height"])
        overlap = (m - abs(left["y"] - right["y"])) / m
        if overlap >= overlap_slop:
            text_chunks[0] = spatial.merge(left, right)
            del text_chunks[1]
        else:
            merged.append(text_chunks[0])
            del text_chunks[0]
    merged.append(text_chunks[0])

    # P1: drop empty chunks.
    return [c for c in merged if c["content"].strip() != ""]
