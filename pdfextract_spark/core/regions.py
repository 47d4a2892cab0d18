"""chunks -> regions (reference: lib/pdf/extract/model/regions.rb).

SURVEY.md A5 (backtracking vertical merge), J1 (x-interval incidence),
W5 (line offsets + spacing), P2 (drop spatial attrs from lines).
"""

from __future__ import annotations

from operator import itemgetter

from ..settings import Settings
_Y_KEY = itemgetter("y")


def _text_len(obj: dict) -> int:
    """len(spatial.get_text_content(obj)) without building the string:
    line contents carry no edge whitespace (both the typeset fast path
    and the char-merge kernel produce stripped, single-spaced content),
    so the hyphen-join length is a simple sum with the final trailing
    separator stripped (spatial.rb:98-112)."""
    lines = obj["lines"]
    total = 0
    for line in lines:
        c = line["content"]
        total += len(c) - 1 if c.endswith("-") else len(c) + 1
    if lines and not lines[-1]["content"].endswith("-"):
        total -= 1  # the strip of the trailing ' '
    return max(total, 0)


def regions_for_page(
    chunks: list[dict], settings: Settings, copy: bool = True
) -> list[dict]:
    """Exact replication of regions.rb:50-112 for one page's chunks
    (given in emission order).

    The merge loop is inherently sequential (compare_index backtracks
    to 1 after every merge, regions.rb:85-87); n = lines per page is
    small so the O(n^2) worst case is bounded per turn.  The merge
    itself is done in place (bbox update + line concat + the
    longer-text font/line_height rule of spatial.rb:43-73) instead of
    through dict-copying Spatial.merge — observationally identical,
    pinned by the frozen goldens and the char-kernel parity tests.
    """
    if not chunks:
        return []
    line_slop = settings.line_slop

    # ascending-y order; the reference's sorted insert puts ties
    # NEWEST-first (insert before the first obj with obj.y >= chunk.y),
    # replicated with a stable sort on (y, -arrival index).
    # ``copy=False`` lets a caller that owns the chunk dicts (the
    # per-turn fast path, which rebuilds them every turn) skip the
    # defensive copy; the merge mutates them in place either way.
    # a stable sort over the REVERSED list by y alone puts equal-y ties
    # newest-first — identical to the old (y, -arrival) composite key,
    # without per-chunk marker columns or tuple keys
    ordered = (
        [dict(c) for c in reversed(chunks)]
        if copy
        else list(reversed(chunks))
    )
    ordered.sort(key=_Y_KEY)

    # convert chunks to line-content carriers (regions.rb:70-74),
    # inlining as_line + the single-line _text_len
    for c in ordered:
        content = c.pop("content", None) or ""
        c["lines"] = [
            {
                "x": c["x"],
                "y": c["y"],
                "width": c["width"],
                "height": c["height"],
                "page": c["page"],
                "page_width": c["page_width"],
                "page_height": c["page_height"],
                "content": content,
            }
        ]
        c["_tlen"] = max(
            len(content) - 1 if content.endswith("-") else len(content), 0
        )

    regions: list[dict] = []
    compare_index = 1
    # the accumulator b == ordered[0] is stable across inner
    # iterations; hoist its hot fields into locals and refresh them
    # only when b changes (merge or rotation) — the loop body otherwise
    # pays ~8 dict lookups per comparison in an O(n^2) scan
    b = ordered[0]
    b_x = b["x"]
    b_x2 = b_x + b["width"]
    b_top = b["y"] + b["height"]
    b_lh = b["line_height"]
    while len(ordered) > compare_index:
        t = ordered[compare_index]

        t_h = t["height"]
        slop = (b_lh if b_lh < t_h else t_h) * line_slop
        if (b_top + slop) >= t["y"] and (
            # x-interval incidence (regions.rb:15-25, symmetric)
            (tx1 := t["x"]) <= b_x2
            and b_x <= (tx1 + t["width"])
        ):
            # in-place Spatial.merge(t, b, lines=True):
            # bbox union; lines = t.lines + b.lines; font/line_height
            # from the longer text side (ties -> b, the accumulator)
            blx = tx1 if tx1 < b_x else b_x
            bly = t["y"] if t["y"] < b["y"] else b["y"]
            trx = max(tx1 + t["width"], b_x2)
            try_ = max(t["y"] + t_h, b_top)
            if t["_tlen"] > b["_tlen"]:
                b["font"] = t["font"]
                b["line_height"] = t["line_height"]
            b["x"] = blx
            b["y"] = bly
            b["width"] = trx - blx
            b["height"] = try_ - bly
            b_x = blx
            # recompute the cached edges exactly as every later
            # comparison used to (x + width, y + height): blx +
            # (trx - blx) can differ from trx by 1 ulp, and caching
            # the un-rounded trx would flip boundary-touch incidence
            # decisions versus the reference kernel
            b_x2 = blx + b["width"]
            b_top = bly + b["height"]
            b_lh = b["line_height"]
            # result order is t.lines + b.lines, but lines are STORED
            # reversed during the loop (finalized below): appending
            # t's single line is O(1) instead of the O(|b.lines|)
            # re-concatenation, which was quadratic per region
            tl = t["lines"]
            # (t is never an accumulator in this loop — only
            # ordered[0] collects lines — so tl is a single line; if a
            # multi-line t ever appeared it would itself be
            # reverse-stored, making extend() order-preserving)
            b["lines"].extend(tl)
            # incremental text length: t's lines are prepended, so the
            # trailing-strip (already folded into b's cached length)
            # is unaffected; each prepended line adds len±1.
            add = 0
            for line in tl:
                c = line["content"]
                add += len(c) - 1 if c.endswith("-") else len(c) + 1
            b["_tlen"] += add
            del ordered[compare_index]
            compare_index = 1
        elif compare_index < len(ordered) - 1:
            compare_index += 1
        else:
            regions.append(ordered[0])
            del ordered[0]
            compare_index = 1
            if ordered:
                b = ordered[0]
                b_x = b["x"]
                b_x2 = b_x + b["width"]
                b_top = b["y"] + b["height"]
                b_lh = b["line_height"]
    if ordered:
        regions.append(ordered[0])
    for region in regions:
        region.pop("_tlen", None)
        region["lines"].reverse()  # undo the reversed merge storage

    for region in regions:
        # fused offsets (regions.rb:27-33) + spacing (regions.rb:35-43)
        # + drop-spatial projection (P2): one pass per line building the
        # slim output dict directly instead of mutate+mutate+re-filter
        rx, ry, rh = region["x"], region["y"], region["height"]
        height_taken = 0.0
        slim = []
        for line in region["lines"]:
            y_off = line["y"] - ry
            lh = line["height"]
            from_top = rh - (y_off + lh)
            slim.append(
                {
                    "content": line["content"],
                    "x_offset": line["x"] - rx,
                    "y_offset": y_off,
                    "spacing": from_top - height_taken,
                }
            )
            height_taken = from_top + lh
        region["lines"] = slim

    # regions.rb:111 — top-to-bottom output order (stable descending y)
    regions.sort(key=lambda o: -o["y"])
    return regions
