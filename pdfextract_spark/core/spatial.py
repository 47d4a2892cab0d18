"""Spatial-object helpers (reference: lib/pdf/extract/spatial.rb).

Objects are plain dicts with the conventional spatial attribute set
(spatial.rb:11): x, y, width, height, page_width, page_height, page.
"""

from __future__ import annotations

from .language import collapse_ws

SPATIAL_ATTRIBS = ("x", "y", "width", "height", "page_width", "page_height", "page")


def drop_spatial(obj: dict) -> dict:
    """spatial.rb:21-23"""
    return {k: v for k, v in obj.items() if k not in SPATIAL_ATTRIBS}


def get_dimensions(obj: dict) -> dict:
    """spatial.rb:82-92"""
    return {
        "x": obj["x"],
        "y": obj["y"],
        "width": obj["width"],
        "height": obj["height"],
        "page": obj["page"],
        "page_width": obj["page_width"],
        "page_height": obj["page_height"],
    }


def as_line(obj: dict) -> dict:
    """spatial.rb:94-96"""
    d = get_dimensions(obj)
    d["content"] = obj["content"]
    return d


def get_text_content(obj: dict) -> str:
    """spatial.rb:98-112 — hyphen-aware join of :lines, else :content."""
    if obj.get("lines"):
        parts = []
        for line in obj["lines"]:
            c = line["content"]
            if c.endswith("-"):
                parts.append(c[:-1])
            else:
                parts.append(c + " ")
        return "".join(parts).strip()
    if obj.get("content") is not None:
        return obj["content"]
    return ""


def merge(a: dict, b: dict, separator: str = "", lines: bool = False) -> dict:
    """spatial.rb:43-73 — bbox union; content concat + whitespace
    collapse OR :lines accumulation; font/line_height inherited from
    the operand with the longer text content (ties -> b)."""
    blx = min(a["x"], b["x"])
    bly = min(a["y"], b["y"])
    trx = max(a["x"] + a["width"], b["x"] + b["width"])
    try_ = max(a["y"] + a["height"], b["y"] + b["height"])

    so = dict(a)
    so.update(b)
    so.update(x=blx, y=bly, width=trx - blx, height=try_ - bly)

    if lines:
        merged = []
        if a.get("lines") is not None:
            merged += a["lines"]
        else:
            merged.append(as_line(a))
        if b.get("lines") is not None:
            merged += b["lines"]
        else:
            merged.append(as_line(b))
        so["lines"] = merged
    else:
        so["content"] = collapse_ws(a["content"] + separator + b["content"])

    if len(get_text_content(a)) > len(get_text_content(b)):
        so["font"] = a.get("font")
        so["line_height"] = a.get("line_height")
    else:
        so["font"] = b.get("font")
        so["line_height"] = b.get("line_height")
    return so


def contains(a: dict, b: dict, padding: float = 0.0) -> bool:
    """spatial.rb:135-147 — note the reference grows only the right and
    top edges by 2*padding (x2 = x + width + padding*2 with x1 = x -
    padding), which we mirror exactly."""
    a_x1 = a["x"] - padding
    a_x2 = a["x"] + a["width"] + padding * 2
    a_y1 = a["y"] - padding
    a_y2 = a["y"] + a["height"] + padding * 2

    b_x1 = b["x"]
    b_x2 = b["x"] + b["width"]
    b_y1 = b["y"]
    b_y2 = b["y"] + b["height"]
    return b_x1 >= a_x1 and b_x2 <= a_x2 and b_y1 >= a_y1 and b_y2 <= a_y2


def collapse(objs: list[dict]) -> dict:
    """spatial.rb:116-133 (SURVEY.md W8): fold a list of objects into
    one in left-to-right write order — sort by
    ``-(floor(y)*100) + x/100`` then pairwise merge.

    Note: the reference's version is dead code (never called; it
    references an undefined ``write_mode`` and discards each merge's
    return value).  This is the intended semantics per its docstring,
    provided as a working utility."""
    ordered = sorted(
        objs, key=lambda o: -(float(int(o["y"] // 1)) * 100) + o["x"] / 100.0
    )
    if len(ordered) == 1:
        return dict(ordered[0])
    acc = dict(ordered[0])
    for o in ordered[1:]:
        acc = merge(acc, o)
    return acc


def score(items: list[dict], ideals: dict[str, tuple[float, float]], name: str) -> None:
    """spatial.rb:156-175 — ideal-vector scoring (SURVEY.md A9).

    Per feature: diff = |item[f] - ideal| (NaN -> 1), normalized by the
    max diff across *all* items; exact-0 diff earns the full weight.
    Scores accumulate into item[name].
    """
    import math

    for f, (ideal, weight) in ideals.items():
        diffs = []
        for item in items:
            d = abs(item[f] - ideal)
            diffs.append(1.0 if math.isnan(d) else d)
        max_diff = max(diffs) if diffs else 0.0
        for i, item in enumerate(items):
            d = diffs[i]
            s = weight if d == 0 else (1.0 - d / max_diff) * weight
            item[name] = item.get(name, 0) + s
