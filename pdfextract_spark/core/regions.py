"""chunks -> regions (reference: lib/pdf/extract/model/regions.rb).

SURVEY.md A5 (backtracking vertical merge), J1 (x-interval incidence),
W5 (line offsets + spacing), P2 (drop spatial attrs from lines).
"""

from __future__ import annotations

from ..settings import Settings
from . import spatial


def _incident(l: dict, r: dict) -> bool:
    """regions.rb:15-25 — x-interval incidence (closed ranges)."""
    lx1, lx2 = l["x"], l["x"] + l["width"]
    rx1, rx2 = r["x"], r["x"] + r["width"]
    return (
        (lx1 <= rx1 <= lx2)
        or (lx1 <= rx2 <= lx2)
        or (rx1 <= lx1 <= rx2)
        or (rx1 <= lx2 <= rx2)
    )


def _append_line_offsets(region: dict) -> None:
    """regions.rb:27-33"""
    for line in region.setdefault("lines", []):
        line["x_offset"] = line["x"] - region["x"]
        line["y_offset"] = line["y"] - region["y"]


def _append_line_spacing(region: dict) -> None:
    """regions.rb:35-43 — spacing = vertical gap above each line,
    walking lines in stored (top-down) order."""
    height_taken = 0.0
    for line in region.setdefault("lines", []):
        from_top = region["height"] - (line["y_offset"] + line["height"])
        line["spacing"] = from_top - height_taken
        height_taken = from_top + line["height"]


def regions_for_page(chunks: list[dict], settings: Settings) -> list[dict]:
    """Exact replication of regions.rb:50-112 for one page's chunks
    (given in emission order).

    The merge loop is inherently sequential (compare_index backtracks
    to 1 after every merge, regions.rb:85-87); n = lines per page is
    small so the O(n^2) worst case is bounded per turn.
    """
    if not chunks:
        return []
    line_slop = settings.line_slop

    # ascending-y insert: before the first element with obj.y >= chunk.y
    ordered: list[dict] = []
    for c in chunks:
        idx = next((i for i, obj in enumerate(ordered) if c["y"] <= obj["y"]), None)
        if idx is None:
            ordered.append(dict(c))
        else:
            ordered.insert(idx, dict(c))

    # convert chunks to line-content carriers (regions.rb:70-74)
    for c in ordered:
        c["lines"] = [spatial.as_line(c)]
        c.pop("content", None)

    regions: list[dict] = []
    compare_index = 1
    while len(ordered) > compare_index:
        b = ordered[0]
        t = ordered[compare_index]

        line_height = b["line_height"]
        slop = min(line_height, t["height"]) * line_slop
        incident_y = (b["y"] + b["height"] + slop) >= t["y"]

        if incident_y and _incident(t, b):
            ordered[0] = spatial.merge(t, b, lines=True)
            del ordered[compare_index]
            compare_index = 1
        elif compare_index < len(ordered) - 1:
            compare_index += 1
        else:
            regions.append(ordered[0])
            del ordered[0]
            compare_index = 1
    if ordered:
        regions.append(ordered[0])

    for region in regions:
        _append_line_offsets(region)
        _append_line_spacing(region)
        region["lines"] = [spatial.drop_spatial(line) for line in region["lines"]]

    # regions.rb:111 — top-to-bottom output order (stable descending y)
    regions.sort(key=lambda o: -o["y"])
    return regions
