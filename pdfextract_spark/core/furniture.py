"""Page furniture: margins, zones, columns.

References:
- margins: lib/pdf/extract/analysis/margins.rb  (SURVEY.md A6)
- zones:   lib/pdf/extract/analysis/zones.rb    (SURVEY.md T3/J4)
- columns: lib/pdf/extract/analysis/columns.rb  (SURVEY.md J3/W6)

All are per-page computations over that page's regions.
"""

from __future__ import annotations

from ..settings import Settings
from . import spatial
from .multirange import MultiRange


def margins_for_page(regions: list[dict]) -> dict[str, dict] | None:
    """margins.rb:46-80 — four margin rects from the x/y extent of the
    page's regions.  Only the masks' min/max feed the outputs, so the
    interval-union bookkeeping reduces to extent min/max."""
    if not regions:
        return None
    page = regions[0]["page"]
    pw = regions[0]["page_width"]
    ph = regions[0]["page_height"]

    x_min = min(r["x"] for r in regions)
    x_max = max(r["x"] + r["width"] for r in regions)
    y_min = min(r["y"] for r in regions)
    y_max = max(r["y"] + r["height"] for r in regions)

    base = {"page": page, "page_width": pw, "page_height": ph}
    return {
        "top": dict(base, x=0.0, y=y_max, width=pw, height=ph - y_max),
        "bottom": dict(base, x=0.0, y=0.0, width=pw, height=y_min),
        "left": dict(base, x=0.0, y=0.0, width=x_min, height=ph),
        "right": dict(base, x=x_max, y=0.0, width=pw - x_max, height=ph),
    }


def zones_for_page(
    regions: list[dict], margins: dict[str, dict], settings: Settings
) -> list[dict]:
    """zones.rb:47-122 — split the page into header/body/footer zones
    from the union of region y-extents plus a forced middle "body
    stripe" of body_ratio of the marginless height."""
    t_margin = margins["top"]
    b_margin = margins["bottom"]
    left_margin_x = margins["left"]["x"] + margins["left"]["width"]
    right_margin_x = margins["right"]["x"]

    y_mask = MultiRange()
    for r in regions:
        y_mask.append(r["y"], r["y"] + r["height"])

    marginless = t_margin["y"] - (b_margin["y"] + b_margin["height"])
    a = (marginless - marginless * settings.body_ratio) / 2.0
    y_mask.append(b_margin["y"] + b_margin["height"] + a, t_margin["y"] - a)

    objs: list[dict] = []
    if y_mask.count < 2:
        objs.append(
            {
                "group": "bodies",
                "x": left_margin_x,
                "y": b_margin["y"] + b_margin["height"],
                "width": right_margin_x - left_margin_x,
                "height": t_margin["y"] - (b_margin["y"] + b_margin["height"]),
            }
        )
    elif y_mask.count < 3:
        top = {
            "x": left_margin_x,
            "y": y_mask.max_excluded,
            "width": right_margin_x - left_margin_x,
            "height": t_margin["y"] - y_mask.max_excluded,
        }
        bottom = {
            "x": left_margin_x,
            "y": b_margin["y"] + b_margin["height"],
            "width": right_margin_x - left_margin_x,
            "height": top["y"] - (b_margin["y"] + b_margin["height"]),
        }
        if top["height"] > bottom["height"]:
            top["group"] = "bodies"
            bottom["group"] = "footers"
        else:
            top["group"] = "headers"
            bottom["group"] = "bodies"
        objs += [top, bottom]
    else:
        header = {
            "group": "headers",
            "x": left_margin_x,
            "y": y_mask.max_excluded,
            "width": right_margin_x - left_margin_x,
            "height": t_margin["y"] - y_mask.max_excluded,
        }
        footer = {
            "group": "footers",
            "x": left_margin_x,
            "y": b_margin["y"] + b_margin["height"],
            "width": right_margin_x - left_margin_x,
            "height": y_mask.min_excluded - (b_margin["y"] + b_margin["height"]),
        }
        body = {
            "group": "bodies",
            "x": left_margin_x,
            "y": footer["y"] + footer["height"],
            "width": right_margin_x - left_margin_x,
            "height": header["y"] - (footer["y"] + footer["height"]),
        }
        objs += [header, body, footer]

    base = {
        "page": t_margin["page"],
        "page_width": t_margin["page_width"],
        "page_height": t_margin["page_height"],
    }
    return [dict(base, **o) for o in objs]


def columns_for_page(
    regions: list[dict], body: dict, settings: Settings
) -> list[dict]:
    """columns.rb:28-88 — scanline column detection.

    8 sample y-lines across the body; per line, the x-interval union of
    regions covering it (J3); discard zero-coverage, >max_column_count,
    and narrow-column masks; keep masks with the highest column count,
    then the widest average; emit one column rect per range (W6)."""
    body_regions = [r for r in regions if spatial.contains(body, r)]

    n = settings.column_sample_count
    step = 1.0 / (n + 1)
    masks: list[MultiRange] = []
    for i in range(1, n + 1):
        y = body["y"] + body["height"] * i * step
        m = MultiRange()
        for r in body_regions:
            if r["y"] <= y <= r["y"] + r["height"]:
                m.append(r["x"], r["x"] + r["width"])
        masks.append(m)

    masks = [m for m in masks if m.count and m.covered != 0]
    masks = [m for m in masks if m.count <= settings.max_column_count]
    masks = [m for m in masks if m.widest >= 0.25 * body["width"]]
    if not masks:
        return []

    most = max(m.count for m in masks)
    masks = [m for m in masks if m.count == most]
    widest_avg = max(m.avg for m in masks)
    masks = [m for m in masks if m.avg >= widest_avg]

    out = []
    for lo, hi in masks[0].ranges:
        col = dict(body)
        col["x"] = lo
        col["width"] = hi - lo
        out.append(col)
    return out
