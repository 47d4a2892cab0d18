"""regions + columns -> sections (reference: lib/pdf/extract/analysis/sections.rb).

SURVEY.md A7 (ordered merge state machine), A8 (content stats), A9
(ideal-vector scoring), P4-P6 (candidate predicates), J2 (containment
assignment of regions to columns).
"""

from __future__ import annotations

from ..settings import Settings
from . import language, spatial

REF_IDEALS = {
    # sections.rb:164-172
    "name_ratio": (0.14, 1.0),
    "letter_ratio": (0.23, 6.0),
    "year_ratio": (0.05, 10.0),
    "cap_ratio": (0.49, 10.0),
    "lateness": (0.96, 6.0),
}


def _match(a: dict, b: dict) -> bool:
    """sections.rb:15-22 — widths within 10% of their average AND equal
    line_height at 2-decimal rounding."""
    avg_width = (a["width"] + b["width"]) / 2.0
    matched_width = abs(a["width"] - b["width"]) <= avg_width * 0.1
    matched_font = round(a["line_height"], 2) == round(b["line_height"], 2)
    return matched_width and matched_font


def _candidate(region: dict, column: dict, settings: Settings) -> bool:
    """sections.rb:24-32"""
    within = region["width"] <= column["width"]
    return within and (region["width"] / column["width"]) >= settings.width_ratio


def _possible_header(region: dict, column: dict) -> bool:
    """sections.rb:34-42"""
    within = region["width"] <= column["width"]
    return within and region["width"] >= region["height"]


def sections_for_doc(
    regions: list[dict],
    columns_by_page: dict[int, list[dict]],
    settings: Settings,
) -> list[dict]:
    """Exact replication of sections.rb:88-175 over the whole document.

    ``columns_by_page`` preserves page order ascending and columns in
    the columns stage's emission order (the reference sorts them by x
    within each page before the sweep, sections.rb:119-121)."""
    # J2: assign each region to the first containing column (padding=1,
    # same page) — sections.rb:96-103.
    containers: list[dict] = []
    for page in columns_by_page:
        for col in columns_by_page[page]:
            containers.append({"column": col, "regions": []})

    for region in regions:
        for c in containers:
            col = c["column"]
            if col["page"] == region["page"] and spatial.contains(col, region, 1):
                c["regions"].append(region)
                break

    # sort regions top-down per column; columns by x within page
    for c in containers:
        c["regions"].sort(key=lambda r: -r["y"])
    pages: dict[int, list[dict]] = {}
    for c in containers:
        pages.setdefault(c["column"]["page"], []).append(c)
    for page in pages:
        pages[page].sort(key=lambda c: c["column"]["x"])

    # A7: sequential merge state machine across columns and pages.
    sections: list[dict] = []
    merging: dict | None = None
    for page in pages:
        for container in pages[page]:
            column = container["column"]
            for region in container["regions"]:
                if _candidate(region, column, settings):
                    if merging is not None and _match(merging, region):
                        merged_lines = []
                        if merging.get("lines") is not None:
                            merged_lines += merging["lines"]
                        else:
                            merged_lines.append(spatial.as_line(merging))
                        if region.get("lines") is not None:
                            merged_lines += region["lines"]
                        else:
                            merged_lines.append(spatial.as_line(region))
                        merging["lines"] = merged_lines
                        merging["components"].append(spatial.get_dimensions(region))
                    elif merging is not None:
                        sections.append(merging)
                        merging = dict(region)
                        merging["components"] = [spatial.get_dimensions(region)]
                    else:
                        merging = dict(region)
                        merging["components"] = [spatial.get_dimensions(region)]
                elif _possible_header(region, column):
                    if merging is not None:
                        sections.append(merging)
                    merging = None
    if merging is not None:
        sections.append(merging)

    # A8: content stats (sections.rb:72-85).  The reference's
    # ``components.max {|c| c[:page]}`` is a one-arg comparator quirk
    # that resolves to the last-appended component under MRI's scan —
    # which, because the sweep visits pages in ascending order, is also
    # the max page.  We take the last component's page.
    page_count = len(pages)
    out = []
    for section in sections:
        last_page = section["components"][-1]["page"]
        content = spatial.get_text_content(section)
        stats = language.content_stats(content)
        stats["lateness"] = (
            last_page / float(page_count) if page_count else float("nan")
        )
        s = spatial.drop_spatial(section)
        s.update(stats)
        out.append(s)

    # A9: reference scoring.
    spatial.score(out, REF_IDEALS, "reference_score")
    return out
