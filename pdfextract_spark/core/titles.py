"""regions -> title (reference: lib/pdf/extract/analysis/titles.rb).

SURVEY.md W4 + P3: filter chain (length >= 2, top half of page,
line_height within title_slop of the tallest, earliest page) then the
highest-y survivor.  At most one title per document (turn).
"""

from __future__ import annotations

from ..settings import Settings
from . import spatial


def title_for_doc(regions: list[dict], settings: Settings) -> dict | None:
    titles = [
        r for r in regions if len(spatial.get_text_content(r).strip()) >= 2
    ]
    titles = [r for r in titles if r["y"] >= r["page_height"] / 2.0]

    titles.sort(key=lambda r: -r["line_height"])
    if titles:
        tallest = titles[0]["line_height"]
        slop = tallest - tallest * settings.title_slop
        titles = [r for r in titles if r["line_height"] >= slop]

    titles.sort(key=lambda r: r["page"])
    if titles:
        first_page = titles[0]["page"]
        titles = [r for r in titles if r["page"] == first_page]

    titles.sort(key=lambda r: -r["y"])
    if not titles:
        return None
    return {
        "content": spatial.get_text_content(titles[0]),
        "line_height": titles[0]["line_height"],
        "font": titles[0]["font"],
    }
