"""Unit tests for sections/titles kernels (sections.rb, titles.rb)."""

import math

from pdfextract_spark.core.sections import REF_IDEALS, sections_for_doc
from pdfextract_spark.core.spatial import score
from pdfextract_spark.core.titles import title_for_doc
from pdfextract_spark.settings import DEFAULT


def region(x, y, w, h, lines, page=1, lh=10.0):
    return {
        "x": x, "y": y, "width": w, "height": h, "line_height": lh,
        "page": page, "page_width": 612.0, "page_height": 792.0,
        "lines": [
            {"content": c, "x_offset": 0.0, "y_offset": i * 13.0, "spacing": 0.0 if i == 0 else 3.0}
            for i, c in enumerate(lines)
        ],
        "font": "Body",
    }


def column(page=1, x=72, w=468):
    return {"group": "bodies", "x": x, "y": 72, "width": w, "height": 600,
            "page": page, "page_width": 612.0, "page_height": 792.0}


def test_sections_merge_matching_regions():
    # A7: same width/line_height -> merged into one section
    r1 = region(72, 400, 460, 36, ["para one line a", "para one line b"])
    r2 = region(72, 330, 460, 36, ["para two line a", "para two line b"])
    secs = sections_for_doc([r1, r2], {1: [column()]}, DEFAULT)
    assert len(secs) == 1
    assert len(secs[0]["lines"]) == 4
    assert len(secs[0]["components"]) == 2


def test_sections_header_splits():
    # P5: a narrow wide-not-tall region splits the merge
    r1 = region(72, 400, 460, 36, ["para one"])
    hdr = region(72, 350, 100, 10, ["Header"])
    r2 = region(72, 300, 460, 36, ["para two"])
    secs = sections_for_doc([r1, hdr, r2], {1: [column()]}, DEFAULT)
    assert len(secs) == 2


def test_sections_width_mismatch_starts_new():
    # P6/_match: widths differing >10% of avg start a new section
    r1 = region(72, 400, 460, 36, ["wide para"])
    r2 = region(72, 330, 430, 36, ["narrow para"])  # 430 vs 460: diff 30 > 44.5? no -> merges
    secs = sections_for_doc([r1, r2], {1: [column()]}, DEFAULT)
    assert len(secs) == 1
    r3 = region(72, 260, 421, 36, ["too narrow"])  # vs 460: diff 39 <= 44? yes merge
    # against merged width (still 460 from r1 dict) -> diff 39 <= 44.05 -> merge
    secs = sections_for_doc([r1, r3], {1: [column()]}, DEFAULT)
    assert len(secs) == 1


def test_sections_stats_and_lateness():
    r1 = region(72, 400, 460, 36, ["Alpha (1999) beta.", "Gamma delta"], page=1)
    r2 = region(72, 330, 460, 36, ["more text here"], page=2)
    cols = {1: [column(page=1)], 2: [column(page=2)]}
    secs = sections_for_doc([r1, r2], cols, DEFAULT)
    # widths match -> merged; last component on page 2 of 2 -> lateness 1.0
    assert len(secs) == 1
    s = secs[0]
    assert s["lateness"] == 1.0
    assert s["word_count"] == 8
    assert 0 < s["year_ratio"] < 1
    assert "reference_score" in s
    # spatial attrs dropped (sections.rb:76)
    assert "x" not in s and "page" not in s


def test_score_normalization_and_nan():
    # A9 (spatial.rb:156-175): NaN diff -> 1; exact 0 diff -> full weight
    items = [{"f": 1.0}, {"f": 3.0}, {"f": float("nan")}]
    score(items, {"f": (1.0, 10.0)}, "s")
    assert items[0]["s"] == 10.0           # d == 0 -> full weight
    assert items[1]["s"] == 0.0            # max diff -> 0
    assert items[2]["s"] == (1 - 1 / 2) * 10.0  # NaN -> d=1, max_diff=2


def test_score_ideals_shape():
    assert set(REF_IDEALS) == {
        "name_ratio", "letter_ratio", "year_ratio", "cap_ratio", "lateness"
    }


def title_region(content, y, lh, page=1):
    r = region(72, y, len(content) * 5.0, lh, [content], page=page, lh=lh)
    return r


def test_title_top_half_and_tallest():
    regs = [
        title_region("A Real Title", 700, 17.0),
        title_region("body text here", 600, 10.0),
        title_region("lower half text", 200, 17.0),  # y < 396 -> rejected
    ]
    t = title_for_doc(regs, DEFAULT)
    assert t["content"] == "A Real Title"
    assert t["line_height"] == 17.0


def test_title_earliest_page_wins():
    regs = [
        title_region("Page two heading", 700, 17.0, page=2),
        title_region("Page one heading", 650, 17.0, page=1),
    ]
    t = title_for_doc(regs, DEFAULT)
    assert t["content"] == "Page one heading"


def test_title_single_char_rejected():
    regs = [title_region("x", 700, 17.0)]
    assert title_for_doc(regs, DEFAULT) is None


def test_title_none_when_no_regions():
    assert title_for_doc([], DEFAULT) is None
