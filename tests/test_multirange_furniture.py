"""Unit tests for MultiRange + margins/zones/columns kernels."""

from pdfextract_spark.core.furniture import (
    columns_for_page,
    margins_for_page,
    zones_for_page,
)
from pdfextract_spark.core.multirange import MultiRange
from pdfextract_spark.settings import DEFAULT


def test_multirange_union():
    m = MultiRange()
    m.append(0, 10)
    m.append(20, 30)
    assert m.count == 2
    m.append(5, 25)  # bridges both
    assert m.count == 1
    assert (m.min, m.max) == (0, 30)


def test_multirange_excluded_endpoints():
    m = MultiRange()
    m.append(0, 10)
    m.append(20, 30)
    # multi_range.rb:32-46
    assert m.max_excluded == 20  # bottom of topmost interval
    assert m.min_excluded == 10  # top of bottommost interval
    m2 = MultiRange()
    m2.append(3, 7)
    assert m2.max_excluded == 7 and m2.min_excluded == 3


def test_multirange_stats():
    m = MultiRange()
    m.append(0, 10)
    m.append(20, 25)
    assert m.widest == 10 and m.narrowest == 5
    assert m.covered == 15 and m.avg == 7.5


def region(x, y, w, h, page=1):
    return {
        "x": x, "y": y, "width": w, "height": h, "line_height": 10.0,
        "page": page, "page_width": 612.0, "page_height": 792.0,
        "lines": [], "font": "Body",
    }


def test_margins_extents():
    regs = [region(72, 100, 400, 50), region(100, 500, 300, 100)]
    m = margins_for_page(regs)
    assert m["top"]["y"] == 600 and m["top"]["height"] == 192
    assert m["bottom"]["height"] == 100
    assert m["left"]["width"] == 72
    assert m["right"]["x"] == 472 and m["right"]["width"] == 140


def test_zones_single_body():
    # One dense block -> 1 interval -> body only (zones.rb:55-62)
    regs = [region(72, 100, 400, 500)]
    zones = zones_for_page(regs, margins_for_page(regs), DEFAULT)
    assert [z["group"] for z in zones] == ["bodies"]
    assert zones[0]["y"] == 100 and zones[0]["height"] == 500


def test_zones_body_and_footer():
    # tall block + tiny bottom rect -> 2 intervals, taller = body
    regs = [region(72, 200, 400, 460), region(250, 36, 60, 8)]
    zones = zones_for_page(regs, margins_for_page(regs), DEFAULT)
    groups = {z["group"]: z for z in zones}
    assert set(groups) == {"bodies", "footers"}
    # the forced body stripe (zones.rb:48-51) extends the body interval
    # down to ymin + 0.05*marginless: 36 + 31.2 = 67.2
    assert abs(groups["bodies"]["y"] - 67.2) < 1e-9
    assert groups["footers"]["y"] == 36


def test_zones_header_body_footer():
    regs = [
        region(72, 700, 400, 20),   # header-ish
        region(72, 150, 400, 400),  # body
        region(250, 36, 60, 8),     # footer
    ]
    zones = zones_for_page(regs, margins_for_page(regs), DEFAULT)
    assert [z["group"] for z in zones] == ["headers", "bodies", "footers"]


def test_columns_single():
    body = {"group": "bodies", "x": 72, "y": 100, "width": 468, "height": 500,
            "page": 1, "page_width": 612.0, "page_height": 792.0}
    regs = [region(72, 120, 460, 460)]
    cols = columns_for_page(regs, body, DEFAULT)
    assert len(cols) == 1
    assert cols[0]["x"] == 72 and cols[0]["width"] == 460


def test_columns_two_column_layout():
    body = {"group": "bodies", "x": 72, "y": 100, "width": 468, "height": 500,
            "page": 1, "page_width": 612.0, "page_height": 792.0}
    regs = [region(72, 120, 200, 460), region(340, 120, 200, 460)]
    cols = columns_for_page(regs, body, DEFAULT)
    assert len(cols) == 2
    assert [c["x"] for c in cols] == [72, 340]


def test_columns_narrow_masks_rejected():
    # widest < 0.25 * body width -> discarded (columns.rb:66-68)
    body = {"group": "bodies", "x": 72, "y": 100, "width": 468, "height": 500,
            "page": 1, "page_width": 612.0, "page_height": 792.0}
    regs = [region(72, 120, 50, 460)]
    assert columns_for_page(regs, body, DEFAULT) == []
