"""XML sink tests (S5, xml_view.rb)."""

from pdfextract_spark.core import extract_turn
from pdfextract_spark.core.xmlview import render_turn_xml


def test_xml_shape_and_rounding():
    text = (
        "A Title Here\n\n"
        + " ".join(["body words that wrap across the page"] * 20)
    )
    xml = render_turn_xml(extract_turn(text))
    assert xml.startswith("<pdf><page number=\"1\">")
    assert xml.endswith("</pdf>")
    assert "<region" in xml and "<line" in xml
    assert "<title" in xml and ">A Title Here</title>" in xml
    # numeric attrs rounded to 2 dp: no long float tails
    import re

    for m in re.finditer(r'(?:x|y|width|height)="([0-9.]+)"', xml):
        v = m.group(1)
        assert len(v.split(".")[-1]) <= 2 if "." in v else True


def test_xml_transliterates_content():
    xml = render_turn_xml(
        extract_turn("Eﬀect “Test”\n\n" + "plain body text here " * 20)
    )
    assert "Effect" in xml and "&#8220;" not in xml and "“" not in xml


def test_xml_escapes_markup():
    xml = render_turn_xml(extract_turn("a <b> & c\n\nmore body text " * 10))
    assert "<b>" not in xml.replace("<body", "")
    assert "&lt;b&gt;" in xml and "&amp;" in xml


def test_xml_deterministic():
    text = "Title Words\n\n" + "stable content " * 30
    assert render_turn_xml(extract_turn(text)) == render_turn_xml(
        extract_turn(text)
    )


def test_mask_svg_geometry_and_flip():
    """S6 analog (pdf_view.rb:7-35): per-page SVG mask — rect per
    artifact, PDF-to-SVG y-axis flip, all boxes inside the page."""
    import re

    from pdfextract_spark.core import extract_turn
    from pdfextract_spark.core.maskview import render_mask_svg, render_turn_masks

    text = "A Title\n\n" + " ".join(["body words here now"] * 60)
    res = extract_turn(text, want=("regions", "zones", "columns"))
    masks = render_turn_masks(res)
    assert masks, "at least one page mask"
    svg = masks[1]
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    rects = re.findall(
        r'<rect x="([\d.]+)" y="([\d.]+)" width="([\d.]+)" height="([\d.]+)"',
        svg,
    )
    assert rects
    for x, y, w, h in ((float(a) for a in r) for r in rects):
        assert 0 <= x <= 612 and 0 <= y <= 792
        assert x + w <= 612 + 1e-6 and y + h <= 792 + 1e-6
    # y-flip: the top-of-page region must render near SVG y=0 side
    region_top_pdf = max(r["y"] + r["height"] for r in res["regions"])
    svg_min_y = min(float(r[1]) for r in rects)
    assert abs((792 - region_top_pdf) - svg_min_y) < 1e-6
    # empty page -> background only
    empty = render_mask_svg({"regions": []}, page=1)
    assert "<rect x=" not in empty
