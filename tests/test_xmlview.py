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
