"""Golden end-to-end per turn (SURVEY.md §5.2): frozen fixtures pin the
reference-faithful semantics; any drift in per-turn text/geometry
fails here.  Regenerate deliberately with tools/freeze_goldens.py."""

import json
import os

import pytest

from pdfextract_spark.core import extract_turn, render_turn
from pdfextract_spark.core.spatial import get_text_content

GOLDENS = json.load(
    open(os.path.join(os.path.dirname(__file__), "goldens.json"))
)


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_golden(name):
    g = GOLDENS[name]
    res = render_turn(extract_turn(g["text"]))
    assert res["page_count"] == g["page_count"]
    assert res.get("title") == g["title"]
    assert [
        [l["content"] for l in r["lines"]] for r in res["regions"]
    ] == g["region_texts"]
    assert [
        [r["x"], r["y"], r["width"], r["height"], r["page"]]
        for r in res["regions"]
    ] == g["region_boxes"]
    assert [
        [z["group"], z["y"], z["height"], z["page"]] for z in res["zones"]
    ] == g["zones"]
    assert [[c["x"], c["width"], c["page"]] for c in res["columns"]] == g[
        "columns"
    ]
    assert [get_text_content(s) for s in res["sections"]] == g["section_texts"]
    assert [
        round(s["reference_score"], 6) for s in res["sections"]
    ] == g["section_scores"]
    assert [[r["content"], r.get("order")] for r in res["references"]] == g[
        "references"
    ]
