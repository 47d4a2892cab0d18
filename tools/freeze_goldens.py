"""Freeze golden fixtures: run the per-turn kernel over the fixture
corpus and write canonical rendered outputs to tests/goldens.json.

The goldens pin today's (reference-faithful) semantics so any future
kernel change that shifts per-turn text/geometry is caught by
tests/test_goldens.py.  Regenerate ONLY after deliberately changing
semantics: python tools/freeze_goldens.py
"""

from __future__ import annotations

import json
import sys

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)

from pdfextract_spark.core import extract_turn, render_turn  # noqa: E402
from pdfextract_spark.core.spatial import get_text_content  # noqa: E402
from pdfextract_spark.sources.transcripts import _decorate  # noqa: E402

# Deterministic corpus: the 8 generator scenarios over 3 word pools,
# plus FIXTURES.md §3 edge cases.
POOLS = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
    "the quick brown fox jumps over a lazy dog while two cats watch",
    "data table join scan filter window group order hash merge sort spill",
]


def corpus() -> list[tuple[str, str]]:
    out = []
    for pi, pool in enumerate(POOLS):
        words = pool.split()
        for s in range(8):
            out.append((f"scenario{s}_pool{pi}", _decorate(words, s + pi * 17, s)))
    out += [
        ("empty", ""),
        ("whitespace", "  \n\n \t "),
        ("single_char", "x"),
        ("two_chars", "ab"),
        ("hyphen_wrap", "start " + "y" * 240 + " end"),
        ("ligatures", "Eﬀect of “Quotes”\n\n" + "ﬁne ﬂowing text with enough words to form a region " * 4),
        (
            "year_trap",
            "Title Here\n\n" + "work from (1987) and (1992) plus (2001) appears " * 10,
        ),
        (
            "multipage",
            "\n\n".join(" ".join(f"p{i}w{j}" for j in range(140)) for i in range(14)),
        ),
        (
            "tie_breaks",
            "Tie Title\n\nALPHA BRAVO " * 40 + "\n\n" + "charlie delta " * 40,
        ),
    ]
    return out


def main() -> None:
    goldens = {}
    for name, text in corpus():
        res = render_turn(extract_turn(text))
        goldens[name] = {
            "text": text,
            "page_count": res["page_count"],
            "title": res.get("title"),
            "region_texts": [
                [l["content"] for l in r["lines"]] for r in res["regions"]
            ],
            "region_boxes": [
                [r["x"], r["y"], r["width"], r["height"], r["page"]]
                for r in res["regions"]
            ],
            "zones": [
                [z["group"], z["y"], z["height"], z["page"]] for z in res["zones"]
            ],
            "columns": [
                [c["x"], c["width"], c["page"]] for c in res["columns"]
            ],
            "section_texts": [get_text_content(s) for s in res["sections"]],
            "section_scores": [
                round(s["reference_score"], 6) for s in res["sections"]
            ],
            "references": [
                [r["content"], r.get("order")] for r in res["references"]
            ],
        }
    with open(f"{ROOT}/tests/goldens.json", "w") as f:
        json.dump(goldens, f, indent=1, ensure_ascii=False, sort_keys=True)
    print(f"froze {len(goldens)} goldens")


if __name__ == "__main__":
    main()
