"""Fast-path vs char-level parity (SURVEY.md §7 "what's hard").

The production pipeline typesets lines directly (typeset_lines) and
treats each line as a chunk; the parity path materializes one row per
glyph and runs the full A1-A3 char-merge kernel (chunks.rb semantics).
These must agree exactly on chunks and on every downstream artifact.
"""

import pytest

from pdfextract_spark.core import extract_turn
from pdfextract_spark.core.typeset import typeset_chars, typeset_lines
from pdfextract_spark.settings import DEFAULT

FIXTURE_TEXTS = [
    "",
    "   \n\n  ",
    "x",
    "hello world",
    "A Short Title\n\nBody paragraph with several words that stays on one line.",
    (
        "A Study of Synthetic Layouts\n\n"
        + " ".join(["word"] * 300)
        + "\n\nSecond paragraph with more content that wraps around and "
        + "continues for a while longer than one line of text does."
    ),
    # hard breaks + hanging indents
    "Ref one first line\n    continuation indented\nRef two first\n    more",
    # hyphen-splitting of a very long token
    "start " + "x" * 250 + " end",
    # multi-page
    "\n\n".join(" ".join([f"p{i}w{j}" for j in range(120)]) for i in range(12)),
    # numbered references
    (
        "Title of the Paper\n\n"
        + " ".join(["body"] * 200)
        + "\n\nReferences\n\n"
        + " ".join(f"[{i}] Author{i}, X. ({1990 + i}). Paper {i}." for i in range(1, 7))
    ),
]


@pytest.mark.parametrize("idx", range(len(FIXTURE_TEXTS)))
def test_fastpath_equals_char_kernel(idx):
    text = FIXTURE_TEXTS[idx]
    fast = extract_turn(text, DEFAULT, chars=False,
                        want=("chunks", "regions", "zones", "columns",
                              "sections", "titles", "references"))
    slow = extract_turn(text, DEFAULT, chars=True,
                        want=("chunks", "regions", "zones", "columns",
                              "sections", "titles", "references"))
    assert fast["chunks"] == slow["chunks"]
    assert fast["regions"] == slow["regions"]
    assert fast["zones"] == slow["zones"]
    assert fast["columns"] == slow["columns"]
    assert fast["sections"] == slow["sections"]
    assert fast["title"] == slow["title"]
    assert fast["references"] == slow["references"]


def test_typeset_line_char_roundtrip():
    # glyphs of a line lie inside the line's bbox and reconstruct its text
    text = "Some words to typeset into glyph runs for the parity check"
    lines = typeset_lines(text, DEFAULT)
    chars = typeset_chars(text, DEFAULT)
    assert "".join(c["content"] for c in chars) == "".join(
        l["content"].replace(" ", "") for l in lines
    )
    for c in chars:
        line = next(
            l for l in lines
            if l["page"] == c["page"] and l["y"] == c["y"]
        )
        assert line["x"] <= c["x"] < line["x"] + line["width"] + 1e-9


def test_typeset_deterministic():
    text = FIXTURE_TEXTS[5]
    a = typeset_lines(text, DEFAULT)
    b = typeset_lines(text, DEFAULT)
    assert a == b


# --- hypothesis fuzz: fastpath == char kernel on arbitrary structured text
from hypothesis import given, settings as hsettings
from hypothesis import strategies as st

_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNO0123456789().,[]-",
    min_size=1,
    max_size=10,
)
_para = st.lists(_word, min_size=1, max_size=60).map(" ".join)
_doc = st.lists(_para, min_size=1, max_size=5).map("\n\n".join)


@hsettings(max_examples=40, deadline=None)
@given(_doc)
def test_fastpath_parity_fuzz(text):
    fast = extract_turn(text, DEFAULT, chars=False,
                        want=("chunks", "regions", "references", "titles"))
    slow = extract_turn(text, DEFAULT, chars=True,
                        want=("chunks", "regions", "references", "titles"))
    assert fast["chunks"] == slow["chunks"]
    assert fast["regions"] == slow["regions"]
    assert fast["title"] == slow["title"]
    assert fast["references"] == slow["references"]
