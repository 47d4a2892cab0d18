"""Property-based tests (SURVEY.md §5.4, hypothesis)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pdfextract_spark.core import extract_turn
from pdfextract_spark.core.language import collapse_ws, join_lines
from pdfextract_spark.core.multirange import MultiRange
from pdfextract_spark.core.typeset import typeset_lines
from pdfextract_spark.settings import DEFAULT

words = st.lists(
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=120,
)


@settings(max_examples=60, deadline=None)
@given(words)
def test_typeset_roundtrip_text(ws):
    """typeset -> hyphen-join of the emitted lines reconstructs the
    normalized source text for boilerplate-free single paragraphs."""
    text = " ".join(ws)
    lines = [
        l["content"]
        for l in typeset_lines(text, DEFAULT)
        if not l["content"].startswith("p. ")
    ]
    rebuilt = join_lines(lines)
    # hyphen splits introduced by the typesetter are removed by the
    # hyphen-join rule; everything else must match the collapsed text
    assert rebuilt.replace("-", "") == collapse_ws(text).strip().replace("-", "")


@settings(max_examples=60, deadline=None)
@given(words)
def test_extract_region_text_preserves_words(ws):
    """No word is lost or duplicated by chunk/region merging (modulo
    hyphen wraps)."""
    text = " ".join(ws)
    res = extract_turn(text, DEFAULT, want=("regions",))
    got = " ".join(
        l["content"]
        for r in res["regions"]
        for l in r["lines"]
        if not l["content"].startswith("p. ")
    )
    # character stream (ignoring spaces and typesetter-inserted
    # hyphens) is preserved exactly
    strip = str.maketrans("", "", "- ")
    assert got.translate(strip) == collapse_ws(text).strip().translate(strip)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_multirange_invariants(intervals):
    """Union-on-append invariants: disjoint (beyond touching), sorted
    coverage equals naive coverage, count <= inputs, order-insensitive."""
    m = MultiRange()
    for lo, w in intervals:
        m.append(lo, lo + w)
    ranges = sorted(m.ranges)
    # pairwise disjoint and non-touching (closed-interval union)
    for (a1, a2), (b1, b2) in zip(ranges, ranges[1:]):
        assert a2 < b1
    # naive point coverage equality on integers
    naive = set()
    for lo, w in intervals:
        naive.update(range(lo, lo + w + 1))
    mine = set()
    for lo, hi in ranges:
        mine.update(range(int(lo), int(hi) + 1))
    assert naive == mine
    # order-insensitivity
    m2 = MultiRange()
    for lo, w in reversed(intervals):
        m2.append(lo, lo + w)
    assert sorted(m2.ranges) == ranges


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400))
def test_extract_never_crashes(text):
    res = extract_turn(text, DEFAULT)
    assert res["page_count"] >= 0
    assert isinstance(res["references"], list)


_ORDERED = re.compile(r"\[(\d+)\]")


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=4, max_value=12), st.integers(min_value=0, max_value=3))
def test_numbered_refs_always_split(n_refs, seed):
    """Any well-formed bracket-numbered ref list of length >= 4 in a
    late full-width section splits into exactly n_refs references with
    consecutive orders."""
    body = " ".join(["plain body words that fill the page nicely here"] * (8 + seed))
    refs = " ".join(
        f"[{i}] Person{i}, Q. ({1980 + i}). Contribution {i} on topic. Venue."
        for i in range(1, n_refs + 1)
    )
    text = f"A Title Line\n\n{body}\n\nHeading\n\n{refs}"
    res = extract_turn(text, DEFAULT)
    got = [r["order"] for r in res["references"]]
    assert got == list(range(1, n_refs + 1))
