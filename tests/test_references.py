"""Unit tests for the reference-splitting kernels (references.rb)."""

from pdfextract_spark.core import references as R
from pdfextract_spark.settings import DEFAULT, Settings


def test_partition_by_splits_at_matches():
    # references.rb:32-44: new part STARTS at each matching item
    parts = R.partition_by([1, 0, 0, 1, 0], lambda x: x == 1)
    assert parts == [[1, 0, 0], [1, 0]]
    parts = R.partition_by([0, 1, 0], lambda x: x == 1)
    assert parts == [[0], [1, 0]]


def test_frequencies_second_most():
    lines = [{"v": 0.2}, {"v": 3.1}, {"v": 3.9}, {"v": 3.5}, {"v": 0.8}]
    fs = R.frequencies(lines, "v")
    assert fs[0] == {"value": 3, "count": 3}
    assert R.select_delimiter(lines, "v") == 0


def test_numeric_sequence_detector():
    s = DEFAULT
    good = "[1] aaa [2] bbb [3] ccc [4] ddd"
    assert R.numeric_sequence(good, s)
    # years >= max_reference_order don't count (references.rb:168-170)
    years = "(1999) foo (2000) bar (2001) baz (2002)"
    assert not R.numeric_sequence(years, s)
    # sequence must start within the first 31 chars
    late = ("x" * 40) + " [1] a [2] b [3] c [4] d"
    assert not R.numeric_sequence(late, s)
    # too short a sequence
    assert not R.numeric_sequence("[1] a [2] b [3] c", s)


def test_split_by_delimiter_bracket_style():
    text = "[1] ref one. [2] ref two. [3] ref three. [4] ref four."
    refs = R.split_by_delimiter(text, DEFAULT)
    assert [r["order"] for r in refs] == [1, 2, 3, 4]
    assert refs[0]["content"] == "ref one."
    assert refs[3]["content"] == "ref four."


def test_split_by_delimiter_dotted_style():
    text = "1. ref one 2. ref two 3. ref three 4. ref four"
    refs = R.split_by_delimiter(text, DEFAULT)
    assert [r["order"] for r in refs] == [1, 2, 3, 4]
    assert refs[0]["content"] == "ref one"


def test_split_by_delimiter_skips_years():
    text = "[1] one (1999). [2] two (2000). [3] three. [4] four."
    refs = R.split_by_delimiter(text, DEFAULT)
    assert [r["order"] for r in refs] == [1, 2, 3, 4]
    assert refs[0]["content"] == "one (1999)."


def test_split_by_delimiter_rejects_odd_delims():
    # before/after chars outside the accept lists -> no split
    text = "{1} one {2} two {3} three {4} four"
    assert R.split_by_delimiter(text, DEFAULT) == []


def line(content, x_offset=0.0, spacing=3.0):
    return {"content": content, "x_offset": x_offset, "y_offset": 0.0,
            "spacing": spacing}


def test_split_by_margin_hanging_indent():
    # first lines at offset 0, continuations at 20 -> delimiter = 0
    lines = [
        line("Ref one first", 0.0), line("cont", 20.0),
        line("Ref two first", 0.0), line("cont two", 20.0), line("more", 20.0),
        line("Ref three first", 0.0),
    ]
    refs = R.split_by_margin(lines)
    assert [r["content"] for r in refs] == [
        "Ref one first cont",
        "Ref two first cont two more",
        "Ref three first",
    ]


def test_split_by_spacing():
    lines = [
        line("one a", spacing=9.0), line("one b", spacing=3.0),
        line("two a", spacing=9.0), line("two b", spacing=3.0),
        line("two c", spacing=3.0),
    ]
    refs = R.split_by_line_spacing(lines)
    assert [r["content"] for r in refs] == ["one a one b", "two a two b two c"]


def section(score, lateness=1.0, year_ratio=0.1, lines=None, content=None):
    lines = lines or [line(content or "[1] a. [2] b. [3] c. [4] d.")]
    return {
        "reference_score": score, "lateness": lateness, "year_ratio": year_ratio,
        "lines": lines, "line_height": 10.0, "font": "Body",
        "letter_ratio": 0.2, "cap_ratio": 0.3, "name_ratio": 0.1,
        "word_count": 8, "components": [],
    }


def test_references_eligibility_filters():
    # P7: early or year-free sections dropped (references.rb:201-206)
    secs = [section(10.0, lateness=0.2), section(10.0, year_ratio=0.0)]
    assert R.references_for_doc(secs, DEFAULT) == []


def test_references_flex_threshold():
    # P8: only sections >= max*(1-flex) parsed
    hi = section(10.0)
    lo = section(7.0, content="[1] x. [2] y. [3] z. [4] w.")
    refs = R.references_for_doc([hi, lo], DEFAULT)
    # lo at 7.0 < 8.0 threshold -> only hi parsed
    assert len(refs) == 4


def test_references_header_reject():
    # P9 (references.rb:225-229): substring match anywhere
    secs = [section(10.0, content="References [1] a. [2] b. [3] c. [4] d.")]
    refs = R.references_for_doc(secs, DEFAULT)
    contents = [r["content"] for r in refs]
    assert all("references" not in c.lower() for c in contents)
