"""Unit tests for core/language.py (reference: language.rb)."""

import math

from pdfextract_spark.core import language as L


def test_transliterate_ligatures_and_punct():
    # language.rb:5-38
    assert L.transliterate("eﬀort") == "effort"
    assert L.transliterate("ﬁne ﬂy") == "fine fly"
    assert L.transliterate("‘a’ “b”") == "'a' \"b\""
    assert L.transliterate("a–b—c") == "a-b-c"
    assert L.transliterate("a´b") == "ab"


def test_transliterate_collapses_whitespace_no_strip():
    assert L.transliterate("  a \t b\n\nc ") == " a b c "


def test_letter_ratio():
    # language.rb:40-42 — set is A-Z, 0-9, - [ ] , . " ' ( )
    assert L.letter_ratio("AB12") == 1.0
    assert L.letter_ratio("ab") == 0.0
    assert L.letter_ratio("A.b,") == 0.75
    assert L.letter_ratio("[]()\"'-.") == 1.0


def test_cap_ratio_sentence_state():
    # language.rb:45-61: initial cap (sentence start) not counted
    assert L.cap_ratio("Hello world") == 0.0
    # cap after '.' not counted, mid-sentence cap counted
    assert L.cap_ratio("foo Bar. Baz qux") == 1 / 4
    # whitespace does not clear sentence_end
    assert L.cap_ratio(". A") == 0.0
    assert math.isnan(L.cap_ratio(""))


def test_year_ratio_needs_nondigit_fences():
    # language.rb:63-71: /[^\d]\d{4}[^\d]/ must match inside the word
    assert L.year_ratio("(1999)") == 1.0
    assert L.year_ratio("1999") == 0.0
    assert L.year_ratio("1999.") == 0.0  # no leading non-digit
    assert L.year_ratio("a word (2001). here") == 0.25


def test_word_count():
    assert L.word_count("  a  b\nc ") == 3
    assert L.word_count("") == 0


def test_join_lines_hyphen_rule():
    # spatial.rb:98-112
    assert L.join_lines(["syn-", "thetic text"]) == "synthetic text"
    assert L.join_lines(["a", "b"]) == "a b"
    assert L.join_lines(["tail-"]) == "tail"
