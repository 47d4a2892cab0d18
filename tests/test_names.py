"""Unit tests for core/names.py (reference: names.rb:21-49)."""

from pdfextract_spark.core import names as N


def test_name_list_deterministic():
    w1, _ = N._build()
    assert len(N.NAME_ROWS) == len(N._PREFIXES) * len(N._SUFFIXES)
    assert w1 == N._NAME_WEIGHTS


def test_normalize_capitalize_and_hyphen():
    assert N._normalize("GOLDBERG") == "Goldberg"
    assert N._normalize("goldberg-hartley") == "Goldberg-Hartley"


def test_name_frequency_counts_all_words():
    # reference quirk: the stopword/length guard is a no-op (names.rb:28)
    name = next(n for n, amb in N.NAME_ROWS if amb == 0)
    amb = next(n for n, a in N.NAME_ROWS if a == 1)
    assert N.name_frequency(f"{name} xyz") == 0.5
    # ambiguous names weigh 0.0 (names.rb:10-11)
    assert N.name_frequency(f"{amb} xyz") == 0.0
    assert N.name_frequency("") == 0.0
    # stopwords are NOT excluded (quirk): denominator counts them
    assert N.name_frequency(f"the {name}") == 0.5


def test_stopword_list_size():
    # data/stopwords.txt carries 132 comma-separated words
    assert len(N.STOPWORDS) == 132
    assert N.STOPWORDS[0] == "a" and N.STOPWORDS[-1] == "labs"
