"""content_stats must equal the standalone stat functions exactly."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pdfextract_spark.core import language as L


def _eq(a, b):
    if isinstance(a, float) and math.isnan(a):
        return isinstance(b, float) and math.isnan(b)
    return a == b


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=300))
def test_fused_equals_standalone(s):
    st_ = L.content_stats(s)
    assert _eq(st_["letter_ratio"], L.letter_ratio(s))
    assert _eq(st_["year_ratio"], L.year_ratio(s))
    assert _eq(st_["cap_ratio"], L.cap_ratio(s))
    assert _eq(st_["name_ratio"], L.name_ratio(s))
    assert st_["word_count"] == L.word_count(s)


def test_fused_on_name_text():
    from pdfextract_spark.core.names import NAME_ROWS

    name = next(n for n, amb in NAME_ROWS if not amb)
    s = f"{name} wrote (1999). Then Goldberg replied."
    st_ = L.content_stats(s)
    assert st_["name_ratio"] > 0
    assert st_["year_ratio"] > 0
