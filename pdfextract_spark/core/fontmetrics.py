"""Synthetic font metrics (reference: lib/pdf/extract/font_metrics.rb).

The reference resolves per-glyph widths from embedded font programs or
its bundled AFM table (font_metrics.rb:73-261, widths in 1000ths of
the em).  We ship a deterministic synthetic equivalent: a fixed
per-character width-class table for the proportional body face, and a
pure monospace face for titles/footers.  Widths are exact dyadic
fractions so cumulative x positions are bit-stable.

glyph width = width_units(char) / 1000 * font_size
(mirrors glyph_displacement, characters.rb:38-50).
"""

from __future__ import annotations

from functools import lru_cache

# width classes in 1000ths of an em (dyadic: n/1000 kept exact enough
# in float64 for the additive ranges we use; sums stay < 2^20)
_NARROW = 250   # i j l . , ' ! | : ;
_THIN = 375     # f t r I ( ) [ ] { } " ` -
_WIDE = 750     # m w M W
_CAP = 625      # other capitals + digits? keep digits regular
_REGULAR = 500

_WIDTHS: dict[str, int] = {}
for c in "ijl.,'!|:;":
    _WIDTHS[c] = _NARROW
for c in 'ftrI()[]{}"`-':
    _WIDTHS[c] = _THIN
for c in "mwMW":
    _WIDTHS[c] = _WIDE
for c in "ABCDEFGHJKLNOPQRSTUVXYZ":
    _WIDTHS[c] = _CAP

SPACE_UNITS = _REGULAR


def width_units(ch: str) -> int:
    """AFM-style lookup; unknown glyphs take the regular width."""
    return _WIDTHS.get(ch, _REGULAR)


def text_width_units(s: str) -> int:
    """Sum of glyph widths incl. spaces, in 1000ths of an em."""
    total = 0
    for ch in s:
        total += _WIDTHS.get(ch, _REGULAR)
    return total


@lru_cache(maxsize=1 << 16)
def word_width_units(word: str) -> int:
    """Memoized text_width_units for whole words: natural-language
    vocabularies repeat heavily, so the per-glyph sum runs once per
    distinct word per interpreter (i.e. per executor core), not per
    occurrence.  Identical arithmetic to text_width_units."""
    return text_width_units(word)


def line_width_units(s: str) -> int:
    """text_width_units via the word cache.  Exact for ANY string:
    ``s.split(" ")`` yields k tokens separated by exactly k-1 single
    spaces (empty tokens have width 0), and a space's width is
    SPACE_UNITS, so the sum reconstructs the per-glyph total."""
    words = s.split(" ")
    total = SPACE_UNITS * (len(words) - 1)
    for w in words:
        total += word_width_units(w)
    return total


class FontMetrics:
    """Face abstraction the typesetter consumes (S3)."""

    __slots__ = ("name", "proportional")

    def __init__(self, name: str, proportional: bool):
        self.name = name
        self.proportional = proportional

    def char_width(self, ch: str, size: float) -> float:
        if not self.proportional:
            return 0.5 * size
        return width_units(ch) * size / 1000.0

    def text_width(self, s: str, size: float) -> float:
        if not self.proportional:
            return 0.5 * size * len(s)
        return line_width_units(s) * size / 1000.0


BODY = FontMetrics("Body", proportional=True)
TITLE = FontMetrics("Title", proportional=False)
BY_NAME = {"Body": BODY, "Title": TITLE}
