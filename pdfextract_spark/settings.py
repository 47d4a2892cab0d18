"""Engine settings.

Mirrors every tunable the reference declares via ``Settings.declare``
(see /root/reference/lib/pdf/extract/pdf.rb:5-50 for the settings
machinery), with identical defaults:

- char_slop / word_slop / overlap_slop: model/chunks.rb:8-24
- line_slop: model/regions.rb:6-11
- body_ratio: analysis/zones.rb:8-12
- column_sample_count / max_column_count: analysis/columns.rb:4-14
- title_slop: analysis/titles.rb:6-10
- width_ratio: analysis/sections.rb:9-13
- reference_flex / min_sequence_count / max_reference_order /
  min_lateness: references/references.rb:8-30

The typesetter block configures the deterministic "virtual typesetter"
(our replacement for the PDF content-stream scan, SURVEY.md S1/S2):
transcript turn text -> positioned character/line runs on synthetic
pages, so that the layout-analysis semantics stay meaningful.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Typesetter:
    """Deterministic layout constants for the virtual typesetter.

    PDF-point geometry (US Letter), bottom-left origin like the
    reference's coordinate space (model/characters.rb:102-113).
    """

    page_width: float = 612.0
    page_height: float = 792.0
    margin: float = 72.0  # all four sides

    body_font: str = "Body"
    body_size: float = 10.0
    body_leading: float = 13.0  # baseline step between wrapped lines

    title_font: str = "Title"
    title_size: float = 17.0
    title_leading: float = 22.1

    footer_font: str = "Body"
    footer_size: float = 8.0
    footer_y: float = 36.0  # baseline-bottom y of the per-page footer

    # extra vertical gap (on top of leading) after an explicit '\n'
    # (hard line break) and between paragraphs ('\n\n').
    hard_break_extra: float = 6.0
    paragraph_extra: float = 15.0

    # glyph width = char_width_ratio * font_size (monospace metric;
    # stands in for the AFM table, font_metrics.rb:73-261)
    char_width_ratio: float = 0.5

    # first paragraph is typeset in the title font when it is a single
    # short line and more text follows (exercises titles.rb heuristics)
    title_max_chars: int = 50

    @property
    def usable_width(self) -> float:
        return self.page_width - 2 * self.margin

    def char_width(self, size: float) -> float:
        return self.char_width_ratio * size


@dataclass(frozen=True)
class Settings:
    # chunks (model/chunks.rb:8-24)
    char_slop: float = 0.2
    word_slop: float = 4.0
    overlap_slop: float = 0.9
    # regions (model/regions.rb:6-11)
    line_slop: float = 1.0
    # zones (analysis/zones.rb:8-12)
    body_ratio: float = 0.9
    # columns (analysis/columns.rb:4-14)
    column_sample_count: int = 8
    max_column_count: int = 3
    # titles (analysis/titles.rb:6-10)
    title_slop: float = 0.2
    # sections (analysis/sections.rb:9-13)
    width_ratio: float = 0.9
    # references (references/references.rb:8-30)
    reference_flex: float = 0.2
    min_sequence_count: int = 3
    max_reference_order: int = 1000
    min_lateness: float = 0.5
    # sink rounding (bin/pdf-extract:85-87, view/xml_view.rb:24-29)
    precision: int = 2

    # mega-turn skew guard: one pathological multi-megabyte turn makes
    # one kernel invocation arbitrarily slow (the per-turn kernel is
    # the unit of work — partitioning cannot split inside a turn).
    # 0 disables; otherwise turns longer than this many chars are
    # truncated at the cap (metrics.truncated records it) or, with
    # on_oversize="fail", rejected with an attributable error.
    max_turn_chars: int = 1_000_000
    on_oversize: str = "truncate"  # "truncate" | "fail"

    typesetter: Typesetter = field(default_factory=Typesetter)

    def __post_init__(self) -> None:
        if self.on_oversize not in ("truncate", "fail"):
            raise ValueError(
                f"on_oversize must be 'truncate' or 'fail', "
                f"got {self.on_oversize!r}"
            )


DEFAULT = Settings()
