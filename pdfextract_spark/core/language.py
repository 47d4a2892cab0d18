"""Text statistics and normalization (reference: lib/pdf/extract/language.rb).

Pure-Python/numpy kernels used both by the per-turn pipeline and by the
golden-fixture oracle.  The Spark DataFrame equivalents (expressed as
column expressions so Catalyst can codegen them) live in
``pdfextract_spark.operators.text``.
"""

from __future__ import annotations

import re

from .names import _weight, name_frequency

# --- F1: transliterate (language.rb:5-38) --------------------------------
# Ligature expansion + punctuation normalization, then whitespace collapse.
_TRANSLIT = {
    "ﬀ": "ff",
    "ﬁ": "fi",
    "ﬂ": "fl",
    "ﬃ": "ffi",
    "ﬄ": "ffl",
    "ﬅ": "ft",
    "ﬆ": "st",
    "ᵫ": "ue",
    "‘": "'",
    "’": "'",
    "–": "-",
    "—": "-",
    "“": '"',
    "”": '"',
    "▯": "(",
    "´": "",
    "±": "-",
}
_TRANSLIT_RE = re.compile("|".join(map(re.escape, _TRANSLIT)))
_WS_RE = re.compile(r"\s+")


_TRANSLIT_CHARS = set("".join(_TRANSLIT))
_WS_ODD = set("\t\n\r\x0b\f")


def transliterate(s: str) -> str:
    """language.rb:5-38 — char map then ``gsub /\\s+/, " "`` (no strip).

    Fast-pathed: the regex substitutions only run when the string can
    actually contain a mapped char / collapsible whitespace (the vast
    majority of typeset line contents cannot)."""
    if not _TRANSLIT_CHARS.isdisjoint(s):
        s = _TRANSLIT_RE.sub(lambda m: _TRANSLIT[m.group(0)], s)
    if "  " in s or not _WS_ODD.isdisjoint(s):
        s = _WS_RE.sub(" ", s)
    return s


# --- F2: letter_ratio (language.rb:40-42) --------------------------------
# Ruby: s.count("A-Z0-9\-[],.\"'()") / s.length — the count set is the
# A-Z and 0-9 ranges plus the literal chars - [ ] , . " ' ( ).
_LETTER_SET_RE = re.compile(r"[A-Z0-9\-\[\],.\"'()]")


def letter_ratio(s: str) -> float:
    if len(s) == 0:
        return float("nan")
    return len(_LETTER_SET_RE.findall(s)) / float(len(s))


# --- F3: cap_ratio (language.rb:45-61) -----------------------------------
_CAP_RE = re.compile(r"[A-Z]")
# a capital is NOT counted exactly when every char between it and the
# previous '.' (or the string start) is whitespace — i.e. sentence_end
# survives only through whitespace (language.rb:49-57).
_CAP_AT_START_RE = re.compile(r"(?:\A|\.)\s*[A-Z]")


def cap_ratio(s: str) -> float:
    """State-machine scan: capitals not at sentence start / word count.

    '.' sets sentence_end; [A-Z] counts unless sentence_end (and clears
    it); any other non-space clears it; whitespace leaves state alone.
    Division by ``s.split.length`` — 0 words -> NaN (Ruby 0/0.0).
    Implemented as two regex counts equivalent to the char scan.
    """
    words = len(s.split())
    if words == 0:
        return float("nan")
    total = len(_CAP_RE.findall(s))
    uncounted = len(_CAP_AT_START_RE.findall(s))
    return (total - uncounted) / float(words)


# --- F4: year_ratio (language.rb:63-71) ----------------------------------
# A word counts when it matches /[^\d]\d{4}[^\d]/ — i.e. a 4-digit run
# with a non-digit on BOTH sides inside the word ("(1999)" yes, "1999" no).
_YEAR_RE = re.compile(r"[^\d]\d{4}[^\d]")


def year_ratio(s: str) -> float:
    words = s.split()
    if not words:
        return float("nan")
    # the pattern needs >= 6 chars; skip shorter words without regexing
    return sum(
        1 for w in words if len(w) >= 6 and _YEAR_RE.search(w)
    ) / float(len(words))


# --- F5: word_count (language.rb:77-79) ----------------------------------
def word_count(s: str) -> int:
    return len(s.split())


# --- F6: name_ratio (language.rb:73-75 -> names.rb:21-49) ----------------
def name_ratio(s: str) -> float:
    return name_frequency(s)


# --- fused A8 stats (one split, shared across all ratios) -----------------
_DEL_LETTERS = {ord(c): None for c in
                "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-[],.\"'()"}
_DEL_CAPS = {ord(c): None for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"}


def content_stats(content: str) -> dict:
    """All of A8's per-section stats (sections.rb:76-84) in one pass:
    letter_ratio, year_ratio, cap_ratio, name_ratio, word_count —
    splitting the text once and using translate-deletion for the
    letter count.  Each component equals its standalone function
    (pinned by tests/test_language_fused.py)."""
    words = content.split()
    n_words = len(words)
    n = len(content)

    letter = (
        (n - len(content.translate(_DEL_LETTERS))) / n if n else float("nan")
    )

    if n_words:
        year = sum(
            1 for w in words if len(w) >= 6 and _YEAR_RE.search(w)
        ) / n_words
        # caps count by translate-deletion (C-level, no match-list
        # allocation) — equals len(_CAP_RE.findall(content))
        caps = n - len(content.translate(_DEL_CAPS))
        uncounted = len(_CAP_AT_START_RE.findall(content))
        cap = (caps - uncounted) / n_words
        total_w = 0.0
        for w in words:
            total_w += _weight(w)
        name = total_w / n_words if total_w else 0.0
    else:
        year = float("nan")
        cap = float("nan")
        name = 0.0

    return {
        "letter_ratio": letter,
        "year_ratio": year,
        "cap_ratio": cap,
        "name_ratio": name,
        "word_count": n_words,
    }


# --- F7: hyphenation-aware line concat (spatial.rb:98-112) ---------------
def join_lines(lines: list[str]) -> str:
    """``get_text_content`` over a :lines array — a line ending in '-'
    contributes its content minus the hyphen with no trailing space;
    other lines contribute content + ' '; final strip.
    (spatial.rb:98-112; the pairwise form at spatial.rb:13-19.)
    """
    parts = []
    for content in lines:
        if content.endswith("-"):
            parts.append(content[:-1])
        else:
            parts.append(content + " ")
    return "".join(parts).strip()


# --- F8: whitespace collapse on merge (spatial.rb:61) --------------------
def collapse_ws(s: str) -> str:
    return _WS_RE.sub(" ", s)
