"""sections -> references (reference: lib/pdf/extract/references/references.rb).

SURVEY.md P7-P9 (eligibility + flex threshold + header reject),
A10 (second-most-frequent delimiter), A11 (before/after char vote),
F10 (numeric-sequence detector), F11 (delimiter splitter),
F12 (margin/spacing splitters), T1/T2 (partition_by / drop_while).
"""

from __future__ import annotations

import math
import re

from ..settings import Settings
from . import spatial

_NUM_RE = re.compile(r"\d+")
_DELIM_SCAN_RE = re.compile(r"[^\d]?\d+[^\d]")
_REJECT_RES = (
    re.compile(r"references?"),
    re.compile(r"submitted for publication"),
    re.compile(r"additional contributions"),
)


# --- T1: partition_by (references.rb:32-44) ------------------------------
def partition_by(items: list, pred) -> list[list]:
    """Split ``items`` into sublists, starting a new sublist *at* each
    item matching ``pred``; empty sublists dropped."""
    matching: list = []
    parts: list[list] = []
    for item in items:
        if pred(item):
            parts.append(matching)
            matching = []
        matching.append(item)
    parts.append(matching)
    return [p for p in parts if p]


# --- A10: delimiter frequency histogram (references.rb:46-64) ------------
def frequencies(lines: list[dict], key: str) -> list[dict]:
    """Floor the value, count occurrences, order by count descending.

    Ruby builds an insertion-ordered histogram then does
    ``sort_by {count}.reverse`` — for count ties this yields
    reverse-of-first-occurrence order, which we replicate with an
    explicit secondary key so ties are deterministic."""
    fs: dict[int, int] = {}
    for line in lines:
        v = math.floor(line[key])
        fs[v] = fs.get(v, 0) + 1
    order = {v: i for i, v in enumerate(fs)}
    items = [{"value": v, "count": c} for v, c in fs.items()]
    items.sort(key=lambda it: (-it["count"], -order[it["value"]]))
    return items


def select_delimiter(lines: list[dict], key: str) -> int:
    """references.rb:62-64 — the SECOND most frequent floored value."""
    return frequencies(lines, key)[1]["value"]


def multi_margin(lines: list[dict]) -> bool:
    """references.rb:155-157"""
    return len({math.floor(l["x_offset"]) for l in lines}) > 1


def multi_spacing(lines: list[dict]) -> bool:
    """references.rb:159-161"""
    return len({math.floor(l["spacing"]) for l in lines}) > 1


# --- F12: margin / spacing splitters (references.rb:66-78) ---------------
def _split_on(lines: list[dict], key: str) -> list[dict]:
    delim = select_delimiter(lines, key)
    i = 0
    while i < len(lines) and math.floor(lines[i][key]) != delim:
        i += 1  # T2: drop_while
    parts = partition_by(lines[i:], lambda l: math.floor(l[key]) == delim)
    return [{"content": " ".join(l["content"] for l in part)} for part in parts]


def split_by_margin(lines: list[dict]) -> list[dict]:
    return _split_on(lines, "x_offset")


def split_by_line_spacing(lines: list[dict]) -> list[dict]:
    return _split_on(lines, "spacing")


# --- F10: numeric-sequence detector (references.rb:163-184) --------------
def numeric_sequence(content: str, settings: Settings) -> bool:
    last_n = -1
    first_n = -1
    seq_count = 0
    for m in _NUM_RE.finditer(content):
        n = int(m.group(0))
        if n < settings.max_reference_order:
            if last_n == -1:
                last_n = n
                if first_n == -1:
                    first_n = n
            elif last_n + 1 == n:
                last_n += 1
                seq_count += 1
    if seq_count < settings.min_sequence_count:
        return False
    return re.search(str(first_n), content[0:31]) is not None


# --- A11 + F11: before/after char vote + delimiter splitter --------------
def split_by_delimiter(content: str, settings: Settings) -> list[dict]:
    """references.rb:80-153 — vote on the characters around in-sequence
    numbers, then partition the text on the winning delimiter pattern,
    accepting only monotone +1 steps."""
    before: dict[str, int] = {}
    after: dict[str, int] = {}
    last_n = -1
    for m in _DELIM_SCAN_RE.finditer(content):
        mt = m.group(0)
        n = int(_NUM_RE.search(mt).group(0))
        if n < settings.max_reference_order:
            if last_n == -1 or n == last_n + 1:
                before[mt[0]] = before.get(mt[0], 0) + 1
                after[mt[-1]] = after.get(mt[-1], 0) + 1
                last_n = n if last_n == -1 else last_n + 1

    b_s = "\\" + max(before, key=lambda k: before[k]) if before else ""
    a_s = "\\" + max(after, key=lambda k: after[k]) if after else ""

    if b_s not in ("", "\\[", "\\ ") or a_s not in ("", "\\.", "\\]", "\\ "):
        return []

    pattern = re.compile(f"{b_s}?\\d+{a_s}")
    last_n = -1
    current = ""
    refs: list[dict] = []

    def partition(s: str) -> tuple[str, str, str]:
        m = pattern.search(s)
        if m is None:
            return s, "", ""
        return s[: m.start()], m.group(0), s[m.end() :]

    pre, mid, post = partition(content)
    while len(mid) != 0:
        n = int(_NUM_RE.search(mid).group(0))
        if n < settings.max_reference_order and last_n == -1:
            last_n = n
        elif n == last_n + 1:
            current += pre
            refs.append({"content": current.strip(), "order": last_n})
            current = ""
            last_n += 1
        else:
            current += pre + mid
        pre, mid, post = partition(post)
    refs.append({"content": (current + pre).strip(), "order": last_n})
    return refs


# --- the stage (references.rb:186-233) -----------------------------------
def references_for_doc(sections: list[dict], settings: Settings) -> list[dict]:
    if not sections:
        return []
    max_score = max(s["reference_score"] for s in sections)
    min_permittable = max_score - max_score * settings.reference_flex

    # P7: eligibility
    eligible = [
        s
        for s in sections
        if not (s["lateness"] < settings.min_lateness or s["year_ratio"] == 0)
    ]

    refs: list[dict] = []
    for section in eligible:
        # P8: flex threshold
        if section["reference_score"] >= min_permittable:
            content = spatial.get_text_content(section)
            if numeric_sequence(content, settings):
                refs += split_by_delimiter(content, settings)
            elif multi_margin(section["lines"]):
                refs += split_by_margin(section["lines"])
            elif multi_spacing(section["lines"]):
                refs += split_by_line_spacing(section["lines"])

    # P9: reject ref-section headers / publication-noise strings.
    out = []
    for ref in refs:
        norm = ref["content"].lower().strip()
        if any(rx.search(norm) for rx in _REJECT_RES):
            continue
        out.append(ref)
    return out
