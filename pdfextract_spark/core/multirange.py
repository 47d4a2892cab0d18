"""Interval-set accumulator (reference: lib/pdf/extract/multi_range.rb).

SURVEY.md A4.  Union-on-append of closed numeric intervals, plus the
aggregate views the analysis stages consume (min/max, min/max_excluded,
widest/narrowest/avg/covered/count).

The Spark-native equivalent (lag/cumsum gaps-and-islands over interval
rows) lives in ``pdfextract_spark.operators.intervals``; this kernel is
used inside the per-turn grouped UDF where interval counts are tiny.
"""

from __future__ import annotations


class MultiRange:
    __slots__ = ("ranges",)

    def __init__(self) -> None:
        self.ranges: list[tuple[float, float]] = []

    def append(self, lo: float, hi: float) -> None:
        """multi_range.rb:11-30 — merge the new closed interval with
        every incident existing interval (endpoint-containment test,
        exactly as the reference: r contains an endpoint of the other)."""
        if lo is None or hi is None:
            return
        incident = []
        non_incident = []
        for r in self.ranges:
            rmin, rmax = r
            if (
                rmin <= lo <= rmax
                or rmin <= hi <= rmax
                or lo <= rmin <= hi
                or lo <= rmax <= hi
            ):
                incident.append(r)
            else:
                non_incident.append(r)
        incident.append((lo, hi))
        merged = (min(r[0] for r in incident), max(r[1] for r in incident))
        non_incident.append(merged)
        self.ranges = non_incident

    @property
    def count(self) -> int:
        return len(self.ranges)

    @property
    def min(self) -> float:
        return min(r[0] for r in self.ranges)

    @property
    def max(self) -> float:
        return max(r[1] for r in self.ranges)

    @property
    def max_excluded(self) -> float:
        """multi_range.rb:32-38 — bottom of the topmost interval (or the
        single interval's max when only one)."""
        if len(self.ranges) == 1:
            return self.ranges[0][1]
        return max(self.ranges, key=lambda r: r[0])[0]

    @property
    def min_excluded(self) -> float:
        """multi_range.rb:40-46 — top of the bottommost interval (or the
        single interval's min when only one)."""
        if len(self.ranges) == 1:
            return self.ranges[0][0]
        return min(self.ranges, key=lambda r: r[1])[1]

    @property
    def widest(self) -> float:
        r = max(self.ranges, key=lambda r: r[1] - r[0])
        return r[1] - r[0]

    @property
    def narrowest(self) -> float:
        r = min(self.ranges, key=lambda r: r[1] - r[0])
        return r[1] - r[0]

    @property
    def avg(self) -> float:
        return sum(r[1] - r[0] for r in self.ranges) / float(len(self.ranges))

    @property
    def covered(self) -> float:
        return sum(r[1] - r[0] for r in self.ranges)
