"""Reusable Spark DataFrame operators (Catalyst-native).

Each operator re-expresses one row of SURVEY.md §2's inventory as a
declarative DataFrame transformation — windows, aggregations and
column expressions that stay inside whole-stage codegen — so the
driver's DuckDB oracle can check it in SQL, and so the same building
blocks serve ad-hoc analytics over extraction outputs at scale.
"""

from . import dedup, histogram, intervals, islands, quality, ranking, scoring, similarity, text  # noqa: F401
