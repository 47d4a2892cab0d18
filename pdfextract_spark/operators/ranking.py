"""Ranking / top-k / flex-threshold operators (SURVEY.md W4/W6/W7/P8).

The reference's title top-1 selection (titles.rb:29-53), column-count
ranking (columns.rb:74-83), and reference-score flex threshold
(references.rb:196-209) are all window-ranking patterns: one shuffle
on the group keys, deterministic tie-breaks via explicit secondary
order columns (never relying on unstable sorts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(
    df: DataFrame,
    part_cols: list[str],
    order_by: list[Column],
    k: int = 1,
    rank_col: str = "rk",
) -> DataFrame:
    """Deterministic top-k per group (W4): row_number over an explicit
    total order.  AQE handles group skew; for heavy single-key top-k
    at scale, pre-aggregate a per-partition top-k first (partial
    top-k push-down) — Catalyst does this automatically for
    row_number <= k filters since Spark 3.4 (WindowGroupLimit)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def flex_threshold(
    df: DataFrame,
    part_cols: list[str],
    score_col: str,
    flex: float,
) -> DataFrame:
    """P8: keep rows within ``flex`` of the group max
    (references.rb:196-209).  Window max avoids a self-join.

    The threshold is ``mx - flex * abs(mx)``: for nonnegative maxima
    (the reference's score domain) this is exactly the historical
    ``mx * (1 - flex)``, and for a NEGATIVE group max it still keeps
    the max row — ``mx * (1 - flex)`` sits ABOVE a negative max, so
    the whole group (max included) silently vanished."""
    w = Window.partitionBy(*part_cols)
    return df.withColumn("_mx", F.max(score_col).over(w)).where(
        F.col(score_col)
        >= F.col("_mx") - flex * F.abs(F.col("_mx"))
    ).drop("_mx")


def keep_group_max(
    df: DataFrame,
    part_cols: list[str],
    by: str,
) -> DataFrame:
    """W6 helper: keep rows whose ``by`` equals the group max
    (columns.rb:74-79 'highest column count' / 'widest avg' steps)."""
    w = Window.partitionBy(*part_cols)
    return df.withColumn("_mx", F.max(by).over(w)).where(
        F.col(by) == F.col("_mx")
    ).drop("_mx")
