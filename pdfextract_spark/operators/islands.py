"""Gaps-and-islands operators (SURVEY.md A2/A3/T1/T2).

The reference's pairwise char->word merge (chunks.rb:54-82) and the
partition_by/drop_while reference splitters (references.rb:32-44,68,75)
are instances of the classic lag -> gap-flag -> cumulative-sum island
pattern.  Expressed with Window functions these stay JVM-side and
shuffle exactly once on the partition keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def islands(
    df: DataFrame,
    part_cols: list[str],
    order_col: str | list[str],
    new_island: Column,
    island_col: str = "island",
) -> DataFrame:
    """Assign an island id per partition: ``new_island`` is a boolean
    column (may reference ``lag`` columns) marking rows that START a
    new island.  One shuffle on ``part_cols``.  ``order_col`` should be
    a total order (pass a list with a tie-break key)."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    flag = F.when(new_island, F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(
        island_col,
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def sessionize(
    df: DataFrame,
    part_cols: list[str],
    ts_col: str,
    gap_seconds: float,
) -> DataFrame:
    """A2 as sessionization: start a new island when the gap to the
    previous row exceeds ``gap_seconds`` (char_slop/word_slop analog
    over time instead of x)."""
    w = Window.partitionBy(*part_cols).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    gap = F.col(ts_col).cast("double") - prev.cast("double")
    # _rn assigned in the same window evaluation as the lag; the
    # cumsum inside islands() is keyed on it so duplicate timestamps
    # cannot permute between the flag pass and the cumsum pass (same
    # fix as intervals.merge_intervals)
    flagged = df.select(
        "*", F.row_number().over(w).alias("_rn"), gap.alias("_gap")
    )
    return islands(
        flagged,
        part_cols,
        "_rn",
        F.col("_gap").isNull() | (F.col("_gap") > gap_seconds),
        "session_id",
    ).drop("_gap", "_rn")


def partition_at(
    df: DataFrame,
    part_cols: list[str],
    order_col: str | list[str],
    delimiter: Column,
    drop_leading: bool = False,
) -> DataFrame:
    """T1 partition_by: a new segment starts AT each delimiter row.
    With ``drop_leading`` (T2 drop_while), rows before the first
    delimiter are removed (segment id 0)."""
    out = islands(df, part_cols, order_col, delimiter, "segment")
    if drop_leading:
        out = out.where(F.col("segment") > 0)
    return out
