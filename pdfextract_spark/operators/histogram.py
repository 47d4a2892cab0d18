"""Frequency-histogram operators (SURVEY.md A10/A11).

references.rb:46-64 floors a numeric attribute, counts occurrences and
selects the SECOND most frequent value as the delimiter.  In Spark:
groupBy(floor) -> count -> row_number over (count desc, value desc) —
the explicit secondary key replaces Ruby's unstable sort so ties are
deterministic and documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_frequencies(
    df: DataFrame, part_cols: list[str], value_col: str
) -> DataFrame:
    """floor(value) histogram per group with a deterministic rank."""
    floored = df.withColumn("_v", F.floor(value_col))
    counts = floored.groupBy(*part_cols, "_v").count()
    w = Window.partitionBy(*part_cols).orderBy(
        F.col("count").desc(), F.col("_v").desc()
    )
    return counts.withColumn("rank", F.row_number().over(w)).withColumnRenamed(
        "_v", "value"
    )


def nth_most_frequent(
    df: DataFrame, part_cols: list[str], value_col: str, n: int = 2
) -> DataFrame:
    """A10: the reference's select_delimiter is n=2
    (references.rb:62-64)."""
    return (
        value_frequencies(df, part_cols, value_col)
        .where(F.col("rank") == n)
        .select(*part_cols, F.col("value").alias("delimiter"),
                F.col("count").alias("delimiter_count"))
    )


def argmax_vote(
    df: DataFrame, part_cols: list[str], key_col: str
) -> DataFrame:
    """A11: most-frequent key per group (the before/after char vote,
    references.rb:86-112) with first-seen tie-break replaced by a
    deterministic key order."""
    counts = df.groupBy(*part_cols, key_col).count()
    w = Window.partitionBy(*part_cols).orderBy(
        F.col("count").desc(), F.col(key_col).asc()
    )
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(*part_cols, key_col, "count")
    )
