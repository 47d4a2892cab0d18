"""As-of (point-in-time) join — an operator Spark's built-ins lack.

For every left row, attach the LATEST right row with the same keys and
``right.ts <= left.ts`` (optionally within ``tolerance``).  The naive
formulation is a per-left-row subquery (O(n*m) theta-join); the
scalable re-expression is the classic union + ordered-window trick:

- tag right rows side=0 and left rows side=1, union them,
- one shuffle on the keys, sort within each key by (ts, side,
  right-id), and
- ``last(value, ignorenulls=True)`` over the running window carries
  the most recent right value to every left row — side=0 sorting
  before side=1 makes the match inclusive at equal timestamps.

One shuffle total; everything else is a codegen'd window.  Skew note:
a hot key serializes its window — pre-split hot keys by time range if
a single key's history exceeds a task (same playbook as the salted
rollups in sinks.py).  Tie-breaks are total-ordered (ts, side,
right id), so results are deterministic and engine-reproducible (the
DuckDB oracle states the identical window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    right_id_col: str,
    tolerance: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + latest right ``value_cols`` at or before each left
    row's ``ts_col`` per ``on`` key (plus ``{ts_col}{suffix}``, the
    matched right timestamp; NULLs when no right row precedes).

    ``right_id_col`` must uniquely identify right rows — it totalizes
    the sort so duplicate (key, ts) right rows resolve identically in
    any engine (the one with the greatest id wins).  ``tolerance``
    (same units as ``ts_col``) voids matches older than
    ``left.ts - tolerance``.  Column names in ``value_cols`` must not
    collide with left columns (alias first)."""
    clash = [c for c in value_cols if c in left.columns]
    if clash:
        raise ValueError(
            f"value_cols {clash} collide with left columns; alias them"
        )
    l_tag = left.withColumn("_side", F.lit(1))
    for c in value_cols:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    l_tag = l_tag.withColumn(
        "_rid", F.lit(None).cast(right.schema[right_id_col].dataType)
    ).withColumn("_rts", F.lit(None).cast(right.schema[ts_col].dataType))

    r_tag = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in value_cols],
        F.col(right_id_col).alias("_rid"),
        F.col(ts_col).alias("_rts"),
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_tag.select(r_tag.columns).unionByName(
        r_tag.select(r_tag.columns)
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_rid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *unioned.columns,
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in value_cols
        ],
        F.last("_rts", ignorenulls=True).over(w).alias("_c_rts"),
    )
    out = carried.where(F.col("_side") == 1)
    keep_match = (
        F.col("_c_rts").isNotNull()
        if tolerance is None
        else F.col("_c_rts") >= F.col(ts_col) - F.lit(tolerance)
    )
    cols = [c for c in left.columns]
    return out.select(
        *cols,
        *[
            F.when(keep_match, F.col(f"_c_{c}")).alias(c)
            for c in value_cols
        ],
        F.when(keep_match, F.col("_c_rts")).alias(f"{ts_col}{suffix}"),
    )
