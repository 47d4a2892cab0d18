"""As-of (point-in-time) join — an operator Spark's built-ins lack.

For every left row, attach the LATEST right row with the same keys and
``right.ts <= left.ts`` (optionally within ``tolerance``).  The naive
formulation is a per-left-row subquery (O(n*m) theta-join); the
scalable re-expression is the classic union + ordered-window trick:

- tag right rows side=0 and left rows side=1, union them,
- one shuffle on the keys, sort within each key by (ts, side,
  right-id), and
- carry the most recent right row to every left row with ONE
  ``last(struct, ignorenulls=True)`` over the running window — the
  whole right row moves as a unit, so the matched value, id, and
  timestamp can never desynchronize (a per-column carry would splice
  columns from different right rows when a value is NULL); side=0
  sorting before side=1 makes the match inclusive at equal timestamps.

One shuffle total; everything else is a codegen'd window.  Skew note:
a hot key serializes its window — pre-split hot keys by time range if
a single key's history exceeds a task (same playbook as the salted
rollups in sinks.py).  Tie-breaks are total-ordered (ts, side,
right id); rows with a NULL timestamp are dropped on entry (a
timestamp-less row can neither match nor be matched), so results are
deterministic and engine-reproducible (the DuckDB oracle states the
identical window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("_side", "_rid", "_rts", "_match")


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
    (same numeric units as ``ts_col``) voids matches older than
    ``left.ts - tolerance``.  ``value_cols`` must not collide with
    left columns, and left must not carry the reserved working names
    or the output column name (alias first)."""
    out_ts = f"{ts_col}{suffix}"
    clash = [
        c
        for c in left.columns
        if c in value_cols or c in _RESERVED or c == out_ts
    ]
    if clash:
        raise ValueError(
            f"left column(s) {clash} collide with value_cols, the "
            f"reserved working names {_RESERVED}, or {out_ts!r}; "
            f"alias them before calling asof_join"
        )
    # value_cols carrying a reserved name would build a match struct
    # with duplicate fields and die later in an ambiguous-reference
    # AnalysisException — reject here with the designed message
    v_clash = [c for c in value_cols if c in _RESERVED]
    if v_clash:
        raise ValueError(
            f"value_cols {v_clash} collide with the reserved working "
            f"names {_RESERVED}; alias them before calling asof_join"
        )

    match_type = (
        "struct<"
        + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}"
            for c in value_cols
        )
        + f",_rts:{right.schema[ts_col].dataType.simpleString()}>"
    )
    l_tag = left.where(F.col(ts_col).isNotNull()).select(
        *left.columns,
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_id_col].dataType).alias("_rid"),
        F.lit(None).cast(match_type).alias("_match"),
    )
    r_tag = right.where(F.col(ts_col).isNotNull()).select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(right_id_col).alias("_rid"),
        F.struct(
            *[F.col(c) for c in value_cols],
            F.col(ts_col).alias("_rts"),
        ).alias("_match"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on and c != ts_col
        ],
    )

    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(ts_col).asc_nulls_last(),
            F.col("_side").asc(),
            F.col("_rid").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_c", F.last("_match", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_side") == 1)
    keep_match = (
        F.col("_c._rts").isNotNull()
        if tolerance is None
        else F.col("_c._rts") >= F.col(ts_col) - F.lit(tolerance)
    )
    return out.select(
        *left.columns,
        *[F.when(keep_match, F.col(f"_c.{c}")).alias(c) for c in value_cols],
        F.when(keep_match, F.col("_c._rts")).alias(out_ts),
    )
