"""Ideal-vector scoring (SURVEY.md A9, spatial.rb:156-175).

Per feature f with (ideal, weight): diff = |x_f - ideal| (NaN -> 1),
normalized by the max diff across the group; an exact-0 diff earns the
full weight; score = sum over features.  Pure window arithmetic — no
UDF, fully codegen'd, one shuffle on the group keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ideal_score(
    df: DataFrame,
    part_cols: list[str],
    ideals: dict[str, tuple[float, float]],
    out_col: str = "score",
) -> DataFrame:
    w = Window.partitionBy(*part_cols)
    total = F.lit(0.0)
    cur = df
    for f, (ideal, weight) in ideals.items():
        d_raw = F.abs(F.col(f) - F.lit(float(ideal)))
        # a NULL feature must degrade like the NaN worst case, not
        # propagate NULL through the contribution sum and erase every
        # OTHER feature's weight from the row's score
        d = F.when(
            F.col(f).isNull() | F.isnan(d_raw), F.lit(1.0)
        ).otherwise(d_raw)
        dcol = f"_d_{f}"
        cur = cur.withColumn(dcol, d)
        mx = F.max(F.col(dcol)).over(w)
        contrib = F.when(F.col(dcol) == 0, F.lit(float(weight))).otherwise(
            (F.lit(1.0) - F.col(dcol) / mx) * F.lit(float(weight))
        )
        total = total + contrib
    return cur.withColumn(out_col, total).drop(
        *[f"_d_{f}" for f in ideals]
    )
