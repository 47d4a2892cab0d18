"""Similarity search over embedding columns (training-data pipeline
operators per the build brief).

- brute-force cosine top-k: JVM-side dot products via zip_with +
  aggregate — no UDF, broadcast-able query vector
- LSH/IVF-bucketed variant: random-hyperplane-free deterministic
  bucketing by coarse quantization of leading dimensions (scale path:
  the bucket join prunes candidates before the exact cosine)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    d = dot(a, b)
    n = norm(a) * norm(b)
    return F.when(n == 0, F.lit(0.0)).otherwise(d / n)


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    The query is a literal array (constant-folded, shipped once per
    task); the scan is embarrassingly parallel; the final top-k is a
    single takeOrdered-style reduction (orderBy + limit lowers to
    TakeOrderedAndProject — no full sort shuffle)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = F.col(vec_col).cast("array<double>")
    scored = df.select(
        F.col(id_col),
        cosine(vec, q).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def ivf_bucket(vec_col: Column, dims: int = 2, width: float = 0.2) -> Column:
    """Deterministic coarse bucket id: quantize the first ``dims``
    components.  Stands in for IVF centroids without ML-fitting; the
    scale path is identical (bucket equi-join prunes the search)."""
    parts = [
        F.floor(F.element_at(vec_col, i + 1).cast("double") / F.lit(width)).cast(
            "bigint"
        )
        for i in range(dims)
    ]
    out = F.lit(0).cast("bigint")
    for p in parts:
        out = out * 1000 + p
    return out


def cosine_topk_ivf(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    dims: int = 2,
    width: float = 0.2,
    probe: int = 1,
) -> DataFrame:
    """ANN: restrict the exact cosine to vectors in the query's
    quantization bucket (+/- probe cells per dim), then top-k.
    Recall < 1 by design; the candidate filter is a pure predicate so
    Parquet row-group stats can prune when the table is bucketed."""
    vec = F.col(vec_col).cast("array<double>")
    bucket = ivf_bucket(vec, dims, width)

    import math

    q_cells = [math.floor(query_vec[i] / width) for i in range(dims)]
    allowed = []

    def expand(i: int, acc: list[int]) -> None:
        if i == dims:
            code = 0
            for c in acc:
                code = code * 1000 + c
            allowed.append(code)
            return
        for d in range(-probe, probe + 1):
            expand(i + 1, acc + [q_cells[i] + d])

    expand(0, [])
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = df.where(bucket.isin(allowed))
    scored = cand.select(F.col(id_col), cosine(vec, q).alias("cos_sim"))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)
