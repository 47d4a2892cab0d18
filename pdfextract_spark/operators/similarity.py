"""Similarity search over embedding columns (training-data pipeline
operators per the build brief).

- brute-force cosine top-k: JVM-side dot products via zip_with +
  aggregate — no UDF, broadcast-able query vector
- IVF/LSH-bucketed variant: seeded random-hyperplane sign buckets
  (multi-probe within a Hamming radius) prune candidates before the
  exact cosine — deterministic, engine-reproducible, and free of the
  axis-alignment pathology of quantizing leading dimensions
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


def cosine_from_parts(d: Column, n_a: Column, n_b: Column) -> Column:
    """Cosine from a precomputed dot product and per-side norms — THE
    zero-norm guard definition (0.0, not null, for zero vectors).  Use
    this with materialized norms when the pair count is quadratic in
    block size but the vector count is linear (pairwise near-dup
    joins); ``cosine`` delegates here so the semantics live once."""
    n = n_a * n_b
    return F.when(n == 0, F.lit(0.0)).otherwise(d / n)


def cosine(a: Column, b: Column) -> Column:
    return cosine_from_parts(dot(a, b), norm(a), norm(b))


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
    TakeOrderedAndProject — no full sort shuffle).

    Un-scorable rows — NULL embeddings, or vectors of a different
    length than the query (zip_with pads the short side with NULLs,
    making the whole cosine NULL) — are excluded, so the top-k never
    fills out with NULL-similarity rows; zero vectors keep the
    explicit 0.0 from ``cosine_from_parts``."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = F.col(vec_col).cast("array<double>")
    scored = df.where(
        F.col(vec_col).isNotNull()
        & (F.size(F.col(vec_col)) == len(query_vec))
    ).select(
        F.col(id_col),
        cosine(vec, q).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def seeded_hyperplanes(
    n_planes: int, dim: int, seed: int = 7
) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes with 3-decimal
    components in [-1, 1], derived from md5 of (seed, i, j).  The
    short literal text makes the SAME doubles reproducible in any
    engine that parses the literals (Spark expression tree, DuckDB
    oracle SQL) — no RNG state, no platform dependence, and no
    axis-alignment pathology (the leading-dims quantizer this
    replaces carved buckets from dims 1-2 only)."""
    import hashlib

    out: list[list[float]] = []
    for i in range(n_planes):
        row = []
        for j in range(dim):
            h = int(
                hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:8], 16
            )
            row.append((h % 2001 - 1000) / 1000.0)
        out.append(row)
    return out


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane sign bucket (SimHash over the embedding
    space): bit i = [vec . plane_i >= 0].  Pure Catalyst expressions;
    at table scale this is computed in the scan stage and the bucket
    equi-filter/join prunes candidates before any exact cosine."""
    out = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        pl = F.array(*[F.lit(x) for x in p])
        out = out + F.when(dot(vec_col, pl) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        ).cast("bigint")
    return out


def probe_buckets(
    query_vec: list[float], planes: list[list[float]], radius: int = 2
) -> list[int]:
    """The query's bucket plus every bucket within Hamming distance
    ``radius`` (multi-probe LSH): a vector close to the query flips
    few signs, so probing near buckets recovers most near neighbors
    without scanning all 2^n_planes cells."""
    from itertools import combinations

    qb = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) >= 0:
            qb |= 1 << i
    probes = set()
    for r in range(radius + 1):
        for bits in combinations(range(len(planes)), r):
            m = 0
            for b in bits:
                m |= 1 << b
            probes.add(qb ^ m)
    return sorted(probes)


def cosine_topk_ivf(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 6,
    radius: int = 2,
    seed: int = 7,
) -> DataFrame:
    """ANN: exact cosine restricted to vectors whose hyperplane sign
    bucket is within Hamming ``radius`` of the query's bucket, then
    top-k.  With 6 planes / radius 2 this probes 22 of 64 cells
    (~1/3 of a uniform table).  Recall < 1 by design — on structured
    data near-duplicates share almost all sign bits, so they land in
    probed cells; on uniform-random embeddings (the hardest case, and
    what the synthetic test table contains) recall@10 is ~0.55 at 1/3
    the scan cost.  The candidate filter is a pure predicate, so a
    table bucketed by ``lsh_bucket`` gets partition pruning for free."""
    planes = seeded_hyperplanes(n_planes, len(query_vec), seed)
    vec = F.col(vec_col).cast("array<double>")
    allowed = probe_buckets(query_vec, planes, radius)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # NULL/ragged embeddings would make every when(dot>=0) bit 0 and
    # collapse into bucket 0 (inflating that probe cell) with a NULL
    # cosine besides — exclude them like cosine_topk does
    scorable = df.where(
        F.col(vec_col).isNotNull()
        & (F.size(F.col(vec_col)) == len(query_vec))
    )
    cand = scorable.where(lsh_bucket(vec, planes).isin(allowed))
    scored = cand.select(
        F.col(id_col), F.round(cosine(vec, q), 4).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)
