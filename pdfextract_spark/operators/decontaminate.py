"""Benchmark decontamination (training-data pipeline op).

Before training on a web-scale corpus, documents sharing long n-grams
with evaluation benchmarks must be found and dropped (the 13-gram rule
popularized by GPT-3's data work).  The Spark shape: shingle both
sides, build the (small) benchmark shingle set, hash-join corpus
shingles against it, count distinct hits per document — work scales
with corpus size + matches, never corpus x benchmark.

The benchmark side is tiny relative to the corpus (thousands of eval
documents vs billions of training documents), so its distinct-shingle
set broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """-> one row per corpus doc: n_shingles, n_contaminated (distinct
    shingles also present anywhere in the benchmark), hit_rate.

    Documents shorter than n words have zero shingles and report a
    0.0 hit rate (nothing to match on — the length-based filters in
    quality.py are the right tool for those).

    Plan shape: explode -> (doc, shingle) pre-aggregation -> join ->
    plain counts.  The pre-agg collapses within-doc repeats so every
    downstream aggregate is a map-side-combinable COUNT/SUM — the
    former count_distinct form planned an Expand (x3 row
    multiplication for the two distinct aggregates) over every
    exploded shingle.  (Do NOT carry a computed total column through
    the explode instead: Generate re-evaluates carried expressions
    once per OUTPUT row — measured 30x slower.)"""
    c = (
        corpus.select(
            F.col(id_col),
            F.explode_outer(word_shingles(F.col(text_col), n)).alias("sh"),
        )
        .groupBy(id_col, "sh")
        .agg(F.count("sh").alias("_c"))
    )
    b = (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("sh")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = c.join(F.broadcast(b), "sh", "left")
    return joined.groupBy(id_col).agg(
        F.sum("_c").alias("n_shingles"),
        F.count("_hit").alias("n_contaminated"),
        F.round(
            F.when(
                F.count("sh") > 0,
                F.count("_hit").cast("double") / F.count("sh"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("hit_rate"),
    )
