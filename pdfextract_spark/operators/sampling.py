"""Deterministic corpus sampling (training-data pipeline op).

Random sampling (``df.sample``) is not reproducible across runs,
executors, or engines; production corpus pipelines sample by HASH so
the same document always lands on the same side of the cut — stable
under retries, resumable jobs, and incremental reprocessing.  md5 is
used (not xxhash64) so the decision is engine-portable and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, buckets: int = 16) -> Column:
    """Stable bucket in [0, buckets) from the md5 of a key column.
    Uses the first 8 hex chars -> bigint, mod buckets."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % buckets


def hash_sample(
    df: DataFrame, key_col: str, rate_buckets: int, of_buckets: int = 16
) -> DataFrame:
    """Keep rows whose hash bucket < rate_buckets (rate_buckets /
    of_buckets of the corpus, deterministically)."""
    return df.where(hash_bucket(F.col(key_col), of_buckets) < rate_buckets)


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    rate_buckets: int,
    of_buckets: int = 16,
) -> DataFrame:
    """Per-stratum deterministic sample: the hash mixes the stratum in
    so one stratum's cut is independent of another's (a document id
    reused across sources does not correlate their samples)."""
    key = F.concat_ws("#", F.col(stratum_col), F.col(key_col).cast("string"))
    return df.where(hash_bucket(key, of_buckets) < rate_buckets)
