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
    Uses the first 8 hex chars -> bigint, mod buckets.  NULL keys
    coalesce to a sentinel BEFORE hashing: md5(NULL) is NULL and
    ``NULL < rate`` filters to nothing, so without the sentinel every
    NULL-key row would be silently dropped even at a 100% sampling
    rate.  All NULL keys form ONE hash class (they move through the
    cut together — the determinism contract treats equal keys as one
    unit, and SQL NULLs are indistinguishable)."""
    s = F.coalesce(col.cast("string"), F.lit("\x00<null>"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast(
        "bigint"
    ) % buckets


def hash_sample(
    df: DataFrame, key_col: str, rate_buckets: int, of_buckets: int = 16
) -> DataFrame:
    """Keep rows whose hash bucket < rate_buckets (rate_buckets /
    of_buckets of the corpus, deterministically)."""
    return df.where(hash_bucket(F.col(key_col), of_buckets) < rate_buckets)


def _part(col: Column) -> Column:
    """Unambiguous NULL-safe encoding of one compound-key part: 'n'
    for NULL, else 'v' + length + ':' + value.  The length prefix
    makes part boundaries unambiguous — with a bare '#' separator,
    (stratum='a#b', key='c') and (stratum='a', key='b#c') hashed
    identically and always landed on the same side of the cut — and
    the n/v flag separates NULL from the empty string."""
    s = col.cast("string")
    return F.when(s.isNull(), F.lit("n")).otherwise(
        F.concat(F.lit("v"), F.length(s).cast("string"), F.lit(":"), s)
    )


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    rate_buckets: int,
    of_buckets: int = 16,
) -> DataFrame:
    """Per-stratum deterministic sample: the hash mixes the stratum in
    so one stratum's cut is independent of another's (a document id
    reused across sources does not correlate their samples).  Parts
    are length-prefix encoded (``_part``) so separator characters in
    the data and NULLs cannot alias two different (stratum, key)
    pairs onto one hash."""
    key = F.concat(
        _part(F.col(stratum_col)), F.lit("#"), _part(F.col(key_col))
    )
    return df.where(hash_bucket(key, of_buckets) < rate_buckets)
