"""Shared IO helpers for resumable stores.

Both resumable stores in this package (the lineage sink in
``sinks.py`` and the streaming bloom store in
``streaming/bloom_ingest.py``) need the same read classification: a
MISSING store means "nothing committed yet" and the job starts fresh,
while any OTHER read failure must propagate — mapping a real error
(column resolution, catalog problems, permissions) to "empty start"
would silently reprocess finished work and append duplicates.  The
classifier lives here once so a Spark error-condition rename is fixed
in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["delete_path", "is_empty_start_exc", "read_parquet_or_none"]


def delete_path(spark: SparkSession, path: str) -> bool:
    """Recursively delete ``path`` via the Hadoop FileSystem API (so
    it works on any Spark-supported filesystem, not just local disk).
    Returns True if something was deleted, False if the path did not
    exist."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    return bool(fs.delete(hpath, True))

# ONLY "nothing committed yet" reads are benign: a missing path
# (PATH_NOT_FOUND), or an existing dir with no data files
# (UNABLE_TO_INFER_SCHEMA — reachable when a job crashed between
# mkdir and its first task commit).
_BENIGN_CONDITIONS = {"PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"}


def is_empty_start_exc(exc: Exception) -> bool:
    """True when ``exc`` (an AnalysisException from reading a store
    path) means the store simply does not exist yet.  Prefers the
    structured error condition (``getCondition``, falling back to the
    deprecated ``getErrorClass``); message sniffing is the last resort
    for builds that expose neither."""
    cond = None
    for attr in ("getCondition", "getErrorClass"):
        getter = getattr(exc, attr, None)
        if getter is not None:
            try:
                cond = getter()
            except Exception:
                cond = None
            if cond:
                break
    if cond:
        return cond in _BENIGN_CONDITIONS
    return (
        "Path does not exist" in str(exc)
        or "Unable to infer schema" in str(exc)
    )


def read_parquet_or_none(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame | None:
    """Read a parquet store, returning None when it does not exist
    yet and re-raising every other AnalysisException."""
    from pyspark.errors import AnalysisException

    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    try:
        return reader.parquet(path)
    except AnalysisException as exc:
        if is_empty_start_exc(exc):
            return None
        raise
