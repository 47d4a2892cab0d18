"""Resumable, checkpointed extraction runs with per-partition lineage
and metrics (BASELINE.json north_rule: "resumable from checkpoint with
per-partition lineage + metrics").

Mechanism (Iceberg-shaped, parquet-backed in this sandbox):
- the turn keyspace is split into ``n_buckets`` stable buckets via
  pmod(xxhash64(conv_id, turn_idx), n) — the same hash the extraction
  plan repartitions by, so bucket == physical partition lineage unit
- output written as parquet partitioned by ``bucket`` (with Iceberg
  this is a hidden-partition ``bucket(conv_id, N)`` transform and each
  batch commit is a snapshot)
- after each bucket-batch commit, one lineage row per bucket is
  appended to ``<out>/_lineage`` recording rows/chars/regions/refs
- ``resume=True`` reads the lineage table and processes only buckets
  without a committed lineage row; re-running a partially-failed job
  is idempotent (dynamic partition overwrite replaces any partial
  bucket output)
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.extract import extract
from .settings import DEFAULT, Settings

LINEAGE_SUBDIR = "_lineage"


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.col("conv_id"), F.col("turn_idx")), F.lit(n_buckets)).cast(
            "int"
        ),
    )


def completed_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    try:
        rows = (
            spark.read.option("mergeSchema", "true")
            .parquet(f"{out_dir}/{LINEAGE_SUBDIR}")
            .select("bucket")
            .distinct()
            .collect()
        )
        return {r[0] for r in rows}
    except Exception:
        return set()


def run_extraction_job(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    settings: Settings = DEFAULT,
    n_buckets: int = 64,
    buckets_per_batch: int = 16,
    resume: bool = True,
    on_error: str = "fail",
    want: tuple[str, ...] | None = None,
) -> DataFrame:
    """Execute the extraction over all (remaining) buckets in batches,
    committing output + lineage per batch.  Returns the lineage table.

    Batches bound the blast radius of a failure: a crash loses at most
    one uncommitted batch, and ``resume=True`` picks up from the last
    committed lineage row.  With Iceberg, replace the parquet writes
    with ``writeTo(...).overwritePartitions()`` — the logic is
    unchanged.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    src = with_bucket(transcripts, n_buckets)

    done = completed_buckets(spark, out_dir) if resume else set()
    todo = [b for b in range(n_buckets) if b not in done]

    for i in range(0, len(todo), buckets_per_batch):
        batch = todo[i : i + buckets_per_batch]
        part = src.where(F.col("bucket").isin(batch))
        # recompute the bucket from the same hash instead of joining it
        # back — the extraction output keeps (conv_id, turn_idx), so the
        # bucket is a pure projection (no shuffle).
        result = with_bucket(
            extract(part, settings, on_error=on_error, want=want), n_buckets
        )
        result.write.mode("overwrite").partitionBy("bucket").parquet(out_dir)

        lineage = (
            result.groupBy("bucket")
            .agg(
                F.count("*").alias("rows_out"),
                F.sum("metrics.chars_in").alias("chars_in"),
                F.sum("metrics.chars_truncated").alias("chars_truncated"),
                F.sum("metrics.regions_found").alias("regions_found"),
                F.sum("metrics.sections_found").alias("sections_found"),
                F.sum("metrics.refs_matched").alias("refs_matched"),
                F.sum(
                    F.when(F.col("page_count") < 0, 1).otherwise(0)
                ).alias("turns_errored"),
            )
            .withColumn("committed_at", F.lit(time.time()))
        )
        lineage.write.mode("append").parquet(f"{out_dir}/{LINEAGE_SUBDIR}")

    # mergeSchema: lineage written before a schema addition (e.g.
    # turns_errored) must still read consistently on resumed jobs
    return spark.read.option("mergeSchema", "true").parquet(
        f"{out_dir}/{LINEAGE_SUBDIR}"
    )


def salted_conv_partials(result: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Phase 1 of the skew-safe conv rollup: partial aggregates per
    (conv_id, salt) so no single task ever sees a whole hot
    conversation.  Exposed separately so tests can assert the bound on
    the production salting, not a reimplementation."""
    salted = result.withColumn(
        "_salt", F.pmod(F.xxhash64("turn_idx"), F.lit(salt_buckets))
    )
    return salted.groupBy("conv_id", "_salt").agg(
        F.count("*").alias("turns"),
        F.sum("metrics.chars_in").alias("chars_in"),
        F.sum("metrics.refs_matched").alias("refs_matched"),
    )


def conv_metrics_rollup(result: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Conversation-level metric rollup with two-phase (salted)
    aggregation — the one place conv-level skew matters (SURVEY.md §4
    'Skewed long conversations'): a 10^8-turn conversation would
    hot-spot a naive groupBy(conv_id), so partials are computed per
    (conv_id, salt) first, then combined."""
    partial = salted_conv_partials(result, salt_buckets)
    return partial.groupBy("conv_id").agg(
        F.sum("turns").alias("turns"),
        F.sum("chars_in").alias("chars_in"),
        F.sum("refs_matched").alias("refs_matched"),
    )


def write_table(
    df: DataFrame,
    target: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    storage: str = "auto",
) -> str:
    """Storage-dispatching sink: Iceberg ``writeTo`` when ``target`` is
    a catalog identifier (``catalog.db.table``) and an Iceberg catalog
    is on the classpath, parquet path otherwise.  Keeps every plan
    upstream identical — the north_rule's Iceberg story concretely:
    swapping storage is this one function.  Returns 'iceberg' or
    'parquet' for the path taken.

    Dispatch is explicit-first: ``storage='iceberg'`` / ``'parquet'``
    forces the branch, as does an ``iceberg:`` target prefix.  In
    ``'auto'`` mode a slash-free dotted string is an Iceberg
    identifier *unless* it ends in a file extension (``.parquet`` /
    ``.pq``), so a relative path like ``'out.parquet'`` writes parquet
    instead of erroring on a missing catalog."""
    if storage not in ("auto", "iceberg", "parquet"):
        raise ValueError(f"storage must be auto|iceberg|parquet, got {storage!r}")
    if target.startswith("iceberg:"):
        if storage == "parquet":
            raise ValueError(
                f"contradictory dispatch: target {target!r} has an "
                f"'iceberg:' prefix but storage='parquet' was passed"
            )
        target = target[len("iceberg:"):]
        storage = "iceberg"
    if storage == "auto":
        file_like = target.rsplit(".", 1)[-1].lower() in ("parquet", "pq")
        storage = (
            "iceberg"
            if "/" not in target and target.count(".") >= 1 and not file_like
            else "parquet"
        )
    if storage == "iceberg":
        try:
            w = df.writeTo(target)
            if partition_by:
                from pyspark.sql.functions import col as _col

                w = w.partitionedBy(*[_col(c) for c in partition_by])
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return "iceberg"
        except Exception as exc:  # no catalog / no iceberg jars
            raise RuntimeError(
                f"writeTo({target!r}) failed — is an Iceberg catalog "
                f"configured? Underlying error: {exc}"
            ) from exc
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(target)
    return "parquet"


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist as a Hive-bucketed table: rows are hash-distributed into
    ``n_buckets`` files per partition BY THE WRITER, so later joins or
    aggregations on ``bucket_cols`` between tables bucketed the same
    way need NO exchange — the co-located-join layout for tables that
    are joined repeatedly (e.g. transcripts x resolved references on
    conv_id).  Bucketing metadata lives in the session catalog, hence
    ``saveAsTable`` (plain ``.parquet(path)`` cannot carry it); on a
    cluster the same call writes through the shared metastore/Iceberg
    catalog.  ``sort_cols`` additionally sorts within each bucket so a
    sort-merge join skips its sort as well."""
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
