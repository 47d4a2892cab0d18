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
    """Stable bucket from (conv_id, turn_idx) — with the hash inputs
    pinned to (string, int) FIRST: xxhash64 of the same value under a
    different type is a different hash (int 5 vs bigint 5 land in
    different buckets, verified), and this function is applied both
    to the INPUT for scheduling and to the extraction OUTPUT (whose
    turn_idx is int32) for the partition write — an input arriving
    with a bigint turn_idx would otherwise write rows into OTHER
    batches' partitions, which later batches then overwrite (silent
    data loss) while lineage undercounts."""
    return df.withColumn(
        "bucket",
        F.pmod(
            F.xxhash64(
                F.col("conv_id").cast("string"),
                F.col("turn_idx").cast("int"),
            ),
            F.lit(n_buckets),
        ).cast("int"),
    )


def completed_buckets(
    spark: SparkSession, out_dir: str, n_buckets: int | None = None
) -> set[int]:
    """Bucket ids with a committed lineage row.  Only a MISSING
    lineage path means "nothing done yet" — any other read failure
    propagates (swallowing it would silently reprocess a finished job
    and append duplicate lineage rows).  When ``n_buckets`` is given,
    a lineage table recorded under a different bucketing refuses to
    resume: the old bucket ids would mis-assign rows under the new
    hash, silently skipping data."""
    # empty-start classification shared with the streaming bloom
    # store — see ioutil.is_empty_start_exc for why only missing-path
    # reads may map to "nothing committed yet"
    from .ioutil import read_parquet_or_none

    lineage = read_parquet_or_none(
        spark, f"{out_dir}/{LINEAGE_SUBDIR}", merge_schema=True
    )
    if lineage is None:
        return set()
    if n_buckets is not None and "n_buckets" in lineage.columns:
        bad = (
            lineage.where(
                F.col("n_buckets").isNotNull()
                & (F.col("n_buckets") != n_buckets)
            )
            .select("n_buckets")
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(
                f"lineage at {out_dir} was committed with "
                f"n_buckets={bad[0][0]}; resuming with "
                f"n_buckets={n_buckets} would assign different rows to "
                f"already-'done' bucket ids — rerun with the original "
                f"bucketing or a fresh out_dir"
            )
    rows = lineage.select("bucket").distinct().collect()
    return {r[0] for r in rows}


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
    # per-job override, restored afterwards — permanently flipping the
    # session's overwrite semantics would change unrelated later writes
    _OVR = "spark.sql.sources.partitionOverwriteMode"
    prev_mode = spark.conf.get(_OVR, None)
    spark.conf.set(_OVR, "dynamic")
    try:
        src = with_bucket(transcripts, n_buckets)

        if resume:
            done = completed_buckets(spark, out_dir, n_buckets)
        else:
            # a full reprocess must start from EMPTY lineage: output
            # partitions are overwritten below, but lineage appends
            # per batch — without this truncation a resume=False
            # rerun over an existing out_dir stacks a second
            # generation of rows and every downstream metric sum
            # double-counts
            from .ioutil import delete_path

            delete_path(spark, f"{out_dir}/{LINEAGE_SUBDIR}")
            done = set()
        todo = [b for b in range(n_buckets) if b not in done]

        for i in range(0, len(todo), buckets_per_batch):
            batch = todo[i : i + buckets_per_batch]
            part = src.where(F.col("bucket").isin(batch))
            # recompute the bucket from the same hash instead of
            # joining it back — the extraction output keeps (conv_id,
            # turn_idx), so the bucket is a pure projection (no
            # shuffle).  persist(): the output write and the lineage
            # aggregation both consume the result, and the extraction
            # kernel is the dominant cost — without the persist it
            # would run twice per batch.
            result = with_bucket(
                extract(part, settings, on_error=on_error, want=want),
                n_buckets,
            ).persist()
            try:
                result.write.mode("overwrite").partitionBy(
                    "bucket"
                ).parquet(out_dir)

                agg = result.groupBy("bucket").agg(
                    F.count("*").alias("rows_out"),
                    F.sum("metrics.chars_in").alias("chars_in"),
                    F.sum("metrics.chars_truncated").alias(
                        "chars_truncated"
                    ),
                    F.sum("metrics.regions_found").alias("regions_found"),
                    F.sum("metrics.sections_found").alias(
                        "sections_found"
                    ),
                    F.sum("metrics.refs_matched").alias("refs_matched"),
                    F.sum(
                        F.when(F.col("page_count") < 0, 1).otherwise(0)
                    ).alias("turns_errored"),
                )
                # one lineage row per SCHEDULED bucket, zero-filled for
                # empty ones — a bucket with no input rows must still
                # commit, or resume would reprocess it forever
                sched = spark.createDataFrame(
                    [(int(b),) for b in batch], "bucket int"
                )
                zero = F.lit(0).cast("bigint")
                lineage = (
                    sched.join(agg, "bucket", "left")
                    .select(
                        "bucket",
                        F.coalesce("rows_out", zero).alias("rows_out"),
                        F.coalesce("chars_in", zero).alias("chars_in"),
                        F.coalesce("chars_truncated", zero).alias(
                            "chars_truncated"
                        ),
                        F.coalesce("regions_found", zero).alias(
                            "regions_found"
                        ),
                        F.coalesce("sections_found", zero).alias(
                            "sections_found"
                        ),
                        F.coalesce("refs_matched", zero).alias(
                            "refs_matched"
                        ),
                        F.coalesce("turns_errored", zero).alias(
                            "turns_errored"
                        ),
                    )
                    .withColumn("n_buckets", F.lit(n_buckets))
                    .withColumn("committed_at", F.lit(time.time()))
                )
                lineage.write.mode("append").parquet(
                    f"{out_dir}/{LINEAGE_SUBDIR}"
                )
            finally:
                result.unpersist()
    finally:
        if prev_mode is None:
            spark.conf.unset(_OVR)
        else:
            spark.conf.set(_OVR, prev_mode)

    # mergeSchema: lineage written before a schema addition (e.g.
    # turns_errored, n_buckets) must still read consistently on
    # resumed jobs
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
        # writeTo has no analogue for 'ignore'/'errorifexists' — map
        # only the two supported modes and refuse the rest instead of
        # silently appending to a table the caller asked to leave
        # untouched (or to fail on)
        if mode not in ("overwrite", "append"):
            raise ValueError(
                f"mode {mode!r} is not supported on the Iceberg "
                f"branch (only 'overwrite'/'append'); the parquet "
                f"branch honors {mode!r} — pass storage='parquet'"
            )
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
