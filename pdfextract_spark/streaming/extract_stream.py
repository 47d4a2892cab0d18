"""Incremental extraction via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.8) and nothing in its
semantics needs streaming state: every turn is independent.  That
makes the streaming story trivial and strong — the same stateless
mapInArrow stage runs under a streaming plan, giving exactly-once
incremental extraction over an arriving transcript feed (file drops
here; Kafka/Iceberg-CDC on a cluster) with checkpointed resume.

No watermarks or stateful operators are required: per-turn extraction
commutes with arrival order.  Conversation-level rollups on top of the
stream would use ``withWatermark("ts", ...)`` + windowed aggregation;
that path is provided for the metrics stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.extract import extract
from ..settings import DEFAULT, Settings
from ..sources.tables import TRANSCRIPT_DDL  # single schema authority

# TRANSCRIPT_DDL re-exported for existing importers — listed ALONGSIDE
# the module's own functions (an __all__ of just the re-export would
# hide them from star imports)
__all__ = [
    "TRANSCRIPT_DDL",
    "extract_stream",
    "start_file_stream",
    "streaming_conv_metrics",
    "streaming_dedup_exact",
]


def extract_stream(
    stream_df: DataFrame,
    settings: Settings = DEFAULT,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Apply the extraction plan to a streaming DataFrame.  Stateless:
    the identical mapInArrow stage is streaming-safe.  ``carry``
    passes input columns (e.g. the event-time ``ts``) through to the
    output verbatim — required upstream of any watermarked
    aggregation over the extraction results."""
    return extract(stream_df, settings, carry=carry)


def start_file_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    settings: Settings = DEFAULT,
    trigger_once: bool = True,
):
    """Watch ``in_dir`` for parquet transcript drops, extract, append
    to ``out_dir`` with exactly-once checkpointing.

    ``trigger_once`` processes available data and stops (the Iceberg
    'incremental batch' pattern); set False for continuous microbatch."""
    src = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .parquet(in_dir)
    )
    result = extract_stream(src, settings)
    writer = (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_conv_metrics(
    stream_result: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Late-data-tolerant per-conversation metric stream: watermarked
    EVENT-time aggregation over the extraction output.

    ``stream_result`` must carry the event-time column — produce it
    with ``extract_stream(src, carry=("ts",))``.  (An earlier version
    stamped processing time here, which silently made the watermark a
    no-op: all rows in a microbatch shared one timestamp, so nothing
    could ever be late and a replayed conversation landed in
    arrival-time windows instead of its own.)"""
    if ts_col not in stream_result.columns:
        raise ValueError(
            f"streaming_conv_metrics needs event-time column "
            f"{ts_col!r}; build the stream with "
            f"extract_stream(src, carry=({ts_col!r},))"
        )
    return (
        stream_result.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "5 minutes"), F.col("conv_id"))
        .agg(
            F.count("*").alias("turns"),
            F.sum("metrics.refs_matched").alias("refs_matched"),
        )
    )


def streaming_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: keep the FIRST arrival of each normalized
    text; later copies arriving within the watermark horizon are
    dropped (``dropDuplicatesWithinWatermark`` keyed on the md5 of the
    normalized text, the same hash ``operators.dedup.exact_dedup``
    groups on in batch).

    This is the ingest-side shape of corpus dedup at 10^12-turn scale:
    state is bounded by the watermark (keys older than the horizon are
    evicted), so the query runs forever on a firehose — the batch
    operator then handles the full-corpus pass.  Duplicates farther
    apart than the watermark are deliberately NOT caught here; that is
    the price of bounded state, stated rather than hidden.

    NULL-text rows (tool turns, PERMISSIVE-parsed malformed rows) are
    NOT duplicates of each other — they bypass the dedup entirely and
    union back in (md5(NULL) is NULL, and a NULL dedup key would
    collapse every NULL-text row into the first one: mass row loss,
    the same bug class the batch near-dup operator fixed)."""
    from ..operators.dedup import text_hash

    hashed = stream_df.withColumn(
        "_text_hash", text_hash(F.col(text_col))
    )
    nulls = hashed.where(F.col(text_col).isNull()).drop("_text_hash")
    deduped = (
        hashed.where(F.col(text_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_text_hash"])
        .drop("_text_hash")
    )
    return deduped.unionByName(nulls)
