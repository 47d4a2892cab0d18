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

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def extract_stream(stream_df: DataFrame, settings: Settings = DEFAULT) -> DataFrame:
    """Apply the extraction plan to a streaming DataFrame.  Stateless:
    the identical mapInArrow stage is streaming-safe."""
    return extract(stream_df, settings)


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
    stream_result: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Late-data-tolerant per-conversation metric stream: watermarked
    session-style aggregation over the extraction output."""
    return (
        stream_result.withColumn("ts", F.current_timestamp())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes"), F.col("conv_id"))
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
    the price of bounded state, stated rather than hidden."""
    from ..operators.dedup import text_hash

    return (
        stream_df.withColumn("_text_hash", text_hash(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_text_hash"])
        .drop("_text_hash")
    )
