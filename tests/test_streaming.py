"""Structured Streaming coverage (SURVEY.md §2.8 note).

Every reference stage is turn-local, so the identical stateless
mapInArrow extraction plan runs unchanged under a streaming plan.
These tests pin the two properties that matter operationally:

1. stream output == batch output per turn (same extraction semantics
   under a micro-batch plan);
2. checkpointed resume is exactly-once: a second file drop processed
   with the same checkpoint emits only the new turns, no re-emits.
"""

import pytest

pytestmark = pytest.mark.spark

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _texts(start, n):
    out = []
    for i in range(start, start + n):
        out.append(
            f"Title Of Turn {i}\n\n"
            + " ".join(f"body word{j} alpha beta" for j in range(40))
            + "\n\nReferences\n\n"
            + " ".join(
                f"[{k}] Author{k}, A. ({1990 + k}). Paper {k} of turn {i}. Venue."
                for k in range(1, 4)
            )
        )
    return out


def _drop(spark, in_dir, start, n):
    import datetime

    rows = [
        (
            f"c{(start + i) % 2}",
            start + i,
            "user",
            t,
            None,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=start + i),
        )
        for i, t in enumerate(_texts(start, n))
    ]
    (
        spark.createDataFrame(rows, SCHEMA)
        .coalesce(1)
        .write.mode("append")
        .parquet(in_dir)
    )


def _run_once(spark, in_dir, out_dir, ckpt):
    from pdfextract_spark.streaming import start_file_stream

    q = start_file_stream(spark, in_dir, out_dir, ckpt, trigger_once=True)
    assert q.awaitTermination(180), "streaming query did not finish in 180s"
    assert q.exception() is None


def test_stream_matches_batch_then_resumes_exactly_once(spark, tmp_path):
    from pdfextract_spark.plans import extract

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )

    _drop(spark, in_dir, 0, 6)
    _run_once(spark, in_dir, out_dir, ckpt)

    got = {
        r["turn_idx"]: r for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r["turn_idx"]: r
        for r in extract(spark.read.parquet(in_dir)).collect()
    }
    assert sorted(got) == sorted(want) == list(range(6))
    for i in want:
        # per-turn equality of the extracted artifacts (the gate the
        # north_rule defines), spot-checked on title + references text
        assert got[i]["title"] == want[i]["title"]
        assert [x["content"] for x in got[i]["references"]] == [
            x["content"] for x in want[i]["references"]
        ]
        assert got[i]["metrics"] == want[i]["metrics"]

    # second drop: resume from the same checkpoint processes ONLY the
    # new file (exactly-once), appending 4 turns for a total of 10
    _drop(spark, in_dir, 100, 4)
    _run_once(spark, in_dir, out_dir, ckpt)

    final = spark.read.parquet(out_dir)
    assert final.count() == 10
    assert final.select("turn_idx").distinct().count() == 10


def test_streaming_conv_metrics_plan_is_valid(spark, tmp_path):
    """The watermarked rollup builds a legal incremental plan on top of
    the extraction stream (late-data path, SURVEY.md §4)."""
    from pdfextract_spark.streaming import extract_stream
    from pdfextract_spark.streaming.extract_stream import (
        TRANSCRIPT_DDL,
        streaming_conv_metrics,
    )

    in_dir = str(tmp_path / "in")
    _drop(spark, in_dir, 0, 2)
    src = spark.readStream.schema(TRANSCRIPT_DDL).parquet(in_dir)
    rolled = streaming_conv_metrics(extract_stream(src, carry=("ts",)))
    assert rolled.isStreaming
    # event-time contract: a stream without the ts column is rejected
    # loudly instead of silently windowing on processing time
    with pytest.raises(ValueError, match="event-time"):
        streaming_conv_metrics(extract_stream(src))
    q = (
        rolled.writeStream.format("memory")
        .queryName("conv_metrics_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    assert q.exception() is None
    # append-mode watermark holds rows until the watermark passes, so
    # row content isn't asserted here — plan legality + clean run is
    # the contract under test
    spark.sql("SELECT * FROM conv_metrics_t").collect()


def test_stateful_conversation_close_out(spark, tmp_path):
    """applyInPandasWithState session close-out: a conversation's
    summary row is emitted only after the watermark passes its last
    event + gap (i.e. newer data from OTHER conversations arrives),
    and the emitted row aggregates every microbatch that touched the
    conversation; state is then freed."""
    import time

    from pdfextract_spark.streaming.stateful import conversation_sessions

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    ddl = "conv_id string, turn_idx int, role string, text string, ts timestamp"

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def write_batch(rows, path):
        spark.createDataFrame(rows, ddl).write.parquet(path)

    # batch 1: conv A gets two turns (12:00, 12:01)
    write_batch(
        [
            ("A", 0, "user", "hello", t0),
            ("A", 1, "assistant", "hi there", t0 + dt.timedelta(minutes=1)),
        ],
        f"{in_dir}/b1",
    )

    def run_once():
        src = spark.readStream.schema(ddl).option(
            "pathGlobFilter", "*.parquet"
        ).parquet(f"{in_dir}/*")
        q = (
            conversation_sessions(src, gap="10 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # nothing closed yet: watermark has not passed A's last_ts + gap
    got = spark.read.schema(
        "conv_id string, turns int, chars long, last_ts timestamp"
    ).parquet(out_dir)
    assert got.count() == 0

    # batch 2: conv B arrives 30 minutes later -> watermark advances
    # beyond A's timeout; A closes with BOTH its turns aggregated
    write_batch(
        [("B", 0, "user", "later conv", t0 + dt.timedelta(minutes=30))],
        f"{in_dir}/b2",
    )
    run_once()
    # one more empty-advance batch lets the engine evaluate timeouts
    write_batch(
        [("C", 0, "user", "even later", t0 + dt.timedelta(minutes=60))],
        f"{in_dir}/b3",
    )
    run_once()
    rows = {
        r["conv_id"]: r
        for r in spark.read.parquet(out_dir).collect()
    }
    assert "A" in rows
    a = rows["A"]
    assert a["turns"] == 2 and a["chars"] == len("hello") + len("hi there")
    assert a["last_ts"] == t0 + dt.timedelta(minutes=1)
    # B may or may not have closed depending on watermark advance; A's
    # exactly-once close is the stateful contract under test
    assert spark.read.parquet(out_dir).where("conv_id = 'A'").count() == 1


def test_streaming_dedup_exact_drops_watermark_dups(spark, tmp_path):
    """Exact dedup under a streaming plan: duplicates arriving within
    the watermark horizon are dropped (first arrival wins), distinct
    texts all pass; a whitespace/case variant counts as a duplicate
    (same normalized hash as the batch operator)."""
    import datetime

    from pdfextract_spark.streaming import streaming_dedup_exact

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("c0", 0, "user", "unique text one", None, base),
        ("c0", 1, "user", "shared   Text", None, base + datetime.timedelta(seconds=1)),
        ("c1", 2, "user", "shared text", None, base + datetime.timedelta(seconds=2)),
        ("c1", 3, "user", "unique text two", None, base + datetime.timedelta(seconds=3)),
        # NULL-text rows (tool turns) are NOT duplicates of each other:
        # both must survive (a NULL dedup key would collapse them)
        ("c2", 4, "tool", None, "search", base + datetime.timedelta(seconds=4)),
        ("c2", 5, "tool", None, "search", base + datetime.timedelta(seconds=5)),
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(in_dir)
    stream = (
        spark.readStream.schema(SCHEMA).parquet(in_dir)
    )
    deduped = streaming_dedup_exact(stream, watermark="10 minutes")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    assert q.exception() is None
    out = spark.read.parquet(out_dir)
    got = sorted(r["turn_idx"] for r in out.collect())
    # turn 2 ('shared text') is a normalized duplicate of turn 1
    assert got == [0, 1, 3, 4, 5]  # both NULL-text tool turns survive


def test_epoch_ms_helpers_survive_dst_boundaries():
    """The tz helpers must not raise inside applyInPandasWithState on
    DST-observing session zones: a wall clock in the fall-back
    repeated hour resolves deterministically to the DST (earlier)
    instant, a spring-forward-gap wall clock shifts forward to the
    first valid instant, and round-tripping an unambiguous timestamp
    is exact."""
    import pandas as pd

    from pdfextract_spark.streaming.stateful import (
        _from_epoch_ms,
        _to_epoch_ms,
    )

    tz = "America/New_York"
    # 2025-11-02 01:30 happened twice (EDT then EST); ambiguous=True
    # picks the DST occurrence: 01:30 EDT = 05:30 UTC
    amb = pd.Timestamp("2025-11-02 01:30:00")
    ms = _to_epoch_ms(amb, tz)
    assert ms == int(pd.Timestamp("2025-11-02 05:30:00", tz="UTC").value // 1e6)
    # 2025-03-09 02:30 never existed (clocks jumped 02:00 -> 03:00);
    # shift_forward lands on 03:00 EDT = 07:00 UTC
    gap = pd.Timestamp("2025-03-09 02:30:00")
    ms = _to_epoch_ms(gap, tz)
    assert ms == int(pd.Timestamp("2025-03-09 07:00:00", tz="UTC").value // 1e6)
    # unambiguous instants round-trip exactly, both directions
    plain = pd.Timestamp("2025-06-15 12:34:56.789")
    assert _from_epoch_ms(_to_epoch_ms(plain, tz), tz) == plain
    utc_noon = pd.Timestamp("2025-06-15 16:34:56.789")  # = plain in UTC
    assert _to_epoch_ms(plain, tz) == _to_epoch_ms(utc_noon, "UTC")


def test_bloom_ingest_catches_cross_batch_duplicate_beyond_horizon(
    spark, tmp_path
):
    """The composed ingest: streaming_dedup_exact handles in-horizon
    copies, the batch-accumulated Bloom filter handles a duplicate
    arriving HOURS past the 10-minute watermark horizon — the case
    bounded-state dedup deliberately cannot catch.  Two microbatches
    (maxFilesPerTrigger=1): batch 0 admits 'boilerplate page' and a
    unique doc; batch 1 carries an exact copy of 'boilerplate page'
    2 hours later (state long evicted), a NULL-text tool row (must
    bypass), and a new doc.  The merged filter must drop exactly the
    cross-batch copy."""
    import datetime

    from pdfextract_spark.streaming import start_bloom_ingest_dedup

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    bloom_dir = str(tmp_path / "bloom")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    b0 = [
        ("c0", 0, "user", "boilerplate page body text", None, t0),
        ("c0", 1, "user", "a unique first document", None, t0),
    ]
    b1 = [
        # exact copy, 2 h past a 10-min watermark: in-horizon dedup
        # state is gone, ONLY the bloom filter can drop it
        (
            "c1",
            2,
            "user",
            "boilerplate page body text",
            None,
            t0 + datetime.timedelta(hours=2),
        ),
        (
            "c1",
            3,
            "tool",
            None,
            "search",
            t0 + datetime.timedelta(hours=2),
        ),
        (
            "c1",
            4,
            "user",
            "a brand new second document",
            None,
            t0 + datetime.timedelta(hours=2),
        ),
    ]
    spark.createDataFrame(b0, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = start_bloom_ingest_dedup(
        stream, out_dir, bloom_dir, ckpt, watermark="10 minutes"
    )
    assert q.awaitTermination(180)
    assert q.exception() is None

    out = spark.read.parquet(out_dir)
    got = sorted(r["turn_idx"] for r in out.collect())
    # turn 2 (the cross-batch exact copy) is dropped by the merged
    # filter; the NULL-text tool turn 3 bypasses and survives
    assert got == [0, 1, 3, 4]
    # the filter store accumulated bits from both batches
    bits = spark.read.parquet(bloom_dir)
    assert {r["batch_id"] for r in bits.select("batch_id").distinct().collect()} == {0, 1}

    # kernel replay idempotency: re-running batch 1 against the same
    # stores recomputes the same survivors and overwrites its own
    # partitions — no duplicate admissions
    from pdfextract_spark.streaming import bloom_ingest_batch

    replay = spark.createDataFrame(b1, SCHEMA)
    bloom_ingest_batch(replay, 1, out_dir, bloom_dir)
    again = sorted(
        r["turn_idx"] for r in spark.read.parquet(out_dir).collect()
    )
    assert again == [0, 1, 3, 4]


def test_bloom_ingest_params_pinned_and_saturation_warns(spark, tmp_path):
    """The bloom store is only meaningful under the (n_bits, n_hashes)
    that computed its bit positions: restarting the ingest with a
    different n_bits must raise instead of silently re-admitting
    previously-seen texts under a mixed-modulus table.  And a filter
    past 50% set-bit density must warn loudly — past that point the
    over-drop rate is >= 0.5^k and climbing, with shrinking output
    volume otherwise the only symptom."""
    import datetime
    import warnings

    import pytest

    from pdfextract_spark.streaming import bloom_ingest_batch

    out_dir = str(tmp_path / "out")
    bloom_dir = str(tmp_path / "bloom")
    ts = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows0 = [
        ("c0", i, "user", f"distinct document body {i}", None, ts)
        for i in range(40)
    ]
    b0 = spark.createDataFrame(rows0, SCHEMA)
    # tiny filter: 40 distinct texts x 4 hashes into 64 bits leaves
    # the prior filter far past the 50% density bar for batch 1
    bloom_ingest_batch(b0, 0, out_dir, bloom_dir, n_bits=64, n_hashes=4)

    # restart with a different geometry: refuse before touching bits
    with pytest.raises(ValueError, match="n_bits=64"):
        bloom_ingest_batch(
            b0, 1, out_dir, bloom_dir, n_bits=128, n_hashes=4
        )

    rows1 = [("c1", 100, "user", "one more new document", None, ts)]
    b1 = spark.createDataFrame(rows1, SCHEMA)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bloom_ingest_batch(b1, 1, out_dir, bloom_dir, n_bits=64, n_hashes=4)
    sat = [w for w in caught if "saturated" in str(w.message)]
    assert sat, "expected a saturation UserWarning past 50% density"


def test_bloom_ingest_refuses_checkpoint_rewind(spark, tmp_path):
    """Restarting the ingest with a fresh (or rolled-back) checkpoint
    against a used bloom_dir restarts batch ids from 0: batch 0 would
    probe only bits from batches < 0 (nothing), re-admit every
    previously-seen text, and OVERWRITE the original batch-0 output.
    The store already holding bits from a LATER batch is the
    observable signature, and the kernel must refuse.  A genuine
    replay of the LATEST batch (same id, foreachBatch crash-retry)
    must still be accepted and stay idempotent."""
    import datetime

    import pytest

    from pdfextract_spark.streaming import bloom_ingest_batch

    out_dir = str(tmp_path / "out")
    bloom_dir = str(tmp_path / "bloom")
    ts = datetime.datetime(2024, 1, 1, 10, 0, 0)
    b0 = spark.createDataFrame(
        [("c0", 0, "user", "seen document one", None, ts)], SCHEMA
    )
    b1 = spark.createDataFrame(
        [("c1", 1, "user", "seen document two", None, ts)], SCHEMA
    )
    kw = dict(n_bits=1 << 12, n_hashes=4)
    bloom_ingest_batch(b0, 0, out_dir, bloom_dir, **kw)
    bloom_ingest_batch(b1, 1, out_dir, bloom_dir, **kw)

    # replay of the LATEST committed batch: legal, idempotent
    bloom_ingest_batch(b1, 1, out_dir, bloom_dir, **kw)
    replayed = spark.read.parquet(f"{out_dir}/batch_id=1")
    assert replayed.count() == 1

    # fresh-checkpoint restart (batch ids rewound to 0): refuse
    with pytest.raises(ValueError, match="checkpoint was reset"):
        bloom_ingest_batch(b0, 0, out_dir, bloom_dir, **kw)
    # and the committed batch-0 output was not clobbered
    assert spark.read.parquet(f"{out_dir}/batch_id=0").count() == 1


def test_bloom_ingest_refuses_missing_store_with_advanced_checkpoint(
    spark, tmp_path
):
    """The rewind guard's other side: a WIPED bloom_dir (deleted, or
    the restart points at a wrong path) with an advanced checkpoint
    would probe nothing and silently re-admit every previously-seen
    text — refuse.  A store whose committed batches simply had zero
    survivors keeps its batch_id dirs and must still be accepted."""
    import datetime

    import pytest

    from pdfextract_spark.streaming import bloom_ingest_batch

    out_dir = str(tmp_path / "out")
    bloom_dir = str(tmp_path / "bloom")
    ts = datetime.datetime(2024, 1, 1, 10, 0, 0)
    kw = dict(n_bits=1 << 12, n_hashes=4)
    b0 = spark.createDataFrame(
        [("c0", 0, "user", "first doc", None, ts)], SCHEMA
    )
    bloom_ingest_batch(b0, 0, out_dir, bloom_dir, **kw)

    # wipe the store, keep the (conceptual) checkpoint at batch 1
    import shutil

    shutil.rmtree(bloom_dir)
    b1 = spark.createDataFrame(
        [("c1", 1, "user", "second doc", None, ts)], SCHEMA
    )
    with pytest.raises(ValueError, match="no committed batch"):
        bloom_ingest_batch(b1, 1, out_dir, bloom_dir, **kw)

    # legitimate empty store: batch dirs exist but hold no rows
    # (every prior batch had zero survivors) — must be accepted
    import os

    os.makedirs(f"{bloom_dir}/batch_id=0", exist_ok=True)
    bloom_ingest_batch(b1, 1, out_dir, bloom_dir, **kw)
    assert spark.read.parquet(f"{out_dir}/batch_id=1").count() == 1
