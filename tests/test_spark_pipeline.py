"""End-to-end Spark pipeline tests: extraction plan vs the single-node
kernel (golden parity), resumable sink, streaming."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark

TEXTS = [
    (
        "A Study of Synthetic Layouts\n\n"
        + " ".join(["plain body words that wrap across lines nicely"] * 12)
        + "\n\nReferences\n\n"
        + " ".join(
            f"[{i}] Author{i}, X. ({1990 + i}). Paper about topic {i}. Venue."
            for i in range(1, 6)
        )
    ),
    "just a single short paragraph of text",
    "",
    "Eﬀects of “Ligatures”\n\n" + " ".join(["body content here"] * 30),
]


def make_transcripts(spark):
    rows = [(f"c{i % 2}", i, "user", t) for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_extract_matches_kernel_goldens(spark):
    """The Spark plan must equal the single-node kernel + canonical
    rendering, per turn (the per-turn text equality gate)."""
    from pdfextract_spark.core import extract_turn, render_turn
    from pdfextract_spark.plans import extract

    out = {
        r["turn_idx"]: r
        for r in extract(make_transcripts(spark)).collect()
    }
    for i, text in enumerate(TEXTS):
        golden = render_turn(extract_turn(text))
        row = out[i]
        # title text equality
        gt = golden.get("title")
        if gt is None:
            assert row["title"] is None
        else:
            assert row["title"]["content"] == gt["content"]
            assert row["title"]["line_height"] == gt["line_height"]
        # reference strings in order
        grefs = [(r["content"], r.get("order")) for r in golden["references"]]
        srefs = [(r["content"], r["order"]) for r in (row["references"] or [])]
        assert srefs == grefs
        # region/line text equality under stable ordering
        glines = [
            l["content"] for reg in golden["regions"] for l in reg["lines"]
        ]
        slines = [
            l["content"] for reg in (row["regions"] or []) for l in reg["lines"]
        ]
        assert slines == glines
        # numeric rounding applied (2 dp)
        for reg in row["regions"] or []:
            assert reg["x"] == round(reg["x"], 2)


def test_extract_ligature_transliteration(spark):
    from pdfextract_spark.plans import extract

    row = [
        r
        for r in extract(make_transcripts(spark)).collect()
        if r["turn_idx"] == 3
    ][0]
    assert row["title"]["content"] == 'Effects of "Ligatures"'


def test_resumable_sink_and_lineage(spark, tmp_path):
    from pdfextract_spark.sinks import (
        completed_buckets,
        conv_metrics_rollup,
        run_extraction_job,
    )

    out_dir = str(tmp_path / "out")
    t = make_transcripts(spark)
    prev_ovr = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", None
    )
    lineage = run_extraction_job(
        spark, t, out_dir, n_buckets=4, buckets_per_batch=2, resume=True
    )
    # EVERY scheduled bucket commits a lineage row — empty ones
    # zero-filled — or resume could never converge to a no-op
    assert lineage.count() == 4
    assert completed_buckets(spark, out_dir) == {0, 1, 2, 3}
    # the per-job overwrite-mode override is restored afterwards
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        == prev_ovr
    )

    # resume is a no-op when all buckets are done: lineage row count stable
    n_before = lineage.count()
    run_extraction_job(
        spark, t, out_dir, n_buckets=4, buckets_per_batch=2, resume=True
    )
    lineage2 = spark.read.parquet(f"{out_dir}/_lineage")
    assert lineage2.count() == n_before

    # resuming under a DIFFERENT bucketing is refused loudly — the old
    # bucket ids would silently mis-assign rows under the new hash
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_buckets"):
        completed_buckets(spark, out_dir, n_buckets=8)

    result = spark.read.parquet(out_dir)
    assert result.count() == 4
    roll = conv_metrics_rollup(result).collect()
    assert {r["conv_id"] for r in roll} == {"c0", "c1"}


def test_streaming_extraction(spark, tmp_path):
    from pdfextract_spark.streaming import start_file_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "sout")
    ck = str(tmp_path / "ck")
    t = make_transcripts(spark).withColumn("tool", F.lit(None).cast("string")).withColumn(
        "ts", F.current_timestamp()
    )
    t.write.parquet(in_dir)
    q = start_file_stream(spark, in_dir, out_dir, ck, trigger_once=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 4
    assert "references" in got.columns


def test_extraction_invariant_under_partitioning(spark):
    """Results are a pure function of each row: identical under any
    physical distribution (the determinism the north rule's 'stable
    turn ordering' requires)."""
    from pdfextract_spark.plans import extract

    t = make_transcripts(spark)

    def canon(df):
        rows = extract(df, want=("references", "title")).collect()
        return sorted(
            (r["conv_id"], r["turn_idx"], str(r["title"]), str(r["references"]))
            for r in rows
        )

    assert canon(t.repartition(1)) == canon(t.repartition(7))


def test_synth_transcripts_deterministic(spark):
    from pdfextract_spark.sources import synth_transcripts

    a = sorted(map(str, synth_transcripts(spark, "/root/testdata/sf0.001").collect()))
    b = sorted(map(str, synth_transcripts(spark, "/root/testdata/sf0.001").collect()))
    assert a == b


def test_salted_rollup_bounds_skewed_groups(spark):
    """The PRODUCTION salted two-phase aggregation must cap per-task
    group size even when one conversation holds half the table
    (north_rule skew requirement).  Deterministic property — no timing:
    the largest partial group from sinks.salted_conv_partials must
    shrink by ~the salt fan-out relative to the naive
    groupBy(conv_id) hot group, and conv_metrics_rollup must combine
    the partials back to exact totals."""
    from pyspark.sql import functions as F

    from pdfextract_spark.sinks import conv_metrics_rollup, salted_conv_partials

    n = 4000
    # conv "hot" absorbs 50% of all turns; the rest spread over 40 convs
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 40).cast("string")))
        .alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.struct(
            (F.col("id") % 100).cast("long").alias("chars_in"),
            F.lit(0).alias("regions_found"),
            F.lit(0).alias("sections_found"),
            (F.col("id") % 3).cast("int").alias("refs_matched"),
        ).alias("metrics"),
    )
    salt_buckets = 16
    naive_max = df.groupBy("conv_id").count().agg(F.max("count")).head()[0]
    assert naive_max == n // 2
    partials = salted_conv_partials(df, salt_buckets)
    salted_max = partials.agg(F.max("turns")).head()[0]
    # xxhash64 spreads the hot conv's turn_idx values near-uniformly
    # over the salt buckets: worst partial group ~ n/2/16, allow 2x
    assert salted_max <= (naive_max // salt_buckets) * 2
    # and the combine phase reproduces exact naive aggregates
    got = {
        r["conv_id"]: (r["turns"], r["chars_in"], r["refs_matched"])
        for r in conv_metrics_rollup(df, salt_buckets).collect()
    }
    want = {
        r["conv_id"]: (r["count"], r["chars"], r["refs"])
        for r in df.groupBy("conv_id")
        .agg(
            F.count("*").alias("count"),
            F.sum("metrics.chars_in").alias("chars"),
            F.sum("metrics.refs_matched").alias("refs"),
        )
        .collect()
    }
    assert got == want


def test_extract_on_error_skip_and_fail_context(spark):
    """Production resilience: with on_error='skip', a poison turn emits
    a sentinel row (page_count=-1, empty artifacts) instead of killing
    the job; with the default 'fail', the raised error names the
    offending (conv_id, turn_idx)."""
    import pytest as _pytest

    from pdfextract_spark.plans import extract
    from pdfextract_spark.settings import Settings, Typesetter

    df = make_transcripts(spark)
    poison = Settings(typesetter=Typesetter(title_size=0.0))

    rows = extract(df, settings=poison, on_error="skip").collect()
    assert len(rows) == df.count()
    # title_size=0 only detonates on multi-paragraph turns, so the
    # batch is a realistic mix: poisoned turns -> sentinel rows,
    # healthy turns -> normal rows, and nothing is dropped
    bad = [r for r in rows if r["page_count"] == -1]
    ok = [r for r in rows if r["page_count"] >= 0]
    assert bad and ok
    assert all(r["title"] is None and r["references"] == [] for r in bad)
    # chars_in still recorded for lineage accounting
    assert all(r["metrics"]["chars_in"] > 0 for r in bad)

    with _pytest.raises(Exception) as ei:
        extract(df, settings=poison).collect()
    assert "conv_id=" in str(ei.value) and "turn_idx=" in str(ei.value)

    with _pytest.raises(ValueError):
        extract(df, on_error="bogus")


def test_reference_cli_artifact_parity(spark):
    """Reference CLI parity (bin/pdf-extract:12-15): every selectable
    object type — characters, chunks, regions, columns, semantic
    (sections/titles/references), margins, zone sub-types — is
    extractable, and the XML render supports --no-lines / --outline."""
    from pdfextract_spark.core import extract_turn
    from pdfextract_spark.core.xmlview import render_turn_xml
    from pdfextract_spark.plans import extract

    df = make_transcripts(spark)
    full = extract(
        df,
        want=(
            "title", "regions", "zones", "columns", "sections",
            "references", "characters", "chunks", "margins",
        ),
    ).collect()
    r = {x["turn_idx"]: x for x in full}[0]
    assert len(r["characters"]) > len(r["chunks"]) > 0
    assert {m["side"] for m in r["margins"]} == {
        "top", "bottom", "left", "right"
    }
    # chunks are the typeset lines (fast path): their text joined is
    # the region text source, so content must be non-empty
    assert all(c["content"].strip() for c in r["chunks"])

    res = extract_turn(
        TEXTS[0],
        want=("regions", "margins", "chunks", "characters", "zones"),
    )
    xml_full = render_turn_xml(res)
    xml_nolines = render_turn_xml(res, lines=False)
    xml_outline = render_turn_xml(res, outline=True)
    assert "<line" in xml_full and "<line" not in xml_nolines
    assert "<margin" in xml_full and "<chunk" in xml_full
    # outline keeps geometry, drops text nodes
    assert ">References<" not in xml_outline
    only_headers = render_turn_xml(res, zone_filter=["headers"])
    assert "footers" not in only_headers


def test_read_transcripts_all_formats_equal(spark, tmp_path):
    """Transcripts arriving as parquet, ORC, JSON-lines or CSV produce
    identical extraction results (schema-enforced readers, no
    inference pass)."""
    import pytest as _pytest

    from pdfextract_spark.plans import extract
    from pdfextract_spark.sources.tables import read_transcripts

    base = make_transcripts(spark).withColumn(
        "tool", F.lit(None).cast("string")
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))

    def canon(df):
        return sorted(
            (r["conv_id"], r["turn_idx"], str(r["title"]), str(r["references"]))
            for r in extract(df, want=("title", "references")).collect()
        )

    want = canon(base)
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / fmt)
        writer = base.write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", "true").option("escape", '"')
        getattr(writer, "orc" if fmt == "orc" else fmt)(path) if fmt != "json" \
            else base.write.mode("overwrite").json(path)
        got = canon(read_transcripts(spark, path, format=fmt))
        assert got == want, f"format {fmt} diverged"

    with _pytest.raises(ValueError):
        read_transcripts(spark, "/tmp/x", format="avro")


def test_write_table_iceberg_branch(spark, tmp_path):
    """Exercises the writeTo branch for real when Iceberg jars are on
    the classpath (skipped otherwise — this container ships none):
    round-trips rows through a hadoop-type catalog table, proving the
    Iceberg story does not silently rot when jars ARE present."""
    import pytest as _pytest

    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        _pytest.skip("iceberg runtime jars not on the classpath")
    spark.conf.set(
        "spark.sql.catalog.it_wt", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it_wt.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it_wt.warehouse", str(tmp_path / "wh"))

    from pdfextract_spark.sinks import write_table

    df = spark.range(5).selectExpr("id", "id % 2 as b")
    assert (
        write_table(df, "it_wt.db.t", mode="overwrite", partition_by=["b"])
        == "iceberg"
    )
    assert spark.read.table("it_wt.db.t").count() == 5
    assert write_table(df, "it_wt.db.t", mode="append") == "iceberg"
    assert spark.read.table("it_wt.db.t").count() == 10


def test_mega_turn_skew_guard(spark):
    """max_turn_chars bounds the per-turn kernel cost: a pathological
    multi-MB turn is truncated at the cap with the cut recorded in
    metrics (or rejected outright with on_oversize='fail'), and the
    guarded turn still extracts normally from its kept prefix."""
    import pytest as _pytest

    from pdfextract_spark.core.pipeline import extract_turn
    from pdfextract_spark.plans.extract import extract
    from pdfextract_spark.settings import Settings

    mega = "A Title\n\n" + ("lorem ipsum body words " * 100_000)  # ~2.3 MB
    st = Settings(max_turn_chars=10_000)
    r = extract_turn(mega, st)
    m = r["metrics"]
    assert m["chars_in"] == len(mega)
    assert m["chars_truncated"] == len(mega) - 10_000
    assert r["page_count"] >= 1 and m["regions_found"] > 0
    # normal-sized turns pass through untouched
    ok = extract_turn("short turn", st)
    assert ok["metrics"]["chars_truncated"] == 0
    # fail mode rejects with an attributable error
    with _pytest.raises(ValueError, match="max_turn_chars"):
        extract_turn(mega, Settings(max_turn_chars=10_000, on_oversize="fail"))
    with _pytest.raises(ValueError, match="on_oversize"):
        Settings(on_oversize="explode")
    # the Spark path surfaces the truncation in the metrics struct
    df = spark.createDataFrame(
        [("c0", 0, "user", mega[:50_000]), ("c0", 1, "assistant", "hi there")],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {
        r["turn_idx"]: r["metrics"]
        for r in extract(df, settings=Settings(max_turn_chars=20_000)).collect()
    }
    assert out[0]["chars_truncated"] == 30_000
    assert out[1]["chars_truncated"] == 0


def test_pipeline_goldens_current(spark):
    """The committed golden parquets (exact oracles for the UDF-bound
    pipeline queries) must match what the kernel computes TODAY — a
    semantic change without `tools/freeze_pipeline_goldens.py` fails
    here, not silently in the driver's gate.  pipeline_metrics is the
    cheapest whole-pipeline checksum (chars/regions/refs over every
    turn); pipeline_references pins the exact extracted strings."""
    import pandas as pd

    from pdfextract_spark.plans.driver_queries import QUERIES

    root = __file__.rsplit("/", 2)[0]
    for name in ("pipeline_metrics", "pipeline_references"):
        want = pd.read_parquet(
            f"{root}/goldens/pipeline/sf0.001/{name}.parquet"
        )
        cols = list(want.columns)
        want = want.sort_values(cols, ignore_index=True)
        got = (
            QUERIES[name](spark, "/root/testdata/sf0.001")
            .toPandas()[cols]
            .sort_values(cols, ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every golden the oracles point at exists, at all swept SFs
    import os

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for name in (
            "pipeline_references pipeline_titles pipeline_regions "
            "pipeline_metrics pipeline_sections pipeline_zones "
            "pipeline_conv_rollup pipeline_resolved_references "
            "pipeline_font_metrics pipeline_page_dims pipeline_masks"
        ).split():
            assert os.path.exists(f"{root}/goldens/pipeline/{sf}/{name}.parquet")


def test_write_table_dispatch(spark, tmp_path):
    """Storage dispatch: parquet for paths (partitioned, readable
    round-trip); catalog identifiers raise a clear error when no
    Iceberg catalog is configured (this container has no iceberg
    jars)."""
    import pytest as _pytest

    from pdfextract_spark.sinks import write_table

    df = spark.range(12).selectExpr("id", "id % 4 as b")
    out = str(tmp_path / "t")
    assert write_table(df, out, mode="overwrite", partition_by=["b"]) == "parquet"
    back = spark.read.parquet(out)
    assert back.count() == 12 and "b" in back.columns
    with _pytest.raises(RuntimeError, match="Iceberg catalog"):
        write_table(df, "main.db.tbl", mode="overwrite")
    # a dotted *filename* is a parquet path, not a catalog identifier
    rel = str(tmp_path / "out.parquet")
    assert write_table(df, rel, mode="overwrite") == "parquet"
    assert spark.read.parquet(rel).count() == 12
    # explicit dispatch overrides auto-detection both ways
    with _pytest.raises(RuntimeError, match="Iceberg catalog"):
        write_table(df, "iceberg:main.db.tbl", mode="overwrite")
    forced = str(tmp_path / "forced.out")
    assert write_table(df, forced, storage="parquet", mode="overwrite") == "parquet"
    with _pytest.raises(ValueError, match="storage"):
        write_table(df, forced, storage="csv")
    # contradictory prefix + explicit storage is rejected, not guessed
    with _pytest.raises(ValueError, match="contradictory"):
        write_table(df, "iceberg:db.t", storage="parquet")


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    """Co-located join layout: two tables bucketed the same way on the
    join key join WITHOUT any Exchange (shuffle) in the physical plan,
    while the same join on plain parquet shuffles both sides — the
    bucketing story for repeatedly-joined tables, proven on the plan."""
    from pdfextract_spark.sinks import write_bucketed

    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    left = spark.range(2000).selectExpr(
        "concat('conv-', id % 97) AS conv_id", "id AS turn_idx"
    )
    right = spark.range(500).selectExpr(
        "concat('conv-', id % 97) AS conv_id", "id AS ref_id"
    )
    try:
        write_bucketed(left, "bktest.turns", ["conv_id"], n_buckets=8)
        write_bucketed(right, "bktest.refs", ["conv_id"], n_buckets=8)
        # disable broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bktest.turns").join(
            spark.table("bktest.refs"), "conv_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]
        assert joined.count() > 0
        # control: the identical join over non-bucketed data shuffles
        ctrl = left.join(right, "conv_id")
        ctrl_plan = ctrl._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in ctrl_plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        spark.sql("DROP TABLE IF EXISTS bktest.turns")
        spark.sql("DROP TABLE IF EXISTS bktest.refs")
        spark.sql("DROP DATABASE IF EXISTS bktest")


def test_extract_carry_columns(spark):
    """carry= passes input columns through the 1:1 Arrow stage
    verbatim (event-time ts for streaming watermarks, or any caller
    metadata); colliding names are rejected loudly."""
    import datetime

    import pytest as _pytest

    from pdfextract_spark.plans.extract import extract

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("c0", i, "user", t, base + datetime.timedelta(seconds=i))
        for i, t in enumerate(TEXTS)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp",
    )
    out = extract(df, want=("references",), carry=("ts",))
    assert out.columns[-1] == "ts"
    got = {r["turn_idx"]: r["ts"] for r in out.collect()}
    assert got == {
        i: base + datetime.timedelta(seconds=i) for i in range(len(TEXTS))
    }
    with _pytest.raises(ValueError, match="collide"):
        extract(df, carry=("role",))


def test_completed_buckets_error_classification(spark, tmp_path):
    """Benign 'nothing committed yet' reads return set(): a missing
    lineage path and an empty lineage dir (crash between mkdir and
    first task commit).  Any OTHER AnalysisException — e.g. column
    resolution against an existing table — must propagate: mapping it
    to set() would silently restart all buckets and append duplicate
    lineage rows."""
    import pytest as _pytest
    from pyspark.errors import AnalysisException

    from pdfextract_spark.sinks import completed_buckets

    # missing path
    assert completed_buckets(spark, str(tmp_path / "never_written")) == set()
    # existing but empty lineage dir
    empty = tmp_path / "empty_out"
    (empty / "_lineage").mkdir(parents=True)
    assert completed_buckets(spark, str(empty)) == set()

    # non-benign AnalysisException propagates (stub reader raises the
    # kind of resolution error a real-but-broken lineage table would)
    class _Reader:
        def option(self, *a):
            return self

        def parquet(self, path):
            raise AnalysisException(
                message="[UNRESOLVED_COLUMN] cannot resolve 'bucket'",
                errorClass="UNRESOLVED_COLUMN",
            )

    class _Spark:
        @property
        def read(self):
            return _Reader()

    with _pytest.raises(AnalysisException, match="UNRESOLVED_COLUMN"):
        completed_buckets(_Spark(), str(tmp_path / "whatever"))


def test_extract_null_turn_idx_obeys_on_error(spark):
    """A permissive JSON read keeps malformed rows as all-NULL; the
    int(turn_idx) coercion used to sit outside the poison-tolerance
    try, so one NULL turn_idx killed the job even under
    on_error='skip'.  Now: 'skip' keeps the row (NULL turn_idx),
    'fail' raises with attribution."""
    import pytest

    from pdfextract_spark.plans.extract import extract

    df = spark.createDataFrame(
        [("c1", 0, "user", "fine text"), ("c1", None, "user", "poison")],
        "conv_id string, turn_idx int, role string, text string",
    )
    rows = extract(df, on_error="skip", want=()).collect()
    assert len(rows) == 2
    assert sorted(
        (r["turn_idx"] is None) for r in rows
    ) == [False, True]
    with pytest.raises(Exception, match="NULL turn_idx"):
        extract(df, on_error="fail", want=()).collect()


def test_extract_rejects_unknown_want(spark):
    """A misspelled artifact name ('titles', 'refs') silently
    produced rows with the artifact missing; it must raise."""
    import pytest

    from pdfextract_spark.plans.extract import extract

    df = spark.createDataFrame(
        [("c1", 0, "user", "x")],
        "conv_id string, turn_idx int, role string, text string",
    )
    with pytest.raises(ValueError, match="titles"):
        extract(df, want=("titles",))


def test_with_bucket_type_stable(spark):
    """The bucket hash is applied to the INPUT for scheduling and to
    the extraction OUTPUT (int32 turn_idx) for the partition write;
    xxhash64 of the same value under a different integer width is a
    DIFFERENT hash, so a bigint input used to land rows in other
    batches' partitions (overwritten later — silent data loss).  The
    hash inputs are now pinned to (string, int) first."""
    from pdfextract_spark.sinks import with_bucket

    as_int = spark.createDataFrame(
        [("c", 5), ("d", 123456)], "conv_id string, turn_idx int"
    )
    as_big = spark.createDataFrame(
        [("c", 5), ("d", 123456)], "conv_id string, turn_idx bigint"
    )
    bi = {(r["conv_id"], r["turn_idx"]): r["bucket"]
          for r in with_bucket(as_int, 64).collect()}
    bb = {(r["conv_id"], r["turn_idx"]): r["bucket"]
          for r in with_bucket(as_big, 64).collect()}
    assert bi == bb, (bi, bb)


def test_resume_false_truncates_lineage(spark, tmp_path):
    """resume=False reprocesses everything: output partitions are
    overwritten, but lineage used to APPEND a second generation of
    rows — every downstream metric sum then double-counted."""
    from pdfextract_spark.sinks import run_extraction_job
    from pdfextract_spark.sources import synth_transcripts

    out = str(tmp_path / "out")
    t = synth_transcripts(spark, "/root/testdata/sf0.001", turns_per_doc=1)
    l1 = run_extraction_job(
        spark, t, out, n_buckets=4, buckets_per_batch=4, resume=False
    )
    assert l1.count() == 4
    l2 = run_extraction_job(
        spark, t, out, n_buckets=4, buckets_per_batch=4, resume=False
    )
    assert l2.count() == 4  # fresh generation, not 8 stacked rows


def test_write_table_iceberg_rejects_unsupported_modes(spark, tmp_path):
    """writeTo has no 'ignore'/'errorifexists' analogue; the Iceberg
    branch used to silently APPEND for those modes."""
    import pytest

    from pdfextract_spark.sinks import write_table

    df = spark.range(3)
    with pytest.raises(ValueError, match="ignore"):
        write_table(df, "cat.db.t", mode="ignore", storage="iceberg")


def test_streaming_star_surface_complete():
    """__all__ must list the module's own functions alongside the
    TRANSCRIPT_DDL re-export (a re-export-only __all__ hid them from
    star imports)."""
    import importlib

    m = importlib.import_module(
        "pdfextract_spark.streaming.extract_stream"
    )
    for name in ("extract_stream", "start_file_stream",
                 "streaming_conv_metrics", "streaming_dedup_exact"):
        assert name in m.__all__ and hasattr(m, name)
