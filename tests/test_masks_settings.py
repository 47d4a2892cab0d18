"""Driver rows for the settings/sink surface (SURVEY.md S3/S4/S6/S8/P2):
the masks plan vs the kernel renderer, font-metric rollups vs the AFM
table, and want-projection parity."""

import hashlib

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark

TEXTS = [
    (
        "A Title Line\n\n"
        + " ".join(["body words that wrap across several lines"] * 20)
    ),
    "short",
    "",
]


def make_transcripts(spark):
    rows = [(f"c{i}", i, "user", t) for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_extract_masks_matches_kernel_renderer(spark):
    """S6: the distributed mask plan's per-page SVG equals the
    single-node kernel + maskview renderer, byte for byte (md5)."""
    from pdfextract_spark.core import extract_turn
    from pdfextract_spark.core.maskview import render_turn_masks
    from pdfextract_spark.plans.masks import extract_masks

    out = extract_masks(make_transcripts(spark)).collect()
    got = {(r["turn_idx"], r["page"]): r for r in out}
    n_pages = 0
    for i, text in enumerate(TEXTS):
        res = extract_turn(text, want=("regions", "zones", "columns"))
        masks = render_turn_masks(res)
        for page, svg in masks.items():
            n_pages += 1
            row = got[(i, page)]
            assert row["svg"] == svg
            assert row["svg_md5"] == hashlib.md5(svg.encode()).hexdigest()
            assert row["svg_len"] == len(svg)
            assert row["n_rects"] == svg.count("<rect") - 1
    assert n_pages >= 2  # the empty turn renders no pages
    assert len(got) == n_pages


def test_extract_masks_fingerprint_only_and_types(spark):
    """with_svg=False drops the body column; unknown types raise."""
    from pdfextract_spark.plans.masks import extract_masks

    df = extract_masks(
        make_transcripts(spark), types=("regions",), with_svg=False
    )
    assert "svg" not in df.columns
    assert df.count() >= 2
    with pytest.raises(ValueError, match="unknown mask types"):
        extract_masks(make_transcripts(spark), types=("bogus",))


def test_font_metrics_match_afm_table(spark):
    """S3: the per-font min/max glyph advance from the Spark rollup
    equals milli-em units x size / 1000 (2 dp) from the engine's
    AFM-style table for the glyphs actually typeset, and heights pin
    the declared face sizes."""
    from pdfextract_spark.core.fontmetrics import width_units
    from pdfextract_spark.settings import DEFAULT

    # reuse the driver query's shape over a local transcript table
    from pdfextract_spark.plans.extract import extract

    res = extract(make_transcripts(spark), want=("characters",))
    ch = res.select(F.explode("characters").alias("c"))
    rows = {
        r["font"]: r
        for r in ch.groupBy(F.col("c.font").alias("font"))
        .agg(
            F.min("c.width").alias("min_width"),
            F.max("c.width").alias("max_width"),
            F.min("c.height").alias("min_height"),
            F.max("c.height").alias("max_height"),
        )
        .collect()
    }
    ts = DEFAULT.typesetter
    assert set(rows) == {"Body", "Title"}
    # Title face is the monospace one (fontmetrics.py: 500 units flat)
    assert rows["Title"]["min_width"] == round(500 * ts.title_size / 1000, 2)
    assert rows["Title"]["max_width"] == rows["Title"]["min_width"]
    assert rows["Title"]["min_height"] == ts.title_size
    # Body face is proportional: the typeset glyph advances must span
    # exactly the AFM-table extremes of the glyphs actually set
    body_text = TEXTS[0].split("\n\n", 1)[1] + "1 / 3"  # + footer text
    units = {width_units(g) for g in set(body_text) - {" ", "\n"}}
    got_umin = {
        round(min(units) * s / 1000.0, 2)
        for s in (ts.body_size, ts.footer_size)
    }
    assert rows["Body"]["min_width"] in got_umin
    # Body face appears at both body and footer sizes
    assert rows["Body"]["max_height"] == ts.body_size
    assert rows["Body"]["min_height"] == ts.footer_size


def test_want_projection_parity_regions(spark):
    """S8: want=('regions',) fast path == full-pipeline regions."""
    from pdfextract_spark.plans.extract import extract

    df = make_transcripts(spark)
    full = (
        extract(df)
        .select("conv_id", "turn_idx", F.explode("regions").alias("a"))
        .select("conv_id", "turn_idx", "a.*")
    )
    fast = (
        extract(df, want=("regions",))
        .select("conv_id", "turn_idx", F.explode("regions").alias("a"))
        .select("conv_id", "turn_idx", "a.*")
    )
    key = ["conv_id", "turn_idx", "page", "y", "x"]
    assert sorted(full.collect(), key=lambda r: tuple(r[k] for k in key)) == sorted(
        fast.collect(), key=lambda r: tuple(r[k] for k in key)
    )


def test_p2_drop_spatial_projection(spark):
    """P2: the driver query's projection carries no spatial columns
    and agrees with the kernel's drop_spatial key set."""
    from pdfextract_spark.core.spatial import SPATIAL_ATTRIBS
    from pdfextract_spark.plans.driver_queries import QUERIES

    df = QUERIES["p2_drop_spatial"](spark, "/root/testdata/sf0.001")
    assert not set(df.columns) & set(SPATIAL_ATTRIBS)
    assert set(df.columns) == {"conv_id", "turn_idx", "line_height", "font"}
