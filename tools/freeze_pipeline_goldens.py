"""Freeze the UDF-bound pipeline queries' outputs to golden parquet.

The per-turn kernel (core/pipeline.py) is deterministic — no RNG, no
wall clock, pure function of each turn's text — so its full-pipeline
output at a given scale factor is a constant.  Freezing that constant
to a committed parquet turns the driver's rows-only checks into exact
value-hash oracles: ``oracle_sql()`` for each ``pipeline_*`` query
becomes ``SELECT * FROM read_parquet('<golden>')`` (VERDICT.md round 1,
'Next round' #2).

Run ONLY after a deliberate semantic change to the kernel, then review
the diff of the regenerated files:

    python tools/freeze_pipeline_goldens.py [sf ...]   # default: all 3
"""

from __future__ import annotations

import os
import sys

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)

PIPELINE_QUERIES = (
    "pipeline_references",
    "pipeline_titles",
    "pipeline_regions",
    "pipeline_metrics",
    "pipeline_sections",
    "pipeline_zones",
    "pipeline_conv_rollup",
    "pipeline_resolved_references",
    "pipeline_font_metrics",
    "pipeline_page_dims",
    "pipeline_masks",
)

SFS = ("sf0.001", "sf0.01", "sf0.1")


def golden_path(sf: str, name: str) -> str:
    return f"{ROOT}/goldens/pipeline/{sf}/{name}.parquet"


def main() -> None:
    sfs = sys.argv[1:] or list(SFS)
    from pyspark.sql import SparkSession

    from pdfextract_spark.plans.driver_queries import QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        os.makedirs(f"{ROOT}/goldens/pipeline/{sf}", exist_ok=True)
        for name in PIPELINE_QUERIES:
            df = QUERIES[name](spark, sf_dir)
            pdf = df.toPandas()
            # stable on-disk order (values are compared order-insensitively,
            # but a canonical sort keeps regenerated files diffable)
            pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
            path = golden_path(sf, name)
            pdf.to_parquet(path, index=False)
            print(f"froze {sf}/{name}: {len(pdf)} rows -> {path}")


if __name__ == "__main__":
    main()
