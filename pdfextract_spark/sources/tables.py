"""Parquet table loaders for the driver's test data (TESTDATA.md).

At cluster scale these would be Iceberg catalog tables
(``spark.read.table``); the parquet path keeps the same DataFrame
surface, and every downstream plan is storage-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcripts(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    permissive: bool = True,
) -> DataFrame:
    """Schema-enforced transcript reader for every bundled format the
    corpus might arrive in (parquet / orc / json-lines / csv).  The
    explicit schema keeps Catalyst from an inference pass over 100 TB
    and guarantees the plan-stable column types the extraction plan
    expects; ``permissive`` keeps malformed rows (JSON/CSV) as rows
    with NULL fields instead of failing the job — pair with
    ``extract(on_error=...)`` for end-to-end poison tolerance.
    """
    fmt = format.lower()
    if fmt == "parquet":
        df = spark.read.schema(TRANSCRIPT_DDL).parquet(path)
    elif fmt == "orc":
        df = spark.read.schema(TRANSCRIPT_DDL).orc(path)
    elif fmt in ("json", "jsonl"):
        df = (
            spark.read.schema(TRANSCRIPT_DDL)
            .option("mode", "PERMISSIVE" if permissive else "FAILFAST")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]")
            .json(path)
        )
    elif fmt == "csv":
        df = (
            spark.read.schema(TRANSCRIPT_DDL)
            .option("header", "true")
            .option("mode", "PERMISSIVE" if permissive else "FAILFAST")
            .option("multiLine", "true")
            .option("escape", '"')
            .csv(path)
        )
    else:
        raise ValueError(
            f"unsupported transcript format {format!r}; "
            "expected parquet/orc/json/csv"
        )
    return df.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
