import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    # warehouse under /tmp: catalog-backed tests (bucketed tables)
    # must never write inside the repo, and warehouse.dir is a static
    # conf that cannot be changed after session start
    wh = tempfile.mkdtemp(prefix="pdfextract_spark_wh_")
    s = (
        SparkSession.builder.master("local[2]")
        .appName("pdfextract-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", wh)
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
