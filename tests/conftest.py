import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("STRUCTA_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (SparkSession.builder
         .master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         # keep NTZ-normalized timestamps (sources/tables.py) on the
         # same epoch as DuckDB's naive-as-UTC view on any machine
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "8g")
         .appName("structa-spark-tests")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{SF_CORRECT}/{t}.parquet'")
    return con
