"""Loaders for the test-data star schema (TESTDATA.md).

``events.parquet`` stores nanosecond timestamps, which Spark's parquet
reader rejects by default (PARQUET_TYPE_ILLEGAL). We flip the session
to ``spark.sql.legacy.parquet.nanosAsLong`` for the read and convert
nanos -> microsecond timestamps ourselves (truncating division — the
same truncation DuckDB applies when it reads ns into its us-precision
TIMESTAMP), restoring the flag afterwards so the rest of the session
is unaffected.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_NANOS_TS = {"events": ["ts"]}

_NANOS_FLAG = "spark.sql.legacy.parquet.nanosAsLong"


@contextmanager
def _nanos_as_long(spark: SparkSession):
    old = spark.conf.get(_NANOS_FLAG, "false")
    spark.conf.set(_NANOS_FLAG, "true")
    try:
        yield
    finally:
        spark.conf.set(_NANOS_FLAG, old)


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP.

    Parquet ``timestamp[us]`` with isAdjustedToUTC=false reads as
    TIMESTAMP_NTZ, which rejects ``cast("double")`` and diverges from
    DuckDB's plain-TIMESTAMP view of the same file. Normalizing here,
    once, keeps every downstream consumer (window queries, the
    analyzer, user code) on the session-tz TIMESTAMP type.

    The cast reinterprets the wall-clock value in the SESSION
    timezone, so epoch equivalence with a naive-as-UTC reader holds
    only under ``spark.sql.session.timeZone=UTC`` — which every
    session builder in this repo (bench, tests, CLI) pins.
    """
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name in _NANOS_TS:
        with _nanos_as_long(spark):
            df = spark.read.parquet(path)
            # force analysis within the flag scope
            df.schema
        for col in _NANOS_TS[name]:
            if dict(df.dtypes).get(col) == "bigint":
                # integer `div`, NOT `/`: float division of ~1.7e18 ns
                # loses precision past double's 53-bit mantissa and
                # lands a microsecond off DuckDB's truncation
                df = df.withColumn(
                    col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        return _normalize_ts(df)
    return _normalize_ts(spark.read.parquet(path))


def load_all(spark: SparkSession, sf_dir: str) -> dict:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
