"""Semi-structured columns: JSON-encoded strings inside a table.

The reference analyzes whole JSON *files*; real pipelines also carry
JSON in string columns (event properties, API payloads). The Spark
expression of the same inference: infer the schema from a bounded
driver-side sample (same posture as the source sniffing in
``sources/detect.py``), then parse distributedly with ``from_json`` —
the whole decode stays in the scan projection, and the parsed struct
composes with :func:`structa_spark.analyze` for full profiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def infer_json_schema(df: DataFrame, column: str,
                      sample_rows: int = 1000) -> T.DataType:
    """Schema of a JSON-string column from a bounded sample (driver
    holds ``sample_rows`` strings, never the data)."""
    vals = [r[0] for r in df.select(column)
            .where(F.col(column).isNotNull())
            .limit(sample_rows).collect()]
    if not vals:
        return T.StructType([])
    spark = df.sparkSession
    return spark.read.json(spark.sparkContext.parallelize(vals)).schema


def parse_json_column(df: DataFrame, column: str,
                      sample_rows: int = 1000,
                      out_col: str | None = None) -> DataFrame:
    """Replace (or add) a JSON-string column with its parsed struct.

    One projection — no extra jobs beyond the sampling read; malformed
    rows become null structs (from_json's permissive mode)."""
    schema = infer_json_schema(df, column, sample_rows)
    return df.withColumn(out_col or column,
                         F.from_json(F.col(column), schema))


def parse_variant_column(df: DataFrame, column: str,
                         out_col: str | None = None) -> DataFrame:
    """Replace (or add) a JSON-string column with Spark 4's native
    ``VariantType`` via ``parse_json`` — the schema-on-read
    alternative to :func:`parse_json_column`: NO sampling job, no
    inferred schema to go stale when late rows carry new fields, and
    binary-encoded shredded storage instead of string re-parsing.
    Reach into it with ``variant_get``/``try_variant_get`` path
    expressions; pushdown-friendly on parquet variant shredding.

    Use from_json when downstream wants a fixed StructType contract;
    use variant when payload shape drifts — both stay scan-local
    projections."""
    return df.withColumn(out_col or column,
                         F.parse_json(F.col(column)))


def variant_field_stats(df: DataFrame, column: str,
                        fields) -> DataFrame:
    """Aggregate stats over typed paths extracted from a variant (or
    JSON-string) column: ``fields`` maps output name -> (variant
    path, cast type). One scan; extraction is `try_variant_get` in
    the projection, so unknown/mistyped paths yield nulls instead of
    failing rows — the schema-drift-tolerant profiling primitive."""
    src = F.parse_json(F.col(column)) \
        if dict(df.dtypes)[column] == "string" else F.col(column)
    cols = [F.try_variant_get(src, path, typ).alias(name)
            for name, (path, typ) in fields.items()]
    base = df.select(*cols)
    aggs = []
    for name in fields:
        aggs += [F.count(name).alias(f"{name}_n"),
                 F.min(name).alias(f"{name}_min"),
                 F.max(name).alias(f"{name}_max")]
    return base.agg(*aggs)
