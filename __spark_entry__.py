"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    -> flagship: profile lineitem@sf0.001 into the typed
                   summary table (the engine's core capability).
queries()       -> every implemented operator (see structa_spark/queries.py).
oracle_sql()    -> DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: run the structure-inference engine over
    sf0.001/lineitem and return the per-leaf summary rows."""
    from pyspark.sql import types as T

    from structa_spark import analyze
    from structa_spark.model import (
        FieldT, ListT, NumReprT, RecordT, StrReprT, TableT, TupleT,
    )
    from structa_spark.sources.tables import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    profile = analyze(df, exact=True)

    rows = []

    def walk(node, path):
        type_name = type(node).__name__
        stats = getattr(node, "stats", None)
        rows.append((
            ".".join(path) or "<root>",
            type_name,
            node.render()[:200],
            int(stats.card) if stats else None,
            int(stats.distinct) if stats and stats.distinct is not None
            else None,
            str(stats.min) if stats and stats.min is not None else None,
            str(stats.max) if stats and stats.max is not None else None,
        ))
        if isinstance(node, (RecordT, TupleT)):
            for f in node.fields:
                walk(f.value, path + [str(f.key)])
        elif isinstance(node, ListT):
            walk(node.element, path + ["[]"])
        elif isinstance(node, TableT):
            walk(node.key, path + ["{key}"])
            walk(node.value, path + ["{value}"])
        elif isinstance(node, (StrReprT, NumReprT)):
            walk(node.inner, path + ["<of>"])

    walk(profile.root, [])
    schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("inferred_type", T.StringType()),
        T.StructField("rendered", T.StringType()),
        T.StructField("card", T.LongType()),
        T.StructField("n_distinct", T.LongType()),
        T.StructField("min_value", T.StringType()),
        T.StructField("max_value", T.StringType()),
    ])
    return spark.createDataFrame(rows, schema)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from structa_spark.queries import queries as _q
    return _q()


def oracle_sql() -> dict[str, str]:
    from structa_spark.queries import oracle_sql as _o
    return _o()
