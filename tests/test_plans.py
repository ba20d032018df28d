"""Direct unit tests for the plans compiler: summary -> StructType /
cast chains / validation predicates (survey §2.6)."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from structa_spark.model import (
    BoolT, DateTimeT, FieldT, FloatT, IntT, ListT, RecordT, StrReprT,
    StrT, TableT, URLT,
)
from structa_spark.plans import (
    apply_casts, cast_expr, to_spark_schema, to_spark_type,
)
from structa_spark.stats import Stats


def test_to_spark_type_scalars():
    assert to_spark_type(BoolT()) == T.BooleanType()
    assert to_spark_type(IntT()) == T.LongType()
    assert to_spark_type(FloatT()) == T.DoubleType()
    assert to_spark_type(DateTimeT()) == T.TimestampType()
    assert to_spark_type(StrT()) == T.StringType()
    assert to_spark_type(URLT()) == T.StringType()
    assert to_spark_type(StrReprT(inner=IntT())) == T.StringType()


def test_to_spark_type_containers():
    assert to_spark_type(ListT(element=IntT())) == \
        T.ArrayType(T.LongType())
    assert to_spark_type(TableT(key=StrT(), value=FloatT())) == \
        T.MapType(T.StringType(), T.DoubleType())
    rec = RecordT(fields=(
        FieldT(key="a", value=IntT(), optional=False),
        FieldT(key="b", value=StrT(), optional=True),
    ))
    st = to_spark_schema(rec)
    assert st.fieldNames() == ["a", "b"]
    assert st["b"].nullable is True


@pytest.mark.parametrize("pattern,value,expected", [
    ("d", "42", 42),
    ("x", "0x2A", 42),
    ("o", "0o52", 42),
    ("f", "4.25", 4.25),
    ("false|true", "true", True),
    ("false|true", "false", False),
])
def test_cast_expr_reprs(spark, pattern, value, expected):
    node = StrReprT(inner=IntT(), pattern=pattern)
    got = (spark.range(1)
           .select(cast_expr(node, F.lit(value)).alias("v"))
           .collect()[0].v)
    assert got == expected


def test_cast_expr_datetime(spark):
    node = StrReprT(inner=DateTimeT(), pattern="%Y-%m-%d %H:%M:%S")
    got = (spark.range(1)
           .select(cast_expr(node, F.lit("2021-06-15 12:30:00"))
                   .alias("v")).collect()[0].v)
    assert (got.year, got.month, got.hour) == (2021, 6, 12)


@pytest.mark.parametrize("epoch,scale,offset,value,expect_date", [
    # unix seconds
    ("unix", 1.0, 0.0, 1623760200.0, (2021, 6, 15)),
    # excel serial days (base 1899-12-30)
    ("excel", 86400.0, -2209161600.0, 44362.0, (2021, 6, 15)),
    # custom: days since 2000-01-01 (base offset 946684800s)
    ("custom", 86400.0, 946684800.0, 7836.0, (2021, 6, 15)),
])
def test_cast_expr_numeric_epochs(spark, epoch, scale, offset, value,
                                  expect_date):
    from structa_spark.model import NumReprT
    node = NumReprT(inner=DateTimeT(), pattern="f", epoch=epoch,
                    scale=scale, epoch_offset=offset)
    got = (spark.range(1)
           .select(cast_expr(node, F.lit(value)).alias("v"))
           .collect()[0].v)
    assert (got.year, got.month, got.day) == expect_date


def test_analyze_custom_epoch_roundtrip(spark):
    # end-to-end: --timestamps 'days since 2000-01-01' style config
    # must decode through apply_casts against the CUSTOM base
    import datetime as dt
    from structa_spark import analyze
    from structa_spark.model import NumReprT
    base = dt.datetime(2000, 1, 1)
    days = [7836.0 + i for i in range(40)]     # mid-2021
    df = spark.createDataFrame([(d,) for d in days], "d: double")
    prof = analyze(df, exact=True, epoch="custom", epoch_base=base,
                   scale=86400.0)
    node = {str(f.key): f.value for f in prof.root.fields}["d"]
    assert isinstance(node, NumReprT)
    assert node.epoch_offset == 946684800.0
    out = apply_casts(df, prof.root).collect()
    assert out[0].d == dt.datetime(2021, 6, 15)


def test_apply_casts_passthrough(spark):
    root = RecordT(fields=(
        FieldT(key="n", value=StrReprT(inner=IntT(), pattern="d")),
        FieldT(key="s", value=StrT()),
    ))
    df = spark.createDataFrame([("7", "x")], "n: string, s: string")
    out = apply_casts(df, root)
    assert dict(out.dtypes) == {"n": "bigint", "s": "string"}
    assert out.collect()[0].n == 7


def test_validation_predicate_range(spark):
    root = RecordT(fields=(
        FieldT(key="v", value=IntT(stats=Stats(card=3, min=0, max=10))),
    ))
    from structa_spark.plans import validation_predicate
    df = spark.createDataFrame([(5,), (11,), (None,)], "v: long")
    ok = df.where(validation_predicate(root)).collect()
    vals = {r.v for r in ok}
    assert 5 in vals and 11 not in vals
