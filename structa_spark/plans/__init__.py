"""Compile an inferred summary back into usable Spark artifacts.

The reference's output is a rendered tree; this engine additionally
compiles the summary into:

* a Spark ``StructType`` (typed schema for re-reading the data),
* cast/conversion expressions (the ``Repr`` chains as Columns), and
* validation predicates (the reference's per-type ``validate``,
  structa/types.py — §2.6 of the survey — re-expressed as boolean
  Columns usable as data-quality checks at scale).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import (
    BoolT, DateTimeT, Empty, FieldT, FloatT, IntT, ListT, Node, NumReprT,
    RecordT, StrReprT, StrT, TableT, TupleT, URLT, ValueAny,
)

__all__ = ["to_spark_schema", "to_spark_type", "cast_expr",
           "validation_predicate", "apply_casts"]


def apply_casts(df, root: Node):
    """Decode a DataFrame with a profile's compiled cast chains: every
    top-level column whose inferred type is a representation (str of
    int, str of datetime, float of timestamp, ...) is replaced by its
    logical value; all other columns pass through untouched. The
    whole decode is one projection — no extra jobs."""
    if not isinstance(root, (RecordT, TupleT)):
        raise ValueError("apply_casts needs a record/tuple summary root")
    nodes = {str(f.key): f.value for f in root.fields}
    cols = []
    for name in df.columns:
        node = nodes.get(name)
        if isinstance(node, (StrReprT, NumReprT)):
            cols.append(cast_expr(node, F.col(name)).alias(name))
        else:
            cols.append(F.col(name))
    return df.select(*cols)


def to_spark_type(node: Node) -> T.DataType:
    """Summary node -> Spark DataType (physical)."""
    if isinstance(node, BoolT):
        return T.BooleanType()
    if isinstance(node, IntT):
        return T.LongType()
    if isinstance(node, FloatT):
        return T.DoubleType()
    if isinstance(node, DateTimeT):
        return T.TimestampType()
    if isinstance(node, (StrT, StrReprT)):
        return T.StringType()
    if isinstance(node, NumReprT):
        return T.LongType() if node.pattern == "d" else T.DoubleType()
    if isinstance(node, ListT):
        return T.ArrayType(to_spark_type(node.element))
    if isinstance(node, TableT):
        return T.MapType(to_spark_type(node.key), to_spark_type(node.value))
    if isinstance(node, (RecordT, TupleT)):
        return T.StructType([
            T.StructField(str(f.key), to_spark_type(f.value),
                          nullable=f.optional)
            for f in node.fields
        ])
    return T.NullType() if isinstance(node, Empty) else T.StringType()


def to_spark_schema(node: Node) -> T.StructType:
    t = to_spark_type(node)
    if isinstance(t, T.StructType):
        return t
    return T.StructType([T.StructField("value", t)])


def cast_expr(node: Node, col: Column) -> Column:
    """The logical-value expression for a leaf: decodes Repr chains
    (str-of-int base d/x/o, str-of-timestamp fmt, float-of-timestamp)
    into the inner logical type — the compiled cast chain."""
    if isinstance(node, StrReprT):
        p = node.pattern
        if p == "d":
            inner = col.try_cast("long")
        elif p == "x":
            inner = F.conv(F.regexp_replace(col, r"^[-+]?(0[xX])?", ""),
                           16, 10).try_cast("long")
        elif p == "o":
            inner = F.conv(F.regexp_replace(col, r"^[-+]?0?[oO]?", ""),
                           8, 10).try_cast("long")
        elif p == "f":
            inner = col.try_cast("double")
        elif "|" in p:
            true_w = p.split("|", 1)[1]
            inner = (F.lower(col) == true_w)
        else:
            from ..conversions import datetime_cast
            inner = datetime_cast(p, col)
        return cast_expr(node.inner, inner) if isinstance(
            node.inner, (StrReprT, NumReprT)) else inner
    if isinstance(node, NumReprT):
        # value * scale is seconds since the repr's base; epoch_offset
        # shifts to Unix (0 for unix, -2209161600 for excel serial day
        # 0 = 1899-12-30, arbitrary for --timestamps custom bases)
        secs = (col.try_cast("double") * F.lit(node.scale)
                + F.lit(node.epoch_offset))
        return F.timestamp_seconds(secs)
    return col


def validation_predicate(node: Node, col: Optional[Column] = None) -> Column:
    """Boolean Column: does ``col`` conform to the inferred summary?

    Compiled from the summary the way the reference's per-type
    ``validate`` walks values (survey §2.6) — usable as a distributed
    data-quality filter."""
    if col is None:
        col = F.lit(True)
        if isinstance(node, (RecordT, TupleT)):
            preds = [
                validation_predicate(f.value, F.col(str(f.key)))
                | (F.lit(f.optional) & F.col(str(f.key)).isNull())
                for f in node.fields
            ]
            out = F.lit(True)
            for p in preds:
                out = out & p
            return out
        raise ValueError("root validation needs a record summary")

    if isinstance(node, (Empty, ValueAny)):
        return F.lit(True)
    if isinstance(node, BoolT):
        return col.isNull() | col.cast("string").rlike("^(true|false)$")
    if isinstance(node, (IntT, FloatT)):
        lo, hi = node.stats.min, node.stats.max
        pred = col.isNotNull()
        if lo is not None and hi is not None:
            pred = pred & col.between(F.lit(lo), F.lit(hi))
        return col.isNull() | pred
    if isinstance(node, DateTimeT):
        lo, hi = node.stats.min, node.stats.max
        pred = col.isNotNull()
        if lo is not None and hi is not None:
            pred = pred & col.between(F.lit(lo), F.lit(hi))
        return col.isNull() | pred
    if isinstance(node, URLT):
        return col.isNull() | col.rlike("^https?://")
    if isinstance(node, StrReprT):
        return col.isNull() | cast_expr(node, col).isNotNull()
    if isinstance(node, StrT):
        pred = col.isNotNull()
        if node.lengths.min is not None:
            pred = pred & F.length(col).between(
                F.lit(node.lengths.min), F.lit(node.lengths.max))
        return col.isNull() | pred
    if isinstance(node, ListT):
        return col.isNull() | F.forall(
            col, lambda x: validation_predicate(node.element, x))
    if isinstance(node, TableT):
        return col.isNull() | (
            F.forall(F.map_keys(col),
                     lambda k: validation_predicate(node.key, k))
            & F.forall(F.map_values(col),
                       lambda v: validation_predicate(node.value, v)))
    if isinstance(node, (RecordT, TupleT)):
        out = col.isNotNull()
        for f in node.fields:
            out = out & (
                validation_predicate(f.value, col[str(f.key)])
                | (F.lit(f.optional) & col[str(f.key)].isNull()))
        return col.isNull() | out
    return F.lit(True)
