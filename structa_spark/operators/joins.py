"""Temporal join operators: the general as-of join.

The reference engine has no join surface at all; this is part of the
engine's §2.7 query layer. The shape matters at 100 TB: a naive
as-of is an inequality join (quadratic per key) — every
implementation here is the union-merge linearization instead: union
both sides, ONE shuffle on the match keys, one per-partition sort,
and a running ``last(..., ignorenulls)`` window. Cost is
O((|L|+|R|) log) per key group with arbitrary-skew handling left to
AQE, and NO row ever pairs with more than its one match.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ts_double(c: Column) -> Column:
    # timestamps compare as epoch seconds; numerics pass through
    return c.cast("double")


def asof_join(left: DataFrame, right: DataFrame,
              on: str = "ts", by: Sequence[str] = (),
              direction: str = "backward",
              tolerance: Optional[float] = None,
              right_cols: Optional[Sequence[str]] = None,
              tie_break: Optional[str] = None,
              prefix: str = "asof_") -> DataFrame:
    """General as-of join (pandas ``merge_asof`` parity): for every
    left row, attach the single nearest right row at-or-before
    (``backward``), at-or-after (``forward``), or closest in either
    direction (``nearest``, ties to backward — the pandas rule),
    matching on the ``by`` keys, optionally within ``tolerance``
    (same units as ``on``: seconds for timestamps). For ``nearest``
    the tolerance gates each DIRECTION before the nearer-side pick
    (pandas semantics): when the nearer side is out of tolerance but
    the other side is within it, the in-tolerance side wins rather
    than the row matching nothing.

    Returns all left columns plus ``{prefix}{col}`` for each of
    ``right_cols`` (default: every right column except the keys) and
    ``{prefix}{on}`` — all null when no match (left-join semantics).

    Equal-``on`` ties between several RIGHT rows: pass ``tie_break``
    (a right column name) to resolve them deterministically to the
    row with the greatest ``tie_break`` value; without it the
    carried row among exact ``on`` ties is whichever the partition
    sort happened to order last — nondeterministic across runs.
    Dedup the right side on (``by``, ``on``) when that matters.

    Scale shape (vs the quadratic inequality join Spark would plan
    from ``l.ts >= r.ts``): union-merge as in the module docstring —
    ``nearest`` runs the SAME single shuffle with two window passes
    over the sorted partitions, not two joins.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in set(by) | {on}]
    right_cols = list(right_cols)

    payload = F.struct(
        F.col(on).alias("__t__"),
        *[F.col(c) for c in right_cols])
    # a NULL `on` can never be "before" or "after" anything, but it
    # WOULD sort first under the asc window and get carried as a
    # phantom match — drop null-keyed right rows (pandas merge_asof
    # rejects them outright); null-keyed LEFT rows stay, guarded to a
    # null match below
    r_cols = [*by, F.col(on).alias("__on__"),
              payload.alias("__r__"), F.lit(0).alias("__tag__")]
    if tie_break is not None:
        r_cols.append(F.col(tie_break).alias("__tb__"))
    r = right.where(F.col(on).isNotNull()).select(*r_cols)
    l = left.select(*left.columns,
                    F.col(on).alias("__on__"),
                    F.lit(None).cast(r.schema["__r__"].dataType)
                    .alias("__r__"),
                    F.lit(1).alias("__tag__"))
    u = l.unionByName(r, allowMissingColumns=True)

    frame = (Window.partitionBy(*by) if by else Window.partitionBy()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # with a tie_break the greatest __tb__ among exact-__on__ right
    # rows sorts LAST and is what last() carries — deterministic;
    # left rows union in with a null __tb__ (sorts first, no effect)
    tie = [F.asc_nulls_first("__tb__")] if tie_break is not None else []
    w_back = frame.orderBy(F.asc("__on__"), F.asc("__tag__"), *tie)
    w_fwd = frame.orderBy(F.desc("__on__"), F.asc("__tag__"), *tie)

    carried = []
    if direction in ("backward", "nearest"):
        u = u.withColumn("__b__", F.last("__r__", True).over(w_back))
        carried.append("__b__")
    if direction in ("forward", "nearest"):
        u = u.withColumn("__f__", F.last("__r__", True).over(w_fwd))
        carried.append("__f__")

    u = u.where(F.col("__tag__") == 1)

    def delta(col: str) -> Column:
        return F.abs(_ts_double(F.col(f"{col}.__t__"))
                     - _ts_double(F.col("__on__")))

    if direction == "nearest":
        if tolerance is not None:
            # pandas merge_asof rule: tolerance gates each DIRECTION
            # before the nearer-side pick — an out-of-tolerance
            # nearer side loses to an in-tolerance farther side
            # instead of nulling the whole match
            tol = F.lit(float(tolerance))
            u = u.withColumn(
                "__b__",
                F.when(delta("__b__") <= tol, F.col("__b__")))
            u = u.withColumn(
                "__f__",
                F.when(delta("__f__") <= tol, F.col("__f__")))
        b, f = delta("__b__"), delta("__f__")
        pick_b = F.col("__f__").isNull() \
            | (F.col("__b__").isNotNull() & (b <= f))
        match = F.when(pick_b, F.col("__b__")).otherwise(F.col("__f__"))
    else:
        match = F.col(carried[0])
    # null-keyed left rows keep left-join semantics: present, no match
    match = F.when(F.col("__on__").isNotNull(), match)
    u = u.withColumn("__m__", match)
    if tolerance is not None and direction != "nearest":
        u = u.withColumn(
            "__m__", F.when(delta("__m__") <= F.lit(float(tolerance)),
                            F.col("__m__")))

    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__m__.__t__").alias(f"{prefix}{on}"))
    out_cols += [F.col(f"__m__.{c}").alias(f"{prefix}{c}")
                 for c in right_cols]
    return u.select(*out_cols)
