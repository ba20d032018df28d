"""The Spark-first structure-inference engine.

The reference analyzes a fully-materialized Python object tree by
recursive descent, re-walking the raw data once per level
(reference: structa/analyzer.py:400-492, O(depth x N)). This engine
instead:

1. **Plans** leaf extraction from the DataFrame schema: leaves sharing
   the same repetition context (chain of array/map explosions) are
   grouped so each context costs exactly ONE Spark job.
2. Runs **one wide aggregation per context** computing, for every leaf
   at once: counts, null/empty counts, min/max, (approximate)
   quartiles, distinct cardinality, and the failure count of every
   candidate string conversion (bool word-pairs, int bases o/d/x,
   float, datetime formats) — a single pass, fully JVM-side,
   whole-stage-codegen'd, with map-side partial aggregation and no
   shuffle of row data (only the scalar agg state).
3. Classifies each leaf **driver-side from the aggregates** (KB-sized)
   using the reference's threshold semantics: ``bad_threshold`` over
   occurrences, ``empty_threshold`` for blank strings,
   ``null_threshold`` for nulls, the numeric tower Bool < Int < Float,
   the numeric-timestamp heuristic over min/max, and the
   record-vs-table ``field_threshold`` duality.
4. Optionally runs one extra *small* job per context for top-k
   frequency samples (unpivot -> groupBy -> windowed top-k: ONE
   shuffle for all leaves together) and one for per-position character
   classes of fixed-width strings (unpivot -> posexplode -> ONE
   shuffle), feeding the CharClass induction in
   :mod:`structa_spark.chars`.

At 100 TB none of this materializes data on the driver: every job
reduces to per-leaf scalars, quartiles use mergeable GK sketches
(``percentile_approx``), distincts use HLL++
(``approx_count_distinct``), and pattern induction can be run on a
``df.sample`` (``pattern_sample``) without changing semantics.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field as dc_field, fields as dc_fields, replace
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import conversions
from .chars import induce_pattern
from .model import (
    BoolT, DateTimeT, Empty, FieldT, FloatT, IntT, ListT, Node, RecordT,
    StrReprT, StrT, TableT, TupleT, URLT, ValueAny, merge, record_similarity,
    NumReprT,
)
from .stats import LengthStats, Stats


@dataclass(frozen=True)
class AnalyzerConfig:
    """Inference thresholds (reference: structa/analyzer.py:119-145).

    Thresholds are measured over *occurrences*, not distinct values
    (reference: structa/conversions.py:38-44).
    """

    bad_threshold: float = 0.02     # tolerated conversion failures
    empty_threshold: float = 0.98   # tolerated blank strings
    null_threshold: float = 0.99    # tolerated nulls
    field_threshold: int = 20       # record vs table distinct-key gate
    merge_threshold: float = 0.5    # record-collapse similarity gate
    max_numeric_len: int = 30       # only try conversions on short strings
    strip_whitespace: bool = False  # trim strings before analysis
    max_pattern_len: int = 64       # induce patterns up to this width
    exact: bool = False             # exact quartiles/distincts (oracle mode)
    # percentile_approx accuracy (~1/err). PRECEDENCE: used only when
    # kll_k == 0 (and exact is False) — with a KLL sketch enabled the
    # displayed quartiles read from that sketch (fixed ~1.65% rank
    # error at k=200) so merge_profiles folds the very numbers shown,
    # and this knob is ignored. Set kll_k=0 to get the
    # accuracy-tunable percentile_approx path (profiles then carry no
    # mergeable quantile state).
    quantile_accuracy: int = 1000
    # KLL-doubles sketch parameter for the mergeable quantile summary
    # carried in Stats.qsketches (k=200 -> ~1.65% worst-case rank
    # error, ~3 KB serialized). 0 disables carrying sketches (and
    # hands quartiles to percentile_approx/quantile_accuracy above).
    kll_k: int = 200
    # HLL++ relative standard deviation for approx_count_distinct in
    # sketch mode. Tight (0.5%) because the uniqueness flag is derived
    # from it: a loose default-rsd (5%) sketch can't distinguish
    # "unique" from "2% duplicated" at all. ~32 KB of registers per
    # column sketch — still negligible against executor memory.
    distinct_rsd: float = 0.005
    top_k: int = 3                  # frequency sample size
    collect_samples: bool = True    # run the top-k frequency job
    induce_patterns: bool = True    # run the char-pattern job
    pattern_sample: Optional[float] = None  # sample fraction at scale
    # numeric-timestamp heuristic window (reference analyzer.py:742-770)
    # plan wide homogeneous structs (> field_threshold fields, one
    # common type) as ONE unpivoted (key, value) context instead of
    # per-field contexts; False forces the per-field plan (the
    # record-vs-table decision then happens at assembly time via
    # _maybe_table — same result, unboundedly many jobs on wide docs)
    unpivot_tables: bool = True
    # the analyzer makes several passes over the input; when the
    # input is a SMALL local file set (single-row-group parquet
    # caps scan parallelism at one task per file), repartition to the
    # cluster's parallelism and cache before analyzing. The byte gate
    # makes this self-disabling at scale: a 100 TB table streams,
    # a 10 MB file decodes once instead of once per job.
    cache_small_input: bool = True
    cache_input_max_bytes: int = 1 << 30
    epoch: str = "unix"             # unix | excel | custom
    epoch_base: Optional[_dt.datetime] = None   # base for epoch='custom'
    scale: float = 1.0              # units -> seconds multiplier
    min_timestamp: Optional[_dt.datetime] = None   # default: now - 20y
    max_timestamp: Optional[_dt.datetime] = None   # default: now + 10y


# ---------------------------------------------------------------------------
# extraction planning
# ---------------------------------------------------------------------------

@dataclass
class _Leaf:
    path: Tuple[str, ...]       # logical path from the root
    key: str                    # unique agg-column prefix
    expr: str                   # column expression within the context df
    dtype: T.DataType
    role: str = "value"         # value | map_key


@dataclass
class _Context:
    """One repetition context == one Spark job."""

    id: int
    df: DataFrame
    leaves: List[_Leaf] = dc_field(default_factory=list)
    # container length leaves: size(col) stats computed in the parent
    # context (path, key, expr producing an INT size)
    length_leaves: List[_Leaf] = dc_field(default_factory=list)


def _wide_table_struct(dtype: T.DataType,
                       cfg: AnalyzerConfig) -> Optional[T.DataType]:
    """A struct wider than ``field_threshold`` whose fields all share
    one Spark type is going to collapse to a table anyway
    (reference: structa/analyzer.py:422-443 — the record-vs-table
    duality). Detect it at PLAN time so it can be profiled via
    unpivot: one (key, value) repetition context instead of one
    context per field. A real USN database (~6000 advisory keys)
    plans 2 jobs instead of thousands; the combined value column also
    matches the reference's re-analysis of merged samples
    (analyzer.py:354-360) more closely than merging per-field
    summaries would.

    Returns the common field type, or None when the struct should be
    profiled field-by-field (narrow, heterogeneous, or all-null).
    """
    if not cfg.unpivot_tables:
        return None
    if not isinstance(dtype, T.StructType):
        return None
    if len(dtype.fields) <= cfg.field_threshold:
        return None
    common = {f.dataType.simpleString() for f in dtype.fields}
    if len(common) != 1:
        return None
    val_dt = dtype.fields[0].dataType
    if isinstance(val_dt, T.NullType):
        return None
    return val_dt


def _plan(df: DataFrame, cfg: AnalyzerConfig):
    contexts: List[_Context] = []
    # array column sources for the tuple-induction pass:
    # path -> (ctx id, array expr, element dtype)
    array_srcs: Dict[Tuple[str, ...], Tuple[int, str, T.DataType]] = {}
    # wide homogeneous structs profiled as tables via unpivot:
    # path -> common value dtype
    table_structs: Dict[Tuple[str, ...], T.DataType] = {}
    counter = [0]

    def new_context(cdf: DataFrame) -> _Context:
        ctx = _Context(id=len(contexts), df=cdf)
        contexts.append(ctx)
        return ctx

    root = new_context(df)

    def walk(ctx: _Context, expr: str, dtype: T.DataType,
             path: Tuple[str, ...]):
        counter[0] += 1
        key = f"c{counter[0]}"
        if isinstance(dtype, T.StructType):
            val_dt = _wide_table_struct(dtype, cfg)
            if val_dt is not None:
                # unpivot: entries = [(field name, field value), ...],
                # null values dropped — a missing key in one document
                # reads as a null field after schema union, exactly
                # the rows the reference's per-document key walk
                # would never see. (A literal JSON ``null`` value is
                # indistinguishable from an absent key here; the
                # reference can tell them apart.)
                fexprs = [
                    f"{expr}.`{f.name}`" if expr else f"`{f.name}`"
                    for f in dtype.fields
                ]
                table_structs[path] = val_dt
                size_expr = (
                    "size(filter(array({}), x -> x is not null))"
                    .format(", ".join(fexprs)))
                if expr:
                    # a NULL struct must yield a NULL length (like
                    # size() of a NULL map), not 0 — otherwise its
                    # card counts every row and the field is never
                    # marked optional
                    size_expr = (f"case when {expr} is null then null "
                                 f"else {size_expr} end")
                ctx.length_leaves.append(_Leaf(
                    path, key + "_len", size_expr, T.IntegerType()))
                entries = [
                    F.struct(F.lit(f.name).alias("k"),
                             F.expr(fe).alias("v"))
                    for f, fe in zip(dtype.fields, fexprs)
                ]
                child_df = (
                    ctx.df
                    .select(F.explode(F.array(*entries)).alias("__p__"))
                    .select(F.col("__p__.k").alias("__key__"),
                            F.col("__p__.v").alias("__val__"))
                    .where(F.col("__val__").isNotNull()))
                child = new_context(child_df)
                walk(child, "`__key__`", T.StringType(), path + ("{k}",))
                for leaf in child.leaves:
                    if leaf.path == path + ("{k}",):
                        leaf.role = "map_key"
                walk(child, "`__val__`", val_dt, path + ("{v}",))
                return
            for f in dtype.fields:
                walk(ctx, f"{expr}.`{f.name}`" if expr else f"`{f.name}`",
                     f.dataType, path + (f.name,))
        elif isinstance(dtype, T.ArrayType):
            ctx.length_leaves.append(
                _Leaf(path, key + "_len", f"size({expr})", T.IntegerType()))
            array_srcs[path] = (ctx.id, expr, dtype.elementType)
            child_df = ctx.df.select(
                F.explode(F.expr(expr)).alias("__elem__"))
            child = new_context(child_df)
            walk(child, "`__elem__`", dtype.elementType, path + ("[]",))
        elif isinstance(dtype, T.MapType):
            ctx.length_leaves.append(
                _Leaf(path, key + "_len", f"size({expr})", T.IntegerType()))
            child_df = ctx.df.select(
                F.explode(F.expr(expr)).alias("__key__", "__val__"))
            child = new_context(child_df)
            walk(child, "`__key__`", dtype.keyType, path + ("{k}",))
            for leaf in child.leaves:
                if leaf.path == path + ("{k}",):
                    leaf.role = "map_key"
            walk(child, "`__val__`", dtype.valueType, path + ("{v}",))
        else:
            ctx.leaves.append(_Leaf(path, key, expr, dtype))

    # walk the whole schema as one struct so a wide homogeneous ROOT
    # (a document object keyed by ids) takes the unpivot path too
    walk(root, "", df.schema, ())
    return contexts, array_srcs, table_structs


# ---------------------------------------------------------------------------
# the wide aggregation
# ---------------------------------------------------------------------------

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def _agg_exprs(leaf: _Leaf, cfg: AnalyzerConfig) -> List[Column]:
    """Hash-aggregable phase-A aggregates (count/sum + min/max over
    MUTABLE buffer types). A min/max over a STRING column carries a
    UTF8String aggregation buffer, which HashAggregate cannot hold —
    one such expression demotes the WHOLE agg to an un-codegen'd
    SortAggregate — so string min/max live in their own job
    (:func:`_string_minmax_exprs`) and everything here stays inside
    WholeStageCodegen."""
    c = F.expr(leaf.expr)
    k = leaf.key
    exprs = [
        F.count(c).alias(f"{k}__card"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{k}__nulls"),
    ]

    dt = leaf.dtype
    if isinstance(dt, (T.BooleanType, *_NUMERIC, T.TimestampType,
                       T.TimestampNTZType, T.DateType)):
        exprs += [F.min(c).alias(f"{k}__min"), F.max(c).alias(f"{k}__max")]
    elif isinstance(dt, T.StringType):
        ln = F.length(c)
        exprs += [
            F.sum(F.when(c == "", 1).otherwise(0)).alias(f"{k}__empty"),
            F.min(ln).alias(f"{k}__lmin"), F.max(ln).alias(f"{k}__lmax"),
            F.sum(F.when(c.rlike(conversions.URL_REGEX), 0).otherwise(1))
             .alias(f"{k}__url_fail"),
        ]
    elif isinstance(dt, T.BinaryType):
        ln = F.length(c)
        exprs += [F.min(ln).alias(f"{k}__lmin"),
                  F.max(ln).alias(f"{k}__lmax")]
    return exprs


def _string_minmax_exprs(leaf: _Leaf, cfg: AnalyzerConfig) -> List[Column]:
    """String (and binary-free) min/max — immutable aggregation
    buffers, executed as a keyless SortAggregate in a separate job so
    they never demote the hash-aggregable job out of codegen."""
    if not isinstance(leaf.dtype, T.StringType):
        return []
    c = F.expr(leaf.expr)
    k = leaf.key
    return [F.min(c).alias(f"{k}__min"), F.max(c).alias(f"{k}__max")]


_HLL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
              T.StringType, T.BinaryType)


def _hll_lg_k(rsd: float) -> int:
    """DataSketches HLL log2(registers) for a target relative standard
    error: rse ~= 1.04 / sqrt(2^lgK)."""
    import math
    return min(21, max(8, math.ceil(2 * math.log2(1.04 / rsd))))


def _sketch_agg_exprs(leaf: _Leaf, cfg: AnalyzerConfig) -> List[Column]:
    """Imperative (ObjectHashAggregate) phase-A aggregates: distinct
    sketches and quartiles. Kept in their own job so the codegen-able
    aggregates above stay inside whole-stage codegen — one
    ImperativeAggregate in an agg forces the WHOLE aggregation into
    interpreted ObjectHashAggregate.

    Distincts use the DataSketches HLL (``hll_sketch_agg``), NOT
    ``approx_count_distinct``: the latter is a fixed-width
    ImperativeAggregate whose buffer schema is one LONG column per
    HLL register word (~6k columns per sketch at rsd=0.005), so a
    24-leaf job generates a multi-MB aggregate class and several such
    compiles exhaust the JVM heap — the round-2 wide-record OOM.
    hll_sketch_agg is a TypedImperativeAggregate with ONE binary
    buffer per leaf; its generated code is O(leaves), not
    O(leaves x registers)."""
    c = F.expr(leaf.expr)
    k = leaf.key
    if cfg.exact:
        exprs = [F.count_distinct(c).alias(f"{k}__distinct")]
    else:
        hc = c
        if not isinstance(leaf.dtype, _HLL_TYPES):
            # hll_sketch_agg accepts integral/string/binary only. For
            # any other type feed it xxhash64(value): HLL hashes its
            # input anyway, so pre-hashing leaves the estimate's
            # statistics unchanged (64-bit collisions are negligible
            # next to the sketch's own error) and the codegen'd hash
            # is far cheaper than rendering doubles/timestamps to
            # strings. Guard nulls: xxhash64(NULL) is the seed, not
            # NULL, and distinct counts must ignore nulls.
            hc = F.when(c.isNotNull(), F.xxhash64(c))
        exprs = [F.hll_sketch_estimate(
            F.hll_sketch_agg(hc, F.lit(_hll_lg_k(cfg.distinct_rsd))))
            .alias(f"{k}__distinct")]

    dt = leaf.dtype
    qc = None
    if isinstance(dt, _NUMERIC):
        qc = c
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        qc = c.cast("timestamp").cast("double")
    if qc is not None:
        if cfg.exact:
            exprs.append(F.percentile(qc, F.lit([0.25, 0.5, 0.75]))
                         .alias(f"{k}__q"))
        elif cfg.kll_k:
            # ONE quantile aggregate per leaf: the displayed quartiles
            # read from the same mergeable KLL sketch that
            # merge_profiles folds (Spark collapses the semantically
            # identical aggregate into one buffer, so the sketch is
            # built once) — not a parallel percentile_approx doing the
            # same imperative work twice. KLL k=200 carries ~1.65%
            # rank error, the sketch's documented accuracy for both
            # the single-shard and the shard-fold path.
            sk = F.kll_sketch_agg_double(qc.cast("double"),
                                         F.lit(cfg.kll_k))
            # the count() gate keeps an all-null column from calling
            # get_quantile on an empty sketch (which raises); the
            # CaseWhen branch is lazy, so the result stays NULL like
            # percentile_approx's
            exprs.append(F.when(
                F.count(qc) > 0,
                F.kll_sketch_get_quantile_double(
                    sk, F.lit([0.25, 0.5, 0.75]))).alias(f"{k}__q"))
            exprs.append(sk.alias(f"{k}__qsk"))
        else:
            exprs.append(F.percentile_approx(
                qc, F.lit([0.25, 0.5, 0.75]),
                F.lit(cfg.quantile_accuracy)).alias(f"{k}__q"))
    return exprs


def _candidate_agg_exprs(leaf: _Leaf, cfg: AnalyzerConfig,
                         lmin: int, lmax: int) -> List[Column]:
    """Phase-B aggregation: conversion-candidate failure counts for one
    length-eligible string leaf (reference only attempts conversions
    when max length <= 30, structa/analyzer.py:642-669). Candidates
    whose length range cannot overlap the column's are skipped entirely
    — a long-text column costs zero regex evaluations, and e.g. a
    1-char flag column never attempts any datetime parse."""
    c = F.expr(leaf.expr)
    k = leaf.key
    nonblank = c.isNotNull() & (c != "")
    exprs: List[Column] = []
    numeric_alive = False
    for cand in conversions.candidates():
        if not cand.possible(lmin, lmax):
            continue
        exprs.append(
            F.sum(F.when(nonblank & ~cand.ok(c), 1).otherwise(0))
            .alias(f"{k}__fail__{cand.name}"))
        if cand.kind in ("int", "float"):
            numeric_alive = True
    if numeric_alive:
        # numeric min/max for str-of-number stats + timestamp heuristic
        dnum = F.when(nonblank, c.try_cast("double"))
        exprs += [F.min(dnum).alias(f"{k}__nmin"),
                  F.max(dnum).alias(f"{k}__nmax")]
    return exprs


def _length_agg_exprs(leaf: _Leaf, cfg: AnalyzerConfig) -> List[Column]:
    c = F.expr(leaf.expr)
    k = leaf.key
    return [
        F.count(c).alias(f"{k}__card"),
        F.min(c).alias(f"{k}__min"),
        F.max(c).alias(f"{k}__max"),
    ]


# ---------------------------------------------------------------------------
# driver-side classification
# ---------------------------------------------------------------------------

def _classify_leaf(leaf: _Leaf, row: Dict, cfg: AnalyzerConfig,
                   total_rows: int) -> Node:
    k = leaf.key
    card = row.get(f"{k}__card") or 0
    nulls = row.get(f"{k}__nulls") or 0
    n = card + nulls
    if n == 0:
        return Empty()
    # too many nulls -> give up (reference analyzer.py:615-621)
    if nulls and (nulls / n) > cfg.null_threshold:
        return ValueAny()
    if card == 0:
        return Empty()

    distinct = row.get(f"{k}__distinct")
    # sketch mode: the HLL estimate of a truly-unique column lies
    # within 3*rsd of card with ~99.9% probability, so flag unique at
    # estimate >= (1 - 3*rsd)*card; a column more than ~6*rsd
    # duplicated cannot cross that bar. (exact mode compares equality)
    stats = Stats(
        card=card, distinct=distinct,
        min=row.get(f"{k}__min"), max=row.get(f"{k}__max"),
        unique=bool(distinct == card) if cfg.exact else
        bool(distinct
             and distinct >= (1.0 - 3 * cfg.distinct_rsd) * card),
    )
    q = row.get(f"{k}__q")
    if q is not None:
        stats = replace(stats, q1=q[0], q2=q[1], q3=q[2])
    sk = row.get(f"{k}__qsk")
    if sk is not None:
        stats = replace(stats, qsketches=(bytes(sk),))

    dt = leaf.dtype
    if isinstance(dt, T.BooleanType):
        return BoolT(stats=stats)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        if q is not None:
            stats = replace(
                stats,
                q1=_from_epoch(q[0]), q2=_from_epoch(q[1]),
                q3=_from_epoch(q[2]))
        return DateTimeT(stats=stats)
    if isinstance(dt, _NUMERIC):
        is_int = isinstance(
            dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
        node = IntT(stats=stats) if is_int else FloatT(stats=stats)
        return _maybe_numeric_timestamp(node, cfg)
    if isinstance(dt, T.StringType):
        return _classify_string(leaf, row, cfg, stats)
    if isinstance(dt, T.BinaryType):
        lengths = LengthStats(card=card, min=row.get(f"{k}__lmin"),
                              max=row.get(f"{k}__lmax"))
        return StrT(stats=stats, lengths=lengths)
    return ValueAny()


def _classify_string(leaf: _Leaf, row: Dict, cfg: AnalyzerConfig,
                     stats: Stats) -> Node:
    k = leaf.key
    card = stats.card
    empties = row.get(f"{k}__empty") or 0
    if empties:
        if empties / card > cfg.empty_threshold:
            return StrT(stats=stats, lengths=LengthStats(
                card=card, min=row.get(f"{k}__lmin"),
                max=row.get(f"{k}__lmax")))
        card_ne = card - empties
    else:
        card_ne = card
    if card_ne == 0:
        return StrT(stats=stats, lengths=LengthStats(card=card, min=0, max=0))

    budget = cfg.bad_threshold * card_ne
    # when blanks were dropped, they must not count as failures — every
    # fail counter includes only non-blank values by construction
    lengths = LengthStats(card=card, min=row.get(f"{k}__lmin"),
                          max=row.get(f"{k}__lmax"))

    fixed = (lengths.fixed and empties == 0)
    for cand in conversions.candidates():
        if cand.kind == "datetime" and cand.fixed_len and not fixed:
            continue
        fails = row.get(f"{k}__fail__{cand.name}")
        if fails is None or fails > budget:
            continue
        if cand.kind == "bool":
            inner: Node = BoolT(stats=Stats(card=card_ne))
        elif cand.kind == "int":
            inner = IntT(stats=_numeric_stats(row, k, card_ne, int))
            inner = _maybe_numeric_timestamp(inner, cfg)
        elif cand.kind == "float":
            inner = FloatT(stats=_numeric_stats(row, k, card_ne, float))
            inner = _maybe_numeric_timestamp(inner, cfg)
        else:
            inner = DateTimeT(stats=Stats(card=card_ne))
        return StrReprT(inner=inner, pattern=cand.pattern)

    url_fail = row.get(f"{k}__url_fail") or 0
    if url_fail <= budget:
        return URLT(stats=stats, lengths=lengths)
    return StrT(stats=stats, lengths=lengths)


def _numeric_stats(row: Dict, k: str, card: int, typ) -> Stats:
    lo, hi = row.get(f"{k}__nmin"), row.get(f"{k}__nmax")
    try:
        lo = typ(lo) if lo is not None else None
        hi = typ(hi) if hi is not None else None
    except (TypeError, ValueError):
        lo = hi = None
    return Stats(card=card, min=lo, max=hi)


_UNIX = _dt.datetime(1970, 1, 1)
_EXCEL = _dt.datetime(1899, 12, 30)


def _epoch_base(cfg: AnalyzerConfig) -> _dt.datetime:
    if cfg.epoch == "custom" and cfg.epoch_base is not None:
        return cfg.epoch_base
    return _EXCEL if cfg.epoch == "excel" else _UNIX


def _from_epoch(v):
    """Decode a quartile of a NATIVE timestamp column: percentiles of
    timestamps are epoch seconds by Spark's definition, so the Unix
    epoch is always the right base here. (Custom/excel epoch bases
    only apply to NUMERIC columns holding encoded timestamps — those
    decode via _maybe_numeric_timestamp's cfg-aware `conv`.)"""
    if v is None:
        return None
    return _UNIX + _dt.timedelta(seconds=float(v))


def _maybe_numeric_timestamp(node: Node, cfg: AnalyzerConfig) -> Node:
    """Ints/floats whose min & max both decode to plausible timestamps
    become ``NumReprT(DateTimeT)`` (reference analyzer.py:742-770)."""
    if not isinstance(node, (IntT, FloatT)):
        return node
    lo, hi = node.stats.min, node.stats.max
    if lo is None or hi is None:
        return node
    now = _dt.datetime.now()
    min_ts = cfg.min_timestamp or (now - _dt.timedelta(days=20 * 365))
    max_ts = cfg.max_timestamp or (now + _dt.timedelta(days=10 * 365))
    base = _epoch_base(cfg)
    scale = cfg.scale if cfg.epoch != "excel" else 86400.0
    try:
        lo_dt = base + _dt.timedelta(seconds=float(lo) * scale)
        hi_dt = base + _dt.timedelta(seconds=float(hi) * scale)
    except (OverflowError, ValueError):
        return node
    if min_ts <= lo_dt and hi_dt <= max_ts:
        pat = "d" if isinstance(node, IntT) else "f"

        def conv(v):
            return (base + _dt.timedelta(seconds=float(v) * scale)
                    if v is not None else None)

        inner = DateTimeT(stats=Stats(
            card=node.stats.card, distinct=node.stats.distinct,
            min=lo_dt, max=hi_dt, unique=node.stats.unique,
            q1=conv(node.stats.q1), q2=conv(node.stats.q2),
            q3=conv(node.stats.q3)))
        return NumReprT(inner=inner, pattern=pat,
                        epoch=cfg.epoch, scale=scale,
                        epoch_offset=(base - _UNIX).total_seconds())
    return node


# ---------------------------------------------------------------------------
# auxiliary jobs: top-k samples and pattern induction
# ---------------------------------------------------------------------------

def _counted_values(ctx: _Context, keys: Dict[str, _Leaf]) -> DataFrame:
    """The shared frequency relation: one row per DISTINCT (leaf,
    value) across the given leaves — built once per context so top-k
    sampling and exact-mode string quartiles don't each rescan the
    input (they consume disjoint projections of the same counts)."""
    pairs = [
        F.struct(F.lit(key).alias("k"),
                 F.expr(leaf.expr).cast("string").alias("v"))
        for key, leaf in keys.items()
    ]
    unp = (ctx.df.select(F.explode(F.array(*pairs)).alias("p"))
           .select("p.k", "p.v").where(F.col("v").isNotNull()))
    return unp.groupBy("k", "v").agg(F.count("*").alias("n"))


def _collect_topk(ctx: _Context, string_keys: Dict[str, _Leaf],
                  cfg: AnalyzerConfig,
                  counted: Optional[DataFrame] = None
                  ) -> Tuple[Dict[str, List[Tuple[str, int]]],
                             Dict[str, List[Tuple[str, int]]]]:
    """ONE job for all leaves of a context: unpivot to (name, value),
    group, windowed top-k AND bottom-k by count (the reference's
    sample display shows the 3 most and 3 least frequent values,
    types.py:142-163 — both ranks come out of the same shuffle).
    Scale note: the shuffle key is (leaf, value) — the same
    cardinality structa's per-column Counter would see, but
    distributed and combiner-compressed map-side."""
    if not string_keys or not cfg.collect_samples:
        return {}, {}
    from pyspark.sql.window import Window

    if counted is None:
        counted = _counted_values(ctx, string_keys)
    else:
        counted = counted.where(
            F.col("k").isin(list(string_keys)))
    w_top = Window.partitionBy("k").orderBy(F.desc("n"), F.asc("v"))
    w_bot = Window.partitionBy("k").orderBy(F.asc("n"), F.desc("v"))
    ranked = (counted
              .withColumn("rt", F.row_number().over(w_top))
              .withColumn("rb", F.row_number().over(w_bot))
              .where((F.col("rt") <= cfg.top_k)
                     | (F.col("rb") <= cfg.top_k)))
    out: Dict[str, List[Tuple[str, int]]] = {}
    bot: Dict[str, List[Tuple[str, int]]] = {}
    for r in ranked.collect():
        if r["rt"] <= cfg.top_k:
            out.setdefault(r["k"], []).append((r["v"], r["n"]))
        if r["rb"] <= cfg.top_k:
            bot.setdefault(r["k"], []).append((r["v"], r["n"]))
    for v in out.values():
        v.sort(key=lambda t: (-t[1], t[0]))
    for v in bot.values():
        # most-common order, like the tail of Counter.most_common()
        v.sort(key=lambda t: (-t[1], t[0]))
    return out, bot


def _collect_string_quartiles(
        ctx: _Context, string_keys: Dict[str, _Leaf],
        cfg: AnalyzerConfig,
        counted: Optional[DataFrame] = None
) -> Dict[str, Tuple[str, str, str]]:
    """Lexicographic q1/q2/q3 for string leaves — the reference
    computes quartiles for ANY sortable type by a sorted-distinct
    cumulative walk (reference: structa/types.py:182-207); this is
    that walk as ONE distributed job for all string leaves of a
    context: unpivot -> groupBy(leaf, value).count() -> per-leaf
    cumulative count over the value ordering -> first value whose
    preceding-cumulative reaches each quartile index (remainder
    falls back to max, exactly the reference's tail rule).

    Scale shape: the shuffle carries one row per DISTINCT (leaf,
    value) — the same cardinality the reference's per-column Counter
    holds in driver RAM, but distributed and combiner-compressed. The
    cumulative window partitions by leaf, so one extremely-high-
    cardinality column serializes into one task; exact mode is the
    oracle path — sketch mode skips string quartiles (numeric ones
    use the mergeable GK sketch instead)."""
    if not string_keys or not cfg.exact:
        return {}
    from pyspark.sql.window import Window

    if counted is None:
        counted = _counted_values(ctx, string_keys)
    else:
        counted = counted.where(
            F.col("k").isin(list(string_keys)))
    w_ord = (Window.partitionBy("k").orderBy("v")
             .rowsBetween(Window.unboundedPreceding, -1))
    w_all = Window.partitionBy("k")
    cum = counted.select(
        "k", "v",
        F.coalesce(F.sum("n").over(w_ord), F.lit(0)).alias("before"),
        F.sum("n").over(w_all).alias("total"))
    # reference index rule: idx_k = (k*card)//4; quartile = first
    # value with before >= idx_k, else max
    agg = cum.groupBy("k").agg(*[
        F.coalesce(
            F.min(F.when(F.col("before")
                         >= F.floor(F.col("total") * i / 4), F.col("v"))),
            F.max("v")).alias(f"q{i}")
        for i in (1, 2, 3)
    ])
    return {r["k"]: (r["q1"], r["q2"], r["q3"]) for r in agg.collect()}


def _collect_patterns(ctx: _Context, fixed_leaves: Dict[str, _Leaf],
                      cfg: AnalyzerConfig) -> Dict[str, list]:
    """ONE job: per-position char sets of fixed-width string leaves
    (posexplode + collect_set; reference analyzer.py:685-719)."""
    if not fixed_leaves or not cfg.induce_patterns:
        return {}
    df = ctx.df
    if cfg.pattern_sample:
        df = df.sample(cfg.pattern_sample, seed=42)
    pairs = [
        F.struct(F.lit(key).alias("k"),
                 F.expr(leaf.expr).cast("string").alias("v"))
        for key, leaf in fixed_leaves.items()
    ]
    unp = (df.select(F.explode(F.array(*pairs)).alias("p"))
           .select("p.k", "p.v").where(F.col("v").isNotNull()))
    chars = (unp
             .select("k", F.posexplode(F.split(F.col("v"), "")).alias(
                 "pos", "ch"))
             .where(F.col("ch") != "")
             .groupBy("k", "pos").agg(F.collect_set("ch").alias("chars")))
    out: Dict[str, list] = {}
    for r in chars.collect():
        out.setdefault(r["k"], []).append((r["pos"], set(r["chars"])))
    return out


# ---------------------------------------------------------------------------
# assembly: leaves -> summary tree
# ---------------------------------------------------------------------------

class Profile:
    """The result of :func:`analyze`: the inferred summary tree plus
    access to per-path nodes and renderings."""

    def __init__(self, root: Node, row_count: int, cfg: AnalyzerConfig):
        self.root = root
        self.row_count = row_count
        self.config = cfg

    def render(self, opts=None) -> str:
        out = self.root.render(opts)
        if not self.config.exact and self._has_quartile_less_string():
            # sketch mode computes numeric quartiles with mergeable GK
            # sketches, but lexicographic string quartiles have no
            # mergeable sketch — they are exact-mode only, so say so
            # instead of leaving the range silently bare
            out += ("\n# note: string q1-q3 omitted (sketch mode; "
                    "rerun with exact=True for lexicographic quartiles)")
        return out

    def _has_quartile_less_string(self) -> bool:
        from .model import StrT, walk_nodes
        return any(
            isinstance(n, StrT) and n.stats.card and n.stats.q1 is None
            for n in walk_nodes(self.root))

    def __repr__(self) -> str:
        return f"Profile({self.render()})"

    # compilation helpers live in structa_spark.plans
    def to_schema(self):
        from .plans import to_spark_schema
        return to_spark_schema(self.root)

    def validation_predicate(self):
        from .plans import validation_predicate
        return validation_predicate(self.root)

    def decode(self, df: DataFrame) -> DataFrame:
        """Apply the compiled cast chains: every Repr-typed column is
        replaced by its logical value (str-of-int -> bigint, ...)."""
        from .plans import apply_casts
        return apply_casts(df, self.root)

    def to_dict(self) -> dict:
        """JSON-able tree of the inferred summary (programmatic twin
        of :meth:`render`)."""
        from .model import node_to_dict
        return {"row_count": self.row_count,
                "root": node_to_dict(self.root)}

    def save(self, path: str) -> None:
        """Persist the full summary (lossless JSON) for reuse without
        re-scanning — see structa_spark.serialize."""
        from .serialize import save_profile
        save_profile(self, path)

    @staticmethod
    def load(path: str) -> "Profile":
        from .serialize import load_profile
        return load_profile(path)


# max leaves per agg() job: Janino compiles one generated class per
# aggregation, and its size grows with the expression count — a
# 120-leaf context compiled as ONE agg is a multi-MB class, and
# several of those compiling concurrently exhausts the JVM heap
# (observed on the 40-field USN shape). Bounded chunks keep every
# generated class small; every chunk is an independent pool task, so
# the WORKER-POOL BOUND (not per-context sequencing) is what caps
# concurrent compiles at n_workers bounded-size classes.
_CHUNK_LEAVES = 24


def _chunked(seq: List, n: int):
    for i in range(0, len(seq), n):
        yield seq[i:i + n]


def _phase_a_job_builders(leaves: List[_Leaf],
                          length_leaves: List[_Leaf],
                          cfg: AnalyzerConfig):
    """Phase A as a list of DEFERRED agg-job builders, TWO job
    families (round 12 halved the old four):

    * one whole-stage-codegen family — the scalar aggregates
      (counts/min/max) AND the container-length aggregates chunk
      together, since both carry mutable fixed-width buffers;
    * one ObjectHashAggregate family — the HLL/KLL sketches AND the
      string min/max aggregates. A UTF8String min/max buffer would
      demote the CODEGEN job to SortAggregate, which is why it never
      rides there; the sketch job is already imperative
      (ObjectHashAggregate), so the string min/max rides it for free
      and the old separate SortAggregate job family is gone.

    Each job covers <= _CHUNK_LEAVES leaves so no generated class is
    ever huge. Each entry is a zero-arg callable returning the job's
    Column list. Building a Column tree is driver-side py4j chatter
    (one JVM round trip per functions call — ~0.6 s serialized for a
    16-column profile, measured in round 11), so the EXPENSIVE part
    is deferred: the concurrent caller runs each builder inside its
    pool task, overlapping expression construction across workers
    and with already-running jobs instead of paying it up front on
    the submitting thread (guide §7.3: driver planning time is real
    time). The chunk layout itself is pure Python and stays eager so
    callers know the job count without building anything.

    The per-leaf expr strings are SNAPSHOT here (leaf copies): the
    builders run later on worker threads, so a mutation of the
    planner's _Leaf objects between layout and build (today only
    strip_whitespace, which runs before this) can never silently
    change the constructed aggregates."""
    leaves = [replace(lf) for lf in leaves]
    length_leaves = [replace(lf) for lf in length_leaves]
    specs: List[List] = []
    codegen_items = ([(_agg_exprs, lf) for lf in leaves]
                     + [(_length_agg_exprs, lf)
                        for lf in length_leaves])
    for chunk in _chunked(codegen_items, _CHUNK_LEAVES):
        specs.append(chunk)
    for chunk in _chunked(leaves, _CHUNK_LEAVES):
        items = []
        for lf in chunk:
            items.append((_sketch_agg_exprs, lf))
            if isinstance(lf.dtype, T.StringType):
                items.append((_string_minmax_exprs, lf))
        specs.append(items)

    def _make(items, with_rows):
        def build() -> List[Column]:
            exprs: List[Column] = (
                [F.count(F.lit(1)).alias("__rows__")]
                if with_rows else [])
            for fn, leaf in items:
                exprs.extend(fn(leaf, cfg))
            # d.agg() with zero expressions raises inside a pool
            # worker with a useless stack; fail at build time with a
            # clear message instead if a future cfg/expr change ever
            # yields an empty job
            assert exprs, (
                "phase-A builder produced an empty agg job "
                f"({[lf.key for _, lf in items]})")
            return exprs
        return build

    if not specs:
        return [_make([], True)]
    return [_make(items, i == 0) for i, items in enumerate(specs)]


def _phase_a_jobs(leaves: List[_Leaf], length_leaves: List[_Leaf],
                  cfg: AnalyzerConfig) -> List[List[Column]]:
    """Eager form of :func:`_phase_a_job_builders` for the
    sequential single-context paths."""
    return [build() for build in
            _phase_a_job_builders(leaves, length_leaves, cfg)]


def _phase_a_row(df: DataFrame, leaves: List[_Leaf],
                 length_leaves: List[_Leaf],
                 cfg: AnalyzerConfig) -> Dict:
    """Phase A over one DataFrame, run sequentially (used by the
    auxiliary single-context paths, e.g. tuple induction)."""
    row: Dict = {"__rows__": None}
    for exprs in _phase_a_jobs(leaves, length_leaves, cfg):
        row.update(df.agg(*exprs).collect()[0].asDict())
    return row


def _phase_b_row(df: DataFrame, leaves: List[_Leaf], row: Dict,
                 cfg: AnalyzerConfig) -> Dict:
    """Phase B: length-gated conversion-candidate scoring; returns the
    extra scalar columns ({} when no string leaf is eligible)."""
    eligible = []
    for leaf in leaves:
        if not isinstance(leaf.dtype, T.StringType):
            continue
        card = row.get(f"{leaf.key}__card") or 0
        lmax = row.get(f"{leaf.key}__lmax")
        if card and lmax is not None and lmax <= cfg.max_numeric_len:
            eligible.append(leaf)
    out: Dict = {}
    # candidate counts are regex-heavy: ~15 exprs per leaf, so chunk
    # tighter than phase A to keep the generated classes bounded
    for chunk in _chunked(eligible, max(1, _CHUNK_LEAVES // 2)):
        cand_exprs: List[Column] = []
        for leaf in chunk:
            cand_exprs.extend(_candidate_agg_exprs(
                leaf, cfg, row.get(f"{leaf.key}__lmin") or 0,
                row.get(f"{leaf.key}__lmax")))
        if cand_exprs:
            out.update(df.agg(*cand_exprs).collect()[0].asDict())
    return out


def _run_leaf_stats(df: DataFrame, leaves: List[_Leaf],
                    length_leaves: List[_Leaf],
                    cfg: AnalyzerConfig) -> Dict:
    """Phase A + phase B over one DataFrame (merged scalar row)."""
    row = _phase_a_row(df, leaves, length_leaves, cfg)
    row.update(_phase_b_row(df, leaves, row, cfg))
    return row


_ATOMIC = (T.BooleanType, T.StringType, T.TimestampType,
           T.TimestampNTZType, T.DateType, T.BinaryType) + _NUMERIC


def _induce_tuples(contexts, array_srcs, length_stats, cfg):
    """Fixed-width short arrays become positional tuples (reference
    analyzer.py:576-588: all sub-lists the same length, shorter than
    field_threshold, fewer than the outer count — 'table-like input
    from a language without tuples'). One extra job per qualifying
    array column, per-index stats via ``element_at``."""
    tuple_nodes: Dict[Tuple[str, ...], Node] = {}
    for path, (ctx_id, expr, elem_dt) in array_srcs.items():
        ls = length_stats.get(path)
        if ls is None or not ls.card or ls.min is None:
            continue
        width = ls.min
        if not (ls.fixed and 0 < width < cfg.field_threshold
                and ls.card > width):
            continue
        if not isinstance(elem_dt, _ATOMIC):
            continue
        elem = "element_at({}, {})"
        if cfg.strip_whitespace and isinstance(elem_dt, T.StringType):
            elem = "trim(element_at({}, {}))"
        leaves = [
            _Leaf(path + (str(i),), f"e{i}", elem.format(expr, i + 1),
                  elem_dt)
            for i in range(width)
        ]
        row = _run_leaf_stats(contexts[ctx_id].df, leaves, [], cfg)
        fields = []
        for i, leaf in enumerate(leaves):
            node = _classify_leaf(leaf, row, cfg, row["__rows__"])
            card = row.get(f"{leaf.key}__card") or 0
            fields.append(FieldT(key=i, value=node, count=card,
                                 optional=bool(card < ls.card)))
        tuple_nodes[path] = TupleT(fields=tuple(fields), lengths=ls)
    return tuple_nodes


def _input_bytes(df: DataFrame) -> Optional[int]:
    """Total size of the df's local input files, or None when the
    input is not a local file scan (remote FS, in-memory, streaming)."""
    import os
    from urllib.parse import unquote, urlparse
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return None
        try:
            total += os.path.getsize(unquote(u.path))
        except OSError:
            return None
    return total


def _prepare_input(df: DataFrame, cfg: AnalyzerConfig):
    """Size-gated cache of the analyzer's input: the profile makes
    several passes, so a small file set is repartitioned to the
    session's parallelism (single-row-group parquet otherwise pins
    every pass to one scan task) and persisted; anything big, remote
    or non-file streams unchanged. Returns (df, cached?)."""
    if not cfg.cache_small_input:
        return df, False
    nbytes = _input_bytes(df)
    if nbytes is None or nbytes > cfg.cache_input_max_bytes:
        return df, False
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        # hash-repartition on a deterministic all-column key instead
        # of round-robin: a keyless repartition(n) first LOCALLY
        # SORTS its input so retried tasks reproduce the same row
        # placement (spark.sql.execution.sortBeforeRepartition,
        # optimization guide §2.5) — on the one scan task holding a
        # single-row-group file that is a full sort of every row
        # before the exchange (~1s of the profile at sf0.1). Hash
        # placement is deterministic per ROW VALUE, so it needs no
        # such sort, and the rendered profile is partition-order
        # independent (verified identical at sf0.01/0.1 over
        # lineitem/documents/events).
        try:
            df = df.repartition(
                par, F.xxhash64(*[F.col(c) for c in df.columns]))
        except Exception:  # un-hashable column type: keep round-robin
            df = df.repartition(par)
    df = df.persist()
    # NOT materialized here: the old dedicated count() paid a full
    # scan+persist pass before any analysis job ran. _analyze now
    # runs the FIRST phase-A agg job as a synchronous barrier when
    # the input was cached — that job's scan materializes the cache
    # as a side effect (one pass instead of two), and only then does
    # the concurrent wave launch, so jobs never race an
    # unmaterialized cache into recomputing partitions.
    return df, True


def analyze(df: DataFrame, config: Optional[AnalyzerConfig] = None,
            **kwargs) -> Profile:
    """Profile a DataFrame into a typed summary tree.

    One wide agg per repetition context + at most two auxiliary jobs
    (top-k samples, char patterns) per context.
    """
    cfg = config or AnalyzerConfig(**kwargs)
    prep, cached = _prepare_input(df, cfg)
    try:
        return _analyze(prep, cfg, materialize_first=cached)
    finally:
        if cached:
            prep.unpersist()


def _analyze(df: DataFrame, cfg: AnalyzerConfig,
             materialize_first: bool = False) -> Profile:
    contexts, array_srcs, table_structs = _plan(df, cfg)

    # whitespace stripping (reference analyzer.py:633-638) applies to
    # every string leaf uniformly: stats, conversion candidates, top-k
    # samples and pattern induction all see the trimmed value
    if cfg.strip_whitespace:
        for ctx in contexts:
            for leaf in ctx.leaves:
                if isinstance(leaf.dtype, T.StringType):
                    leaf.expr = f"trim({leaf.expr})"

    rows: Dict[int, Dict] = {}
    topk: Dict[str, List[Tuple[str, int]]] = {}
    botk: Dict[str, List[Tuple[str, int]]] = {}
    str_q: Dict[str, Tuple[str, str, str]] = {}
    from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor
    from concurrent.futures import wait as _fwait

    # two-wave concurrent job submission ACROSS contexts: every
    # context's phase-A jobs launch immediately (each splits into a
    # codegen and a sketch job internally); as each phase A lands, its
    # dependent jobs (top-k, phase-B candidates, string quartiles) are
    # fanned out without waiting for the other contexts. Total
    # wall-clock is the critical path of the slowest context, not the
    # sum over contexts — at toy scale this hides per-job scheduling
    # latency, at scale it keeps the cluster busy across the small
    # tail stages.
    ctx_by_id = {ctx.id: ctx for ctx in contexts}
    # cap concurrency: each agg job compiles a generated class, and
    # compiling many simultaneously can exhaust the JVM heap. Phase A
    # chunks every context to <= _CHUNK_LEAVES leaves per job and
    # every chunk is its own pool task, so the in-flight compile
    # count never exceeds the worker count while chunks of one
    # context still overlap with each other and with other contexts;
    # scale the pool down when the plan is unusually wide (belt and
    # braces for single-JVM local mode, where driver and executors
    # share one heap).
    widest = max((len(c.leaves) + len(c.length_leaves)
                  for c in contexts), default=0)
    n_workers = 2 if (widest > 128 or len(contexts) > 64) else 4

    def _agg_job(d: DataFrame, build) -> Dict:
        # the builder runs HERE, inside the pool task: Column
        # construction is py4j round trips, so deferring it off the
        # submitting thread overlaps it across workers and with jobs
        # already executing
        return d.agg(*build()).collect()[0].asDict()

    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        a_futs = {}
        remaining: Dict[int, int] = {}
        ctx_groups = []
        for ctx in contexts:
            groups = _phase_a_job_builders(
                ctx.leaves, ctx.length_leaves, cfg)
            remaining[ctx.id] = len(groups)
            rows[ctx.id] = {"__rows__": None}
            ctx_groups.append((ctx, groups))
        if materialize_first and ctx_groups:
            # the input was freshly persisted but NOT materialized
            # (_prepare_input): run the root context's first phase-A
            # job as a barrier — its scan materializes the cache as
            # a side effect, folding the old dedicated count() pass
            # into real analysis work; everything after it reads the
            # in-memory columnar relation, never racing the cache
            # into recomputing partitions
            ctx0, groups0 = ctx_groups[0]
            fut0 = pool.submit(_agg_job, ctx0.df, groups0[0])
            a_futs[fut0] = ctx0.id
            fut0.result()
            ctx_groups[0] = (ctx0, groups0[1:])
        for ctx, groups in ctx_groups:
            for build in groups:
                a_futs[pool.submit(_agg_job, ctx.df, build)] = ctx.id
        dep_futs = []
        pending = set(a_futs)
        while pending:
            done, pending = _fwait(pending, return_when=FIRST_COMPLETED)
            for fut in done:
                ctx = ctx_by_id[a_futs[fut]]
                rows[ctx.id].update(fut.result())
                remaining[ctx.id] -= 1
                if remaining[ctx.id]:
                    continue
                # this context's phase A is complete: fan out its
                # dependent jobs without waiting for other contexts
                row = rows[ctx.id]

                def worth_sampling(leaf: _Leaf, row=row) -> bool:
                    # a frequency sample only means something when
                    # values repeat; skipping near-unique columns (key
                    # columns) keeps the top-k shuffle proportional to
                    # the REPEATED values only — at 100 TB this is the
                    # difference between shuffling every key once and
                    # shuffling a few hundred distinct values
                    card = row.get(f"{leaf.key}__card") or 0
                    distinct = row.get(f"{leaf.key}__distinct") or 0
                    return card <= 10_000 or distinct < 0.9 * card

                sampleable = {
                    leaf.key: leaf for leaf in ctx.leaves
                    if isinstance(leaf.dtype,
                                  (T.StringType, T.BooleanType,
                                   T.LongType, T.IntegerType))
                    and worth_sampling(leaf)
                }
                string_leaves = {
                    leaf.key: leaf for leaf in ctx.leaves
                    if isinstance(leaf.dtype, T.StringType)
                }
                # in exact mode both the top-k job and the string-
                # quartile job consume groupBy(leaf, value) counts;
                # build that relation ONCE over the union of their
                # leaves and run both consumers in one pool task —
                # materializing the cache before the first consumer,
                # because two tasks racing an unmaterialized cache
                # would each recompute it (the very scan this saves)
                if (cfg.exact and cfg.collect_samples
                        and sampleable and string_leaves):
                    def _shared_value_stats(ctx=ctx,
                                            sampleable=sampleable,
                                            string_leaves=string_leaves):
                        shared = _counted_values(
                            ctx, {**string_leaves, **sampleable}
                        ).persist()
                        try:
                            shared.count()
                            t, b = _collect_topk(
                                ctx, sampleable, cfg, shared)
                            q = _collect_string_quartiles(
                                ctx, string_leaves, cfg, shared)
                            return t, b, q
                        finally:
                            shared.unpersist()

                    tq_fut = pool.submit(_shared_value_stats)
                    q_fut = None
                else:
                    tq_fut = pool.submit(
                        _collect_topk, ctx, sampleable, cfg)
                    q_fut = pool.submit(_collect_string_quartiles,
                                        ctx, string_leaves, cfg)
                dep_futs.append((
                    ctx.id, tq_fut,
                    pool.submit(_phase_b_row, ctx.df, ctx.leaves,
                                row, cfg),
                    q_fut))
        for cid, tq_fut, b_fut, q_fut in dep_futs:
            if q_fut is None:
                t, b, q = tq_fut.result()
            else:
                t, b = tq_fut.result()
                q = q_fut.result()
            topk.update(t)
            botk.update(b)
            rows[cid].update(b_fut.result())
            str_q.update(q)

    # classify every leaf
    leaf_nodes: Dict[Tuple[str, ...], Node] = {}
    leaf_by_path: Dict[Tuple[str, ...], _Leaf] = {}
    length_stats: Dict[Tuple[str, ...], LengthStats] = {}
    for ctx in contexts:
        row = rows[ctx.id]
        for leaf in ctx.leaves:
            node = _classify_leaf(leaf, row, cfg, row["__rows__"])
            if leaf.key in topk and isinstance(node, (StrT, BoolT, IntT)):
                node = replace(node, stats=replace(
                    node.stats, sample=tuple(topk[leaf.key]),
                    bottom=tuple(botk.get(leaf.key, ()))))
            # lexicographic quartiles apply only when the leaf stayed a
            # plain string (reprs carry converted-domain stats instead)
            if (leaf.key in str_q and isinstance(node, StrT)
                    and node.stats.q1 is None):
                q1, q2, q3 = str_q[leaf.key]
                node = replace(node, stats=replace(
                    node.stats, q1=q1, q2=q2, q3=q3))
            leaf_nodes[leaf.path] = node
            leaf_by_path[leaf.path] = leaf
        for leaf in ctx.length_leaves:
            k = leaf.key
            length_stats[leaf.path] = LengthStats(
                card=row.get(f"{k}__card") or 0,
                min=row.get(f"{k}__min"), max=row.get(f"{k}__max"))

    # second pass: induce char patterns for fixed-width plain strings
    for ctx in contexts:
        fixed = {}
        for leaf in ctx.leaves:
            node = leaf_nodes.get(leaf.path)
            if (isinstance(node, StrT) and not isinstance(node, URLT)
                    and node.lengths.fixed and node.lengths.min
                    and 0 < node.lengths.min <= cfg.max_pattern_len):
                fixed[leaf.key] = leaf
        for key, positions in _collect_patterns(ctx, fixed, cfg).items():
            leaf = fixed[key]
            node = leaf_nodes[leaf.path]
            leaf_nodes[leaf.path] = replace(
                node, pattern=tuple(induce_pattern(positions)))

    # tuple induction: fixed-width short arrays -> positional tuples
    tuple_nodes = _induce_tuples(contexts, array_srcs, length_stats, cfg)

    # assemble the tree from the schema
    row0 = rows[0]

    def build(dtype: T.DataType, path: Tuple[str, ...],
              parent_card: int) -> Node:
        if isinstance(dtype, T.StructType):
            if path in table_structs:
                # wide homogeneous struct profiled via unpivot: its
                # key/value leaves live in the child context under
                # {k}/{v}, exactly like a MapType
                key = build(T.StringType(), path + ("{k}",), parent_card)
                val = build(table_structs[path], path + ("{v}",),
                            parent_card)
                return TableT(key=key, value=val,
                              lengths=length_stats.get(
                                  path, LengthStats()))
            fields = []
            for f in dtype.fields:
                child_path = path + (f.name,)
                child_card = _node_card(
                    leaf_nodes, length_stats, child_path)
                value = build(f.dataType, child_path, parent_card)
                fields.append(FieldT(
                    key=f.name, value=value, count=child_card,
                    optional=bool(child_card < parent_card)))
            rec = RecordT(fields=tuple(fields))
            return _maybe_table(rec, cfg)
        if isinstance(dtype, T.ArrayType):
            if path in tuple_nodes:
                return tuple_nodes[path]
            elem = build(dtype.elementType, path + ("[]",), parent_card)
            return ListT(element=elem,
                         lengths=length_stats.get(path, LengthStats()))
        if isinstance(dtype, T.MapType):
            key = build(dtype.keyType, path + ("{k}",), parent_card)
            val = build(dtype.valueType, path + ("{v}",), parent_card)
            return TableT(key=key, value=val,
                          lengths=length_stats.get(path, LengthStats()))
        return leaf_nodes.get(path, Empty())

    total = row0["__rows__"]
    # the root is just the schema struct at path () — build() handles
    # the record case (with _maybe_table), and the wide-homogeneous
    # case when the root itself took the unpivot path
    root = build(df.schema, (), total)
    return Profile(root=root, row_count=total, cfg=cfg)


def _node_card(leaf_nodes, length_stats, path) -> int:
    node = leaf_nodes.get(path)
    if node is not None and hasattr(node, "stats"):
        return node.stats.card
    ls = length_stats.get(path)
    if ls is not None:
        return ls.card
    # containers/structs: max of child cards
    cards = [
        _stats_card(n) for p, n in leaf_nodes.items()
        if p[:len(path)] == path
    ]
    return max(cards, default=0)


def _stats_card(node: Node) -> int:
    if hasattr(node, "stats"):
        return node.stats.card
    if isinstance(node, (StrReprT, NumReprT)):
        return _stats_card(node.inner)
    return 0


def _maybe_table(rec: RecordT, cfg: AnalyzerConfig) -> Node:
    """The record-vs-table duality: a record with more distinct keys
    than ``field_threshold`` whose field values merge compatibly
    collapses to a table keyed by the induced key type
    (reference: structa/analyzer.py:422-443, 599-613)."""
    if len(rec.fields) <= cfg.field_threshold:
        return rec
    merged: Node = Empty()
    for f in rec.fields:
        merged = merge(merged, f.value)
        if isinstance(merged, ValueAny):
            return rec       # incompatible values: keep the record
    key_node = classify_values([str(f.key) for f in rec.fields], cfg)
    return TableT(key=key_node, value=merged,
                  lengths=LengthStats(card=len(rec.fields),
                                      min=len(rec.fields),
                                      max=len(rec.fields)))


# ---------------------------------------------------------------------------
# driver-side mini classifier (for tiny key lists, e.g. struct field
# names during record->table collapse; mirrors the scalar ladder)
# ---------------------------------------------------------------------------

def classify_values(values: Sequence[str], cfg: AnalyzerConfig) -> Node:
    import re

    n = len(values)
    if n == 0:
        return Empty()
    budget = cfg.bad_threshold * n
    stats = Stats(card=n, distinct=len(set(values)),
                  min=min(values), max=max(values),
                  unique=len(set(values)) == n)

    def fails(rx):
        return sum(1 for v in values if not re.match(rx, v))

    if fails(r"^[-+]?[0-9]+$") <= budget:
        ints = [int(v) for v in values if re.match(r"^[-+]?[0-9]+$", v)]
        return StrReprT(
            inner=IntT(stats=Stats(card=n, min=min(ints), max=max(ints),
                                   distinct=len(set(ints)),
                                   unique=len(set(ints)) == len(ints))),
            pattern="d")
    if fails(r"^[-+]?(0[xX])?[0-9a-fA-F]+$") <= budget:
        return StrReprT(inner=IntT(stats=Stats(card=n)), pattern="x")
    if fails(r"^[-+]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][-+]?[0-9]+)?$") <= budget:
        return StrReprT(inner=FloatT(stats=Stats(card=n)), pattern="f")

    # datetime formats (the reference re-matches collapsed-table keys
    # with the full scalar ladder, analyzer.py:354-360) — driver-side
    # strptime over the tiny key list
    for disp, _java, rx, *_ in conversions._DT_FORMATS:
        n_bad, parsed = 0, []
        for v in values:
            try:
                parsed.append(_dt.datetime.strptime(v, disp))
            except ValueError:
                n_bad += 1
                if n_bad > budget:
                    break
        if parsed and n_bad <= budget:
            return StrReprT(
                inner=DateTimeT(stats=Stats(
                    card=n, distinct=len(set(parsed)),
                    min=min(parsed), max=max(parsed),
                    unique=len(set(parsed)) == len(parsed))),
                pattern=disp)

    lens = {len(v) for v in values}
    pattern = None
    if len(lens) == 1 and 0 < next(iter(lens)) <= cfg.max_pattern_len:
        width = next(iter(lens))
        pos_sets = [(i, {v[i] for v in values}) for i in range(width)]
        pattern = tuple(induce_pattern(pos_sets))
    return StrT(stats=stats,
                lengths=LengthStats(card=n, min=min(lens), max=max(lens)),
                pattern=pattern)


# ---------------------------------------------------------------------------
# merge pass (fixpoint) — reference analyzer.py:290-398, ui/cli.py:256-264
# ---------------------------------------------------------------------------

def merge_pass(node: Node, cfg: AnalyzerConfig) -> Node:
    """One merge sweep: collapse records whose field values are
    structurally similar containers into a single table entry."""
    if isinstance(node, RecordT):
        new_fields = tuple(
            replace(f, value=merge_pass(f.value, cfg)) for f in node.fields)
        rec = RecordT(fields=new_fields, lengths=node.lengths)
        return _collapse_similar(rec, cfg)
    if isinstance(node, TableT):
        return TableT(key=merge_pass(node.key, cfg),
                      value=merge_pass(node.value, cfg),
                      lengths=node.lengths)
    if isinstance(node, ListT):
        return ListT(element=merge_pass(node.element, cfg),
                     lengths=node.lengths)
    if isinstance(node, TupleT):
        return TupleT(fields=tuple(
            replace(f, value=merge_pass(f.value, cfg))
            for f in node.fields), lengths=node.lengths)
    if isinstance(node, (StrReprT, NumReprT)):
        return replace(node, inner=merge_pass(node.inner, cfg))
    return node


def _collapse_similar(rec: RecordT, cfg: AnalyzerConfig) -> Node:
    """If every field value of a record is a container and all are
    pairwise similar above ``merge_threshold``, collapse the record to
    a table (reference analyzer.py:310-374)."""
    if len(rec.fields) < 2:
        return rec
    vals = [f.value for f in rec.fields]
    if not all(isinstance(v, (RecordT, TableT, ListT, TupleT))
               for v in vals):
        return rec
    # only structurally equal containers collapse (reference
    # analyzer.py:345-353): mixed kinds — e.g. a PyPI doc's 'info'
    # record next to its version-keyed 'releases' table — stay a record
    if len({type(v) for v in vals}) > 1:
        return rec
    if all(isinstance(v, RecordT) for v in vals):
        for i in range(len(vals) - 1):
            if record_similarity(vals[i], vals[i + 1]) < cfg.merge_threshold:
                return rec
    merged: Node = Empty()
    for v in vals:
        merged = merge(merged, v)
        if isinstance(merged, ValueAny):
            return rec
    key_node = classify_values([str(f.key) for f in rec.fields], cfg)
    return TableT(key=key_node, value=merged,
                  lengths=LengthStats(card=len(rec.fields)))


def merge_to_fixpoint(node: Node, cfg: AnalyzerConfig,
                      max_iter: int = 20) -> Node:
    """Drive merge passes until the summary size stops shrinking
    (reference ui/cli.py:256-264)."""
    size = node.size
    for _ in range(max_iter):
        node = merge_pass(node, cfg)
        if node.size >= size:
            break
        size = node.size
    return node


def merge_profiles(a: Profile, b: Profile) -> Profile:
    """Merge two independently-computed profiles (multi-file analysis:
    ``unionByName`` semantics driver-side, reference types.py:674-679).

    At scale prefer analyzing the union DataFrame instead; this is the
    associative summary combine for pre-computed profiles. Numeric /
    datetime quartiles are resolved from the mergeable KLL sketches
    each shard profile carries (``Stats.qsketches``) through ONE tiny
    JVM job, so folded quartiles match the whole-dataset profile
    within the sketch's rank-error bound instead of the
    weighted-midpoint approximation ``Stats.__add__`` falls back to
    (the fallback remains when no SparkSession is active or a column
    carries no sketches — strings, exact mode)."""
    root = merge(a.root, b.root)
    root = _resolve_quantile_sketches(root)
    return Profile(root=root, row_count=a.row_count + b.row_count,
                   cfg=a.config)


def _resolve_quantile_sketches(root: Node) -> Node:
    """Replace midpoint-approximated quartiles with KLL-merged values
    for every Stats in the tree holding >= 2 pending sketches; the
    pending list collapses to the one merged sketch. All columns
    resolve in a single driver-data job (rows = columns, KB each)."""
    from pyspark.sql import SparkSession

    pending: List[Stats] = []

    def collect(node: Node) -> None:
        st = getattr(node, "stats", None)
        if isinstance(st, Stats) and len(st.qsketches) >= 2:
            pending.append(st)
        for f in dc_fields(node):
            v = getattr(node, f.name)
            if isinstance(v, Node):
                collect(v)
            elif isinstance(v, tuple):
                for x in v:
                    if isinstance(x, Node):
                        collect(x)

    collect(root)
    spark = SparkSession.getActiveSession()
    if not pending or spark is None:
        return root

    rows = [(i, [bytearray(s) for s in st.qsketches])
            for i, st in enumerate(pending)]
    qcols = [F.kll_sketch_get_quantile_double("msk", F.lit(p))
             .alias(f"q{j}") for j, p in enumerate((0.25, 0.5, 0.75))]
    got = {r.i: r for r in
           (spark.createDataFrame(rows, "i int, sks array<binary>")
            .select("i", F.explode("sks").alias("sk"))
            .groupBy("i")
            .agg(F.kll_merge_agg_double("sk").alias("msk"))
            .select("i", *qcols, "msk").collect())}
    resolved = {}
    for i, st in enumerate(pending):
        r = got.get(i)
        if r is None or r.msk is None:
            continue
        resolved[id(st)] = (replace(
            st, q1=r.q0, q2=r.q1, q3=r.q2,
            qsketches=(bytes(r.msk),)))

    def rebuild(node: Node) -> Node:
        changes = {}
        for f in dc_fields(node):
            v = getattr(node, f.name)
            if isinstance(v, Node):
                nv = rebuild(v)
                if nv is not v:
                    changes[f.name] = nv
            elif isinstance(v, tuple) and any(
                    isinstance(x, Node) for x in v):
                nv = tuple(rebuild(x) if isinstance(x, Node) else x
                           for x in v)
                if any(x is not y for x, y in zip(nv, v)):
                    changes[f.name] = nv
            elif isinstance(v, Stats) and id(v) in resolved:
                st = resolved[id(v)]
                if isinstance(node, DateTimeT):
                    # the sketch summarizes epoch seconds; surface
                    # datetimes like the single-shard classify path
                    st = replace(st, q1=_from_epoch(st.q1),
                                 q2=_from_epoch(st.q2),
                                 q3=_from_epoch(st.q3))
                changes[f.name] = st
        return replace(node, **changes) if changes else node

    return rebuild(root)
