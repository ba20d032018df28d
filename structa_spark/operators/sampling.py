"""Deterministic sampling / quota operators for training-data
pipelines.

A 100 TB corpus is never trained on whole: it is sampled, balanced
across languages/sources, and re-sampled on every pipeline iteration.
``df.sample`` is seed-dependent on partitioning (a repartition or a
file-split change reshuffles which rows are picked), which makes
pipeline runs unreproducible. Everything here keys the decision on a
HASH OF THE ROW KEY instead: the same document is selected by every
run, on every engine, at every partitioning — and the selection is
expressible in ANSI SQL, so each operator carries an exact oracle.

All hot-path expressions are built-in functions (JVM-side, codegen);
the only shuffle is the window in :func:`cap_per_group`.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

#: hash-space modulus for sampling decisions; 1e6 gives ~0.0001%
#: fraction granularity while staying far from int64 overflow
SAMPLE_MOD = 1_000_000


def sample_key(key: Column, salt: str = "") -> Column:
    """Deterministic per-row draw in [0, SAMPLE_MOD): the md5-derived
    int64 of (key || salt) reduced mod SAMPLE_MOD. Changing the salt
    produces an independent re-draw — distinct pipeline stages (e.g.
    train/holdout splits) use distinct salts."""
    return md5_long(F.concat(key.cast("string"), F.lit(salt))) \
        % F.lit(SAMPLE_MOD)


def deterministic_sample(df: DataFrame, fraction: float,
                         key_col: str, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible
    across runs, engines and partitionings (unlike ``df.sample``).
    Scale shape: a scan-local filter, no shuffle, pushed after the
    columnar read."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction out of range: {fraction}")
    thr = int(round(fraction * SAMPLE_MOD))
    return df.where(sample_key(F.col(key_col), salt) < F.lit(thr))


def stratified_sample(df: DataFrame, fractions: Dict[str, float],
                      group_col: str, key_col: str,
                      default_fraction: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Per-group deterministic sampling (language/source balancing):
    group g keeps ~``fractions[g]`` of its rows; unlisted groups keep
    ``default_fraction``. Same scan-local no-shuffle shape — the
    per-group threshold is a CASE expression, not a join."""
    thr: Column = F.lit(int(round(default_fraction * SAMPLE_MOD)))
    for g, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction out of range for {g!r}: {frac}")
        thr = F.when(F.col(group_col) == g,
                     F.lit(int(round(frac * SAMPLE_MOD)))).otherwise(thr)
    return df.where(sample_key(F.col(key_col), salt) < thr)


def cap_per_group(df: DataFrame, group_col: str, n: int,
                  key_col: str, order_col: Optional[str] = None,
                  salt: str = "") -> DataFrame:
    """At most ``n`` rows per group, deterministically chosen: rows
    rank within their group by (order_col or key hash, key) and ranks
    above ``n`` drop. The hash order makes the quota a uniform
    subsample of the group rather than a prefix of some storage
    order. ONE shuffle (the window partition); at 100 TB a skewed
    group serializes into one task's sort, which is exactly the
    degenerate case the hash order keeps bounded: the sort is
    O(group), not O(corpus)."""
    from pyspark.sql.window import Window

    order = (F.col(order_col) if order_col
             else sample_key(F.col(key_col), salt))
    w = Window.partitionBy(group_col).orderBy(order, F.col(key_col))
    return (df.withColumn("__rn__", F.row_number().over(w))
            .where(F.col("__rn__") <= n)
            .drop("__rn__"))


def resample_to_mix(df: DataFrame, rates: DataFrame,
                    group_col: str = "source",
                    key_col: str = "doc_id",
                    salt: str = "mix") -> DataFrame:
    """Realize per-group sampling rates (e.g. from
    ``text.mixing_weights`` — temperature-scaled mixture balancing)
    by deterministic replication: every row emits ``floor(rate)``
    copies plus one more when its md5 draw falls under the
    fractional remainder; ``rate < 1`` therefore downsamples (0 or 1
    copies). Output rows carry ``copy_idx`` so downstream packing /
    shuffling can distinguish replicas.

    The draw is the same md5 key-hash as ``deterministic_sample``,
    so the realized mix is invariant under repartitioning, reruns
    and engines — resampling twice with the same salt yields the
    byte-identical corpus (change the salt for an independent
    epoch).

    Scale shape: ``rates`` is #groups rows — broadcast; the explode
    multiplies rows by ~E[rate] with no shuffle; everything
    pipelines into the scan.
    """
    # left join + explicit error: an inner join would silently DROP
    # every row whose group is absent from `rates` (or null) — a
    # stale rates table must fail the job, not shrink the corpus
    joined = (df.join(
        F.broadcast(rates.select(group_col, "sample_rate")),
        group_col, "left")
        .withColumn(
            "sample_rate",
            F.when(F.col("sample_rate").isNotNull(),
                   F.col("sample_rate"))
            .otherwise(F.raise_error(F.concat(
                F.lit("resample_to_mix: no sample_rate for group "),
                F.col(group_col).cast("string"))))))
    n_full = F.floor("sample_rate").cast("int")
    frac = F.col("sample_rate") - F.floor("sample_rate")
    u = sample_key(F.col(key_col), salt) / F.lit(float(SAMPLE_MOD))
    copies = (n_full + F.when(u < frac, 1).otherwise(0)).cast("int")
    seq = F.when(copies >= 1,
                 F.sequence(F.lit(0), copies - 1)) \
        .otherwise(F.array().cast("array<int>"))
    return (joined.withColumn("copy_idx", F.explode(seq))
            .drop("sample_rate"))


def split_corpus(df: DataFrame, weights=(0.9, 0.05, 0.05),
                 labels=("train", "val", "test"),
                 key_col: str = "doc_id",
                 salt: str = "split",
                 out_col: str = "split") -> DataFrame:
    """Deterministic disjoint train/val/test split: each row's md5
    draw lands in exactly one cumulative-weight band, so the split
    is exhaustive, non-overlapping, and invariant under
    repartitioning, reruns and engines — the property that keeps a
    training set stable across pipeline re-executions and prevents
    leakage when the corpus is re-split after incremental updates
    (a given document NEVER migrates between splits unless the salt
    changes).

    Scale shape: a scan-local CASE expression on the hash — no
    shuffle, no state; stratification comes free because the draw is
    independent of any grouping column."""
    if len(weights) != len(labels):
        raise ValueError("weights and labels must align")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = sample_key(F.col(key_col), salt)
    cum = 0.0
    expr = None
    for w, lab in zip(weights[:-1], labels[:-1]):
        cum += w / total
        thr = int(round(cum * SAMPLE_MOD))
        cond = u < F.lit(thr)
        expr = (F.when(cond, F.lit(lab)) if expr is None
                else expr.when(cond, F.lit(lab)))
    expr = (expr.otherwise(F.lit(labels[-1])) if expr is not None
            else F.lit(labels[-1]))
    return df.withColumn(out_col, expr)


def curriculum_shards(df: DataFrame, n_shards: int = 4,
                      score_col: str = "n_chars",
                      approx: bool = False,
                      accuracy: int = 10000) -> DataFrame:
    """Curriculum sharding: assign every row to one of ``n_shards``
    ordered difficulty buckets by score quantiles (shard 0 = lowest
    scores) — the classic short-to-long / easy-to-hard training-order
    stage, realized as a deterministic column.

    Scale shape: ONE percentile aggregation hands the driver n-1
    cutoff scalars; assignment is then a literal comparison per row —
    no global sort and no single-partition ``ntile`` window (the
    quadratic-ish oracle shape this operator deliberately avoids).
    Rows exactly at a cutoff go to the lower shard (strict ``>``), so
    the split is reproducible across engines computing the same
    interpolated quantiles.

    The default EXACT percentile buffers O(distinct scores) in the
    aggregation — fine for length-like integer scores and required
    for the bit-exact DuckDB oracle replay. For a high-cardinality
    float score at 100 TB pass ``approx=True``: a bounded-memory
    ``percentile_approx`` (Greenwald-Khanna) sketch whose rank error
    is ≤ 1/``accuracy`` of the row count, trading cutoff exactness
    for O(accuracy·log n) state per partial.
    """
    if n_shards < 2:
        raise ValueError(f"n_shards must be >= 2: {n_shards}")
    ps = [i / n_shards for i in range(1, n_shards)]
    if approx:
        agg = F.percentile_approx(F.col(score_col), F.lit(ps),
                                  F.lit(accuracy))
    else:
        agg = F.percentile(F.col(score_col), F.lit(ps))
    cuts = df.agg(agg.alias("c")).collect()[0].c
    if cuts is None:
        # no rows, or every score null: there is nothing to rank —
        # everything (if anything) sits in the first shard
        return df.withColumn("shard", F.lit(0).cast("int"))
    shard = None
    for c in cuts:
        step = F.when(F.col(score_col) > F.lit(float(c)), 1) \
            .otherwise(0)
        shard = step if shard is None else shard + step
    return df.withColumn("shard", shard.cast("int"))
