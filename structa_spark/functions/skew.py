"""Skew-mitigation primitives.

AQE (``spark.sql.adaptive.skewJoin``) handles skewed *joins* at
runtime; skewed *aggregations* — one hot key receiving a large share
of the rows — still funnel that key's rows through a single reducer.
The classic fix is salting: split each key into ``n_salts`` subkeys,
aggregate partially per subkey, then combine the (tiny) partials.
Works for any algebraic aggregate (count/sum/min/max, and mergeable
sketches)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (final_agg, partial_agg) builders per supported aggregate kind
_COMBINE = {
    "count": (lambda c: F.sum(c), F.count),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: Sequence[Tuple[str, str, str]],
               n_salts: int = 16) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` is a list of (kind, column, alias) with kind in
    count/sum/min/max. Stage 1 groups by (keys..., salt) — the hot key
    spreads over ``n_salts`` reducers; stage 2 combines the partials
    (``n_salts`` rows per distinct key, negligible).

    Note Spark's hash aggregation already does map-side partial
    aggregation, which resolves most skew; salting matters when the
    per-key *state* is large (collect_list/distinct-style) or when
    partial aggregation is defeated (high distinct count per
    partition). Provided as the explicit primitive for those cases.
    """
    salt = (F.spark_partition_id() % F.lit(n_salts)).alias("__salt__")
    partials: List[Column] = []
    finals: List[Column] = []
    for kind, col, alias in aggs:
        final_fn, partial_fn = _COMBINE[kind]
        partials.append(partial_fn(col).alias(f"__p_{alias}__"))
        finals.append(final_fn(f"__p_{alias}__").alias(alias))
    stage1 = (df.withColumn("__salt__", salt)
              .groupBy(*keys, "__salt__").agg(*partials))
    return stage1.groupBy(*keys).agg(*finals)
