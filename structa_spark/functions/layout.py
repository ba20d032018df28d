"""Data-layout keys: multi-dimensional interleaving for write-time
clustering.

At 100 TB the scan you avoid is the cheapest scan: sorting a table by
a Z-ORDER (Morton) key before writing parquet co-locates rows that
are close in EVERY keyed dimension, so min/max row-group statistics
prune multi-predicate queries (`user BETWEEN .. AND ts BETWEEN ..`)
that a single-column sort can only prune on its leading key — the
layout behind Delta/Iceberg ``OPTIMIZE ZORDER BY``. The key here is a
pure column expression (plan-literal shift/mask chain, whole-stage
codegen), so ``df.repartitionByRange(k).sortWithinPartitions(k)``
composes with any writer.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton (Z-order) interleaving of already-quantized dimension
    columns: bit ``b`` of dimension ``i`` lands at interleaved
    position ``b * n_dims + i``, so the key's prefix refines all
    dimensions together. Inputs must be non-negative integers below
    ``2**bits`` (quantize first — :func:`quantize_minmax`); with
    ``n_dims * bits <= 63`` the key fits a BIGINT. The whole key is
    a fixed shift/or chain folded by codegen — no UDF, no shuffle;
    the one shuffle in a layout job is the range repartition that
    SORTS by this key."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a BIGINT")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b) % 2
            key = key + F.shiftleft(bit, b * n + i)
    return key


def quantize_minmax(col: Column, lo: Column, hi: Column,
                    bits: int = 16) -> Column:
    """Quantize a numeric column into ``[0, 2**bits)`` against
    broadcast min/max bounds — integer arithmetic end to end
    (``(v - lo) * (2**bits - 1) / (hi - lo)`` in BIGINT, exact in
    any engine), the front half of a Z-order key. A degenerate
    dimension (``hi == lo``) quantizes to 0."""
    span = (hi - lo).cast("long")
    scaled = ((col.cast("long") - lo.cast("long"))
              * F.lit((1 << bits) - 1))
    # exact integer floor-division in any engine: subtract the
    # remainder first so the one double division is of an exact
    # multiple (a near-integer rounded quotient can otherwise floor
    # to the wrong side)
    exact = (scaled - scaled % span) / span
    return (F.when(span > 0, exact.cast("long"))
            .otherwise(F.lit(0).cast("long")))
