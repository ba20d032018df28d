"""Column statistics carried by every inferred-type node.

Mirrors the reference's ``Stats`` (reference: structa/types.py:30-231):
cardinality, min / q1 / median / q3 / max, uniqueness, and a top-k /
bottom-k frequency sample — but built from Spark aggregation rows
(one wide ``agg`` per level) instead of a driver-side sorted multiset,
so the engine never materializes column data on the driver.

Quartiles are ``percentile_approx`` by default (mergeable GK sketch —
the 100 TB path) and exact ``percentile`` in ``exact=True`` mode (the
oracle-correctness path).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple


@dataclass(frozen=True)
class Stats:
    """Summary statistics of one extracted column."""

    card: int                      # number of (non-null) occurrences
    distinct: Optional[int] = None  # distinct values (approx unless exact mode)
    min: Any = None
    q1: Any = None
    q2: Any = None
    q3: Any = None
    max: Any = None
    unique: bool = False           # every value occurs exactly once
    # [(value, count), ...] most-frequent-first; tiny display sample
    sample: Tuple = ()
    # [(value, count), ...] the LEAST-frequent tail in most-common
    # order (the reference displays top-3 ... bottom-3 of the sample,
    # types.py:142-163)
    bottom: Tuple = ()
    # serialized DataSketches KLL-doubles sketches covering this
    # column (numeric/datetime-as-epoch). One entry straight from the
    # aggregation; ``__add__`` CONCATENATES (pure Python cannot merge
    # the binary form) and ``analyzer.merge_profiles`` resolves the
    # pending list through one JVM job (kll_merge_agg_double),
    # replacing the weighted-midpoint quartile approximation with
    # sketch-accurate values and collapsing the list back to one
    # sketch so repeated folds stay O(1) per column.
    qsketches: Tuple = ()

    @classmethod
    def empty(cls) -> "Stats":
        return cls(card=0)

    @property
    def median(self):
        return self.q2

    def __add__(self, other: "Stats") -> "Stats":
        """Merge two summaries (associative, driver-side, O(k)).

        min/max combine exactly; quartiles take the weighted midpoint
        approximation (the scale-out path re-aggregates or merges
        sketches instead — see analyzer.merge_profiles); samples merge
        by summed counts.
        """
        if not isinstance(other, Stats):
            return NotImplemented
        if self.card == 0:
            return other
        if other.card == 0:
            return self

        def _min(a, b):
            if a is None:
                return b
            if b is None:
                return a
            try:
                return a if a <= b else b
            except TypeError:
                return a

        def _max(a, b):
            if a is None:
                return b
            if b is None:
                return a
            try:
                return a if a >= b else b
            except TypeError:
                return a

        def _mid(a, b):
            if a is None:
                return b
            if b is None:
                return a
            try:
                return (
                    a + (b - a) * (other.card / (self.card + other.card))
                )
            except TypeError:
                return _min(a, b)

        merged = {}
        for v, c in tuple(self.sample) + tuple(other.sample):
            merged[v] = merged.get(v, 0) + c
        sample = tuple(
            sorted(merged.items(), key=lambda kv: (-kv[1], str(kv[0])))
        )
        merged_b = {}
        for v, c in tuple(self.bottom) + tuple(other.bottom):
            merged_b[v] = merged_b.get(v, 0) + c
        bottom = tuple(
            sorted(merged_b.items(), key=lambda kv: (-kv[1], str(kv[0])))
        )
        distinct = None
        if self.distinct is not None and other.distinct is not None:
            # upper bound; true merge uses HLL sketches at scale
            distinct = min(self.distinct + other.distinct,
                           self.card + other.card)
        return Stats(
            card=self.card + other.card,
            distinct=distinct,
            min=_min(self.min, other.min),
            q1=_mid(self.q1, other.q1),
            q2=_mid(self.q2, other.q2),
            q3=_mid(self.q3, other.q3),
            max=_max(self.max, other.max),
            unique=self.unique and other.unique and not (
                set(dict(self.sample)) & set(dict(other.sample))
            ),
            sample=sample,
            bottom=bottom,
            # both sides are non-empty here (empty sides returned
            # early above). If EITHER carries no sketch (exact-mode
            # profile, string column), the merged sketches would
            # cover only part of the merged data — resolving
            # quartiles from them would silently misrepresent the
            # sketchless shard, so drop them and let the documented
            # midpoint fallback stay authoritative.
            qsketches=(tuple(self.qsketches) + tuple(other.qsketches)
                       if self.qsketches and other.qsketches else ()),
        )

    def range_str(self, str_limit=None) -> str:
        if self.min is None and self.max is None:
            return ""
        if self.min == self.max:
            return f"value={_fmt(self.min, str_limit)}"
        return (f"range={_fmt(self.min, str_limit)}"
                f"..{_fmt(self.max, str_limit)}")

    def quartile_graph(self) -> str:
        """The reference's 10-character positional chart (reference:
        structa/types.py:106-140): '.' fill, digits 1/2/3 mark where
        q1/q2/q3 sit between min and max (later digits overwrite
        earlier on collision). Empty for non-subtractable types
        (strings) or zero range."""
        if self.q1 is None or self.min is None or self.max is None:
            return ""
        try:
            delta = self.max - self.min
        except TypeError:
            return ""
        if not delta:
            return ""
        chars = ["."] * 10
        for n, q in enumerate((self.q1, self.q2, self.q3), start=1):
            chars[int(9 * ((q - self.min) / delta))] = str(n)
        return "".join(chars)


def _fmt(v, str_limit=None) -> str:
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    s = str(v)
    limit = str_limit if str_limit is not None else 30
    if len(s) > limit:
        s = s[:max(limit - 3, 1)] + "..."
    return s


@dataclass
class LengthStats:
    """Stats over ``length(col)`` / ``size(col)`` for strings and
    containers (reference: structa/types.py:209-224)."""

    card: int = 0
    min: Optional[int] = None
    max: Optional[int] = None
    q2: Optional[float] = None

    @property
    def fixed(self) -> bool:
        return self.min is not None and self.min == self.max
