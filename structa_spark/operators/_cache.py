"""Shared one-deep persisted-relation cache registry.

Several library operators persist a shared relation (bigram tf,
Kneser-Ney tf, scrub tokens, DSIR feature counts, JSD ground truth,
the NB conditional model) but return LAZY plans, so the persisted
entry must outlive the call — SQL cache entries are held by Spark's
CacheManager until an explicit unpersist, and a weakref/finalizer
cannot bound the footprint. Each operator family owns ONE named
one-deep cell here; the NEXT call through any cell evicts that
cell's previous relation before persisting its own (see
:func:`evict_then_cache` for why eviction must precede persist).

Centralizing the cells makes the persist lifecycle visible and
testable: :func:`clear_caches` releases every cached relation at
once (long-lived sessions, test isolation), and
:func:`registered_cells` lists what is currently held.
"""

from __future__ import annotations

import threading
from typing import Dict, List

from pyspark.sql import DataFrame

# guards every evict-then-persist sequence over the registered
# cells: two threads sharing a SparkSession could otherwise
# interleave pop/unpersist/append, unpersisting a relation the other
# thread just cached (silent recompute) or leaking an entry past the
# one-deep bound
LOCK = threading.Lock()

_REGISTRY: Dict[str, List[DataFrame]] = {}


def register_cell(name: str) -> List[DataFrame]:
    """Create (or return) the named one-deep cell. Operator modules
    call this at import time; the returned list object IS the cell —
    holding at most one persisted relation."""
    return _REGISTRY.setdefault(name, [])


def registered_cells() -> Dict[str, int]:
    """Snapshot of the registry: cell name -> entries held (0/1)."""
    with LOCK:
        return {name: len(cell) for name, cell in _REGISTRY.items()}


def evict_then_cache(cache: List[DataFrame],
                     rel: DataFrame) -> DataFrame:
    """One-deep cache a relation in ``cache`` (a registered cell).
    Evict BEFORE persisting: when two calls build the identical
    logical plan they share one CacheManager entry, and
    persist-then-unpersist would remove the entry the new call just
    registered (leaving passes 2..N of a benchmark silently
    uncached). Unpersisting the previous relation is always safe — a
    still-live older plan just recomputes."""
    from pyspark import StorageLevel

    with LOCK:
        while cache:
            try:
                cache.pop().unpersist(False)
            except Exception:
                pass    # session of the old relation already stopped
        rel = rel.persist(StorageLevel.MEMORY_AND_DISK)
        cache.append(rel)
    return rel


def clear_caches() -> List[str]:
    """Release every cached relation across all registered cells and
    return the names of the cells that actually held one — the
    explicit lifecycle hook for long-lived sessions (and test
    isolation), so no operator family's persist can linger past an
    intentional reset."""
    cleared = []
    with LOCK:
        for name, cell in _REGISTRY.items():
            if cell:
                cleared.append(name)
            while cell:
                try:
                    cell.pop().unpersist(False)
                except Exception:
                    pass
    return cleared
