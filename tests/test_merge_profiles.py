"""Profile-merge at scale: the treeAggregate posture for 100 TB
multi-source profiling is 'profile shards independently, fold the
KB-sized summaries driver-side'. These tests pin that the fold is
order-invariant and that the folded profile matches the
whole-dataset profile on everything the merge defines exactly
(structure, cardinality, nulls, min/max); quartiles use the
documented weighted-midpoint approximation, so they are pinned for
order-invariance only."""

import pytest

from pyspark.sql import functions as F

from structa_spark import analyze
from structa_spark.analyzer import merge_profiles
from structa_spark.model import (
    FieldT, ListT, NumReprT, RecordT, StrReprT, TableT, TupleT,
)
from structa_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _walk(node, path=""):
    """(path, type, card, nulls, min, max) rows for exact compare."""
    st = getattr(node, "stats", None)
    yield (path, type(node).__name__,
           None if st is None else st.card,
           None if st is None else getattr(st, "nulls", None),
           None if st is None else str(st.min),
           None if st is None else str(st.max))
    if isinstance(node, (RecordT, TupleT)):
        for f in node.fields:
            yield from _walk(f.value, f"{path}.{f.key}")
    elif isinstance(node, ListT):
        yield from _walk(node.element, f"{path}[]")
    elif isinstance(node, TableT):
        yield from _walk(node.key, f"{path}{{k}}")
        yield from _walk(node.value, f"{path}{{v}}")
    elif isinstance(node, (StrReprT, NumReprT)):
        yield from _walk(node.inner, f"{path}<of>")


def _quartiles(node, path=""):
    st = getattr(node, "stats", None)
    if st is not None and getattr(st, "q2", None) is not None:
        try:
            yield path, float(st.q1), float(st.q2), float(st.q3)
        except (TypeError, ValueError):
            pass
    if isinstance(node, (RecordT, TupleT)):
        for f in node.fields:
            yield from _quartiles(f.value, f"{path}.{f.key}")
    elif isinstance(node, ListT):
        yield from _quartiles(node.element, f"{path}[]")
    elif isinstance(node, (StrReprT, NumReprT)):
        yield from _quartiles(node.inner, f"{path}<of>")


@pytest.fixture(scope="module")
def shard_profiles(spark):
    df = load_table(spark, SF, "lineitem")
    shards = [df.where(F.pmod(F.col("l_orderkey"), F.lit(3)) == i)
              for i in range(3)]
    return [analyze(s, exact=True) for s in shards], analyze(
        df, exact=True)


def test_merge_profiles_fold_is_order_invariant(shard_profiles):
    (p0, p1, p2), _whole = shard_profiles[0], shard_profiles[1]
    left = merge_profiles(merge_profiles(p0, p1), p2)
    right = merge_profiles(p0, merge_profiles(p1, p2))
    rev = merge_profiles(merge_profiles(p2, p1), p0)
    assert left.row_count == right.row_count == rev.row_count
    base = list(_walk(left.root))
    assert base == list(_walk(right.root))
    assert base == list(_walk(rev.root))
    # float quartiles associate up to rounding (weighted means group
    # differently); pin them to within a few ulps
    import math
    ql, qr, qv = ({p: qs for p, *qs in _quartiles(prof.root)}
                  for prof in (left, right, rev))
    assert set(ql) == set(qr) == set(qv)
    for p in ql:
        for a, b, c in zip(ql[p], qr[p], qv[p]):
            assert math.isclose(a, b, rel_tol=1e-12), (p, a, b)
            assert math.isclose(a, c, rel_tol=1e-12), (p, a, c)


def test_merged_shards_match_whole_dataset_profile(shard_profiles):
    (p0, p1, p2), whole = shard_profiles[0], shard_profiles[1]
    folded = merge_profiles(merge_profiles(p0, p1), p2)
    assert folded.row_count == whole.row_count
    # structure, cardinality, null counts and min/max merge EXACTLY —
    # the multi-source profile is indistinguishable from profiling
    # the union on everything the merge defines exactly
    assert sorted(_walk(folded.root)) == sorted(_walk(whole.root))
