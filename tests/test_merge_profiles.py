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


def test_folded_quartiles_match_whole_within_sketch_bound(spark):
    # RANGE-partitioned shards are the adversarial case for the
    # weighted-midpoint fallback (each shard sees a disjoint value
    # band, so averaging shard quartiles lands far from the truth);
    # the KLL sketches carried in approx mode must resolve the folded
    # quartiles to within the sketch's rank-error bound (~1.65% of n
    # at k=200) of the true quantile ranks.
    import numpy as np
    rng = np.random.RandomState(11)
    n = 30_000
    vals = np.sort(np.exp(rng.normal(0.0, 1.5, size=n)))
    cut = 24_000                      # 80/20 split by VALUE RANGE
    mk = lambda a: spark.createDataFrame(
        [(float(v),) for v in a], "x double")
    pa, pb = analyze(mk(vals[:cut])), analyze(mk(vals[cut:]))
    folded = merge_profiles(pa, pb)
    leaf = folded.root.fields[0].value      # RecordT -> x column
    st = leaf.stats
    assert len(st.qsketches) == 1     # pending list collapsed
    tol = int(0.0165 * n) + 200
    for q, p in ((st.q1, 0.25), (st.q2, 0.5), (st.q3, 0.75)):
        rank = int(np.searchsorted(vals, q))
        assert abs(rank - p * n) <= tol, (p, rank, q)
    # the midpoint fallback (sketches stripped) really is far off
    # for the median here — this pins that the sketch path is doing
    # the work, not that the fallback happened to be good enough
    from dataclasses import replace as dc_replace
    bare = dc_replace(pa.root.fields[0].value.stats, qsketches=()) \
        + dc_replace(pb.root.fields[0].value.stats, qsketches=())
    assert abs(int(np.searchsorted(vals, bare.q2)) - 0.5 * n) > 3 * tol


def test_folded_profiles_roundtrip_and_datetime_quartiles(spark, tmp_path):
    from structa_spark.serialize import load_profile, save_profile
    df = load_table(spark, SF, "lineitem")
    a = analyze(df.where("l_orderkey % 2 = 0"))
    b = analyze(df.where("l_orderkey % 2 = 1"))
    # sketches survive JSON persistence (the profile-store path)
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    save_profile(a, str(pa)), save_profile(b, str(pb))
    folded = merge_profiles(load_profile(str(pa)), load_profile(str(pb)))
    whole = analyze(df)
    import datetime
    got = {p: qs for p, *qs in _quartiles(folded.root)}
    want = {p: qs for p, *qs in _quartiles(whole.root)}
    assert set(got) == set(want)
    for p in got:
        for g, w in zip(got[p], want[p]):
            # both sides are sketch/approx estimates of the same
            # quantile; at sf0.001 row counts the rank bound converts
            # to a loose relative value tolerance, plus one value
            # step for low-cardinality integer columns (l_suppkey has
            # 10 distinct values — adjacent-rank estimates differ by
            # a whole step)
            assert abs(g - w) <= max(0.1 * (abs(w) + 1), 1.001), \
                (p, g, w)
    # datetime quartiles come back as datetimes inside [min, max]
    def find_dt(node):
        if isinstance(node, type(None)):
            return None
        st = getattr(node, "stats", None)
        if (st is not None and isinstance(st.q2, datetime.datetime)):
            return st
        for attr in ("fields", "element", "inner", "key", "value"):
            v = getattr(node, attr, None)
            for child in (v if isinstance(v, tuple) else (v,)):
                got = find_dt(child) if child is not None else None
                if got is not None:
                    return got
        return None
    st = find_dt(folded.root)
    assert st is not None and st.min <= st.q2 <= st.max


def test_sketch_fold_is_order_robust(spark):
    # approx-mode folds in different orders must agree on quartiles
    # within the sketch rank bound (KLL merges are not bit-identical
    # across orders; ranks are what the sketch guarantees)
    import numpy as np
    rng = np.random.RandomState(3)
    n = 12_000
    vals = np.sort(rng.gamma(2.0, 10.0, size=n))
    thirds = [vals[:4000], vals[4000:8000], vals[8000:]]
    mk = lambda a: spark.createDataFrame(
        [(float(v),) for v in a], "x double")
    p = [analyze(mk(t)) for t in thirds]
    a = merge_profiles(merge_profiles(p[0], p[1]), p[2])
    b = merge_profiles(p[2], merge_profiles(p[1], p[0]))
    tol = int(0.0165 * n) + 200
    for prof in (a, b):
        st = prof.root.fields[0].value.stats
        for q, frac in ((st.q1, 0.25), (st.q2, 0.5), (st.q3, 0.75)):
            rank = int(np.searchsorted(vals, q))
            assert abs(rank - frac * n) <= tol, (frac, rank)
