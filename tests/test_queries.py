"""Cross-engine parity harness: runs every registered query on Spark
AND its DuckDB oracle, then compares row count, column names, and an
order-insensitive value hash — the driver's correctness gate, locally.
"""

import hashlib
import math

import pandas as pd
import pytest

from tests.conftest import SF_CORRECT


def _canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            df[c] = col.round(9)
        elif pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]").astype(str)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def _pairs():
    from structa_spark.queries import REGISTRY
    return [(name, fn, sql) for name, (fn, sql) in REGISTRY.items()
            if sql is not None]


@pytest.mark.parametrize("name,fn,sql",
                         _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    sdf = fn(spark, SF_CORRECT).toPandas()
    ddf = duck.execute(sql).df()
    assert list(sorted(sdf.columns)) == list(sorted(ddf.columns)), \
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    assert len(sdf) == len(ddf), \
        f"{name}: row count {len(sdf)} vs {len(ddf)}"
    h1, h2 = _canon(sdf), _canon(ddf)
    if h1 != h2:
        merged = sdf.merge(ddf, how="outer", indicator=True,
                           on=None)
        diff = merged[merged["_merge"] != "both"]
        raise AssertionError(
            f"{name}: value hash mismatch\nspark:\n{sdf.head(10)}\n"
            f"duckdb:\n{ddf.head(10)}\ndiff sample:\n{diff.head(10)}")
