"""Wide-record regression guards.

Round-2 shipped a JVM OOM: profiling a ~40-field record compiled
several huge generated aggregate classes concurrently and exhausted
the heap, killing the shared SparkSession and cascading ~90 test
failures. These tests (a) profile wide shapes inside a SUBPROCESS
with its own small-heap session, so a JVM death is ONE failure here
and the shared session survives; (b) pin the bounded-plan property of
the unpivot path: a 1000-key document plans 2 contexts, not 1000.
"""

import json
import subprocess
import sys
import textwrap

from pyspark.sql import functions as F
from pyspark.sql import types as T

from structa_spark.analyzer import AnalyzerConfig, _plan
from structa_spark.model import RecordT, StrT, TableT


_REPO = __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)))

_PRELUDE = textwrap.dedent(f"""
    import sys
    sys.path.insert(0, {_REPO!r})
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.driver.memory", "2g")
             .config("spark.ui.enabled", "false")
             .appName("structa-wide-guard")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
""")


def _run_isolated(body: str, timeout: int = 420) -> str:
    """Run `body` in a fresh interpreter + fresh small-heap Spark
    session; returns stdout. A crash (OOM, dead JVM) fails only the
    calling test."""
    proc = subprocess.run(
        [sys.executable, "-c", _PRELUDE + textwrap.dedent(body)],
        capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"isolated wide-record profile died (rc={proc.returncode}):\n"
        f"{proc.stderr[-3000:]}")
    return proc.stdout


def test_wide_flat_record_profiles_in_bounded_heap():
    # 64 mixed-type fields: heterogeneous, so the per-field plan (NOT
    # the unpivot path) runs — this is the chunked-aggregation guard
    out = _run_isolated("""
        from structa_spark import analyze
        cols = []
        for i in range(64):
            if i % 3 == 0:
                cols.append((F.col("id") * i).alias(f"n{i}"))
            elif i % 3 == 1:
                cols.append((F.col("id") / (i + 1.0)).alias(f"f{i}"))
            else:
                cols.append(
                    F.concat(F.lit("v"), F.col("id") % 7).alias(f"s{i}"))
        df = spark.range(2000).select(*cols)
        p = analyze(df)
        assert p.row_count == 2000, p.row_count
        print("FIELDS", len(p.root.fields))
    """)
    assert "FIELDS 64" in out


def test_wide_nested_record_profiles_in_bounded_heap(tmp_path):
    # the USN shape: 40 fields, each a struct holding an array — the
    # exact shape that OOM'd round 2 (one explode context per array)
    doc = {
        f"{2000 + i:04d}-1": {
            "title": f"USN advisory {i}",
            "cves": [f"CVE-2020-{1000 + i + j}"
                     for j in range(1 + (i % 3))],
            "timestamp": 1577836800.0 + i * 86400,
        }
        for i in range(40)
    }
    f = tmp_path / "usn.json"
    f.write_text(json.dumps(doc))
    out = _run_isolated(f"""
        from structa_spark.ui.cli import get_config, get_structure
        out = get_structure(get_config([{str(f)!r}]), spark=spark)
        assert out.startswith("{{ str"), out[:80]
        print("OK")
    """)
    assert "OK" in out


def test_thousand_key_document_plans_two_contexts(spark):
    # the scale property: a ~USN-sized document (1000 advisory keys)
    # must plan ONE unpivot context + the root, not 1000 contexts
    df = spark.range(10).select(
        *[(F.col("id") + i).alias(f"key_{i:04d}") for i in range(1000)])
    cfg = AnalyzerConfig()
    contexts, _arrays, tables = _plan(df, cfg)
    assert len(contexts) == 2, len(contexts)
    assert () in tables
    # and per-context leaf width stays tiny (key + value)
    assert len(contexts[1].leaves) == 2


def test_thousand_key_document_profiles(spark):
    df = spark.range(10).select(
        *[(F.col("id") + i).alias(f"key_{i:04d}") for i in range(1000)])
    p = analyze_with(spark, df)
    assert isinstance(p.root, TableT)
    assert isinstance(p.root.key, StrT)
    # 10 rows x 1000 non-null entries
    assert p.root.lengths.min == 1000 and p.root.lengths.max == 1000


def analyze_with(spark, df, **kw):
    from structa_spark import analyze
    return analyze(df, **kw)


def test_unpivot_table_matches_per_field_collapse(spark):
    # 30-key homogeneous doc: the unpivot plan and the per-field plan
    # (unpivot_tables=False -> _maybe_table collapse at assembly) must
    # agree on the collapsed structure
    df = spark.range(200).select(
        *[(F.col("id") % (i + 2)).alias(f"m{i:02d}") for i in range(30)])
    from structa_spark import analyze
    fast = analyze(df, exact=True)
    slow = analyze(df, exact=True, unpivot_tables=False)
    assert isinstance(fast.root, TableT) and isinstance(slow.root, TableT)
    # same induced key representation and value kind
    assert type(fast.root.key) is type(slow.root.key)
    assert type(fast.root.value) is type(slow.root.value)
    assert fast.root.key.pattern == slow.root.key.pattern
    # combined value stats: same min/max domain either way
    assert fast.root.value.stats.min == slow.root.value.stats.min
    assert fast.root.value.stats.max == slow.root.value.stats.max


def test_absent_wide_struct_is_optional(spark):
    # a wide homogeneous struct present in only some rows must come
    # out optional with card = present-count — identical to the
    # per-field plan (round-3 review finding: the unpivot length
    # leaf counted NULL structs as length-0 rows)
    from pyspark.sql import functions as F
    from structa_spark import analyze
    from structa_spark.model import RecordT

    inner = T.StructType([
        T.StructField(f"k{i:02d}", T.LongType()) for i in range(25)])
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("adv", inner),
    ])
    rows = []
    for i in range(10):
        payload = tuple(range(25)) if i < 3 else None
        rows.append((i, payload))
    df = spark.createDataFrame(rows, schema)
    fast = analyze(df, exact=True)
    slow = analyze(df, exact=True, unpivot_tables=False)
    assert isinstance(fast.root, RecordT)
    f_adv = {f.key: f for f in fast.root.fields}["adv"]
    s_adv = {f.key: f for f in slow.root.fields}["adv"]
    assert f_adv.optional and s_adv.optional
    assert f_adv.count == s_adv.count == 3
