"""Profile-diff (schema drift) tests: yesterday-vs-today profiles
compared driver-side over the IR."""

from pyspark.sql import functions as F

from structa_spark import analyze
from structa_spark.diff import diff_profiles, render_diff


def test_no_drift_on_identical_profiles(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("v"))
    a, b = analyze(df, exact=True), analyze(df, exact=True)
    assert diff_profiles(a, b) == []
    assert render_diff(diff_profiles(a, b)) == "(no drift)"


def test_added_removed_and_type_change(spark):
    old = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 7).alias("count"),
        F.lit("x").alias("gone"))
    new = spark.range(100).select(
        F.col("id"),
        (F.col("id") / 7.0).alias("count"),     # int -> float
        F.lit(True).alias("fresh"))
    changes = diff_profiles(analyze(old, exact=True),
                            analyze(new, exact=True))
    kinds = {(".".join(c.path), c.kind) for c in changes}
    assert ("gone", "removed") in kinds
    assert ("fresh", "added") in kinds
    assert ("count", "type_changed") in kinds
    text = render_diff(changes)
    assert "- gone" in text and "+ fresh" in text


def test_range_drift_detected(spark):
    old = spark.range(100).select((F.col("id") % 10).alias("v"))
    new = spark.range(100).select((F.col("id") % 1000).alias("v"))
    changes = diff_profiles(analyze(old, exact=True),
                            analyze(new, exact=True))
    assert any(c.kind == "range_changed" and c.path == ("v",)
               for c in changes)


def test_optionality_drift(spark):
    from pyspark.sql import types as T
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    full = spark.createDataFrame(
        [(i, f"s{i}") for i in range(50)], schema)
    holey = spark.createDataFrame(
        [(i, f"s{i}" if i % 2 else None) for i in range(50)], schema)
    changes = diff_profiles(analyze(full, exact=True),
                            analyze(holey, exact=True))
    assert any(c.kind == "optionality_changed" and c.path == ("v",)
               for c in changes)


def test_saved_profile_roundtrip_diff(spark, tmp_path):
    # the operational loop: save yesterday, load, diff against today
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("v"))
    p = analyze(df, exact=True)
    p.save(str(tmp_path / "prof.json"))
    from structa_spark import Profile
    loaded = Profile.load(str(tmp_path / "prof.json"))
    assert diff_profiles(loaded, p) == []
