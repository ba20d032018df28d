"""CLI surface tests: typed parsers + smoke runs over temp files
(mirrors the reference's test strategy, tests/test_cli.py there)."""

import datetime as dt
import json

import pytest

from structa_spark.ui import params
from structa_spark.ui.cli import get_config, get_structure


# -- typed parsers ----------------------------------------------------------

def test_num():
    assert params.num("50%") == 0.5
    assert params.num("2%") == pytest.approx(0.02)
    assert params.num("0.25") == 0.25
    assert params.num("1/4") == 0.25


def test_size():
    assert params.size("1m") == 1 << 20
    assert params.size("8k") == 8 << 10
    assert params.size("2g") == 2 << 30
    assert params.size("4096") == 4096


def test_parse_duration():
    assert params.parse_duration("5 minutes, 30 seconds") == \
        dt.timedelta(minutes=5, seconds=30)
    assert params.parse_duration("2 days") == dt.timedelta(days=2)
    assert params.parse_duration("1h") == dt.timedelta(hours=1)
    with pytest.raises(ValueError):
        params.parse_duration("not a duration")


def test_parse_duration_or_timestamp():
    now = dt.datetime(2026, 1, 1)
    assert params.parse_duration_or_timestamp("1 day", now=now) == \
        dt.datetime(2025, 12, 31)
    assert params.parse_duration_or_timestamp(
        "2020-06-01 12:00:00", now=now) == dt.datetime(2020, 6, 1, 12)


def test_parse_epoch():
    assert params.parse_epoch("unix") == ("unix", 1.0, None)
    assert params.parse_epoch("excel") == ("excel", 86400.0, None)
    name, scale, base = params.parse_epoch("days since 2000-01-01")
    assert name == "custom"
    assert scale == 86400
    assert base == dt.datetime(2000, 1, 1)
    with pytest.raises(ValueError):
        params.parse_epoch("fortnights hence")


def test_get_config_defaults():
    cfg = get_config(["data.json"])
    assert cfg.bad_threshold == pytest.approx(0.01)
    assert cfg.field_threshold == 20
    assert cfg.merge_threshold == 0.5
    assert cfg.sample_bytes == 1 << 20
    assert cfg.timestamps == ("unix", 1.0, None)


# -- end-to-end smoke over temp files --------------------------------------

def test_cli_ndjson(spark, tmp_path):
    f = tmp_path / "rows.json"
    with f.open("w") as fh:
        for i in range(50):
            fh.write(json.dumps({"id": i, "name": f"user{i:03d}"}) + "\n")
    out = get_structure(get_config([str(f)]), spark=spark)
    assert "'id': int range=0..49" in out
    assert "'name'" in out


def test_cli_str_ints(spark, tmp_path):
    # the reference tutorial's str-nums case: JSON array of int strings
    f = tmp_path / "nums.json"
    f.write_text(json.dumps([str(i) for i in range(100)]))
    out = get_structure(get_config([str(f)]), spark=spark)
    assert "str of int range=0..99" in out


def test_cli_csv(spark, tmp_path):
    f = tmp_path / "data.csv"
    lines = ["name;qty"] + [f"item{i:02d};{i * 10}" for i in range(30)]
    f.write_text("\n".join(lines))
    out = get_structure(get_config([str(f)]), spark=spark)
    assert "'qty': int range=0..290" in out


def test_cli_multi_file_union(spark, tmp_path):
    f1, f2 = tmp_path / "a.json", tmp_path / "b.json"
    with f1.open("w") as fh:
        for i in range(20):
            fh.write(json.dumps({"id": i}) + "\n")
    with f2.open("w") as fh:
        for i in range(20, 40):
            fh.write(json.dumps({"id": i, "extra": True}) + "\n")
    out = get_structure(get_config([str(f1), str(f2)]), spark=spark)
    assert "'id': int range=0..39" in out
    assert "extra" in out


def test_cli_json_output(spark, tmp_path):
    import json as _json
    f = tmp_path / "j.json"
    with f.open("w") as fh:
        for i in range(30):
            fh.write(_json.dumps({"id": i}) + "\n")
    out = get_structure(get_config(["--json", str(f)]), spark=spark)
    tree = _json.loads(out)
    assert tree["fields"][0]["key"] == "id"
    assert tree["fields"][0]["value"]["type"] == "int"


def test_cli_display_toggles(spark, tmp_path):
    f = tmp_path / "t.json"
    with f.open("w") as fh:
        for i in range(30):
            fh.write(json.dumps({"w": f"word{i % 3}"}) + "\n")
    out = get_structure(get_config(
        ["--show-count", "--show-lengths", "--show-samples", str(f)]),
        spark=spark)
    assert "'w' x30:" in out
    assert "len=5" in out
    assert "sample=word0, word1, word2" in out


def test_cli_graph_and_topbottom_samples(spark, tmp_path):
    # >6 distinct values -> sample shows top-3 .. bottom-3 (reference
    # types.py:142-163); --show-graph adds the 10-char quartile chart
    f = tmp_path / "g.json"
    with f.open("w") as fh:
        for i in range(100):
            fh.write(json.dumps({
                "n": i,
                # zipf-ish: w0 dominates, w7/w8/w9 are rare
                "w": f"w{min(i % 25, 9)}",
            }) + "\n")
    out = get_structure(get_config(
        ["--show-samples", "--show-graph", "--exact", str(f)]),
        spark=spark)
    # uniform ints 0..99: exact q1/q2/q3 = 24.75/49.5/74.25 ->
    # graph positions int(9*q/99) = 2/4/6
    assert "graph=..1.2.3..." in out
    assert " .. " in out                  # top .. bottom separator
    assert "w9" in out                    # a least-frequent value shown


def test_cli_low_confidence_encoding_warns(spark, tmp_path):
    from structa_spark.sources.detect import ValidationWarning
    f = tmp_path / "l1.csv"
    f.write_bytes("name,city\nrené,genève\nzoë,zürich\n"
                  .encode("latin-1"))
    with pytest.warns(ValidationWarning, match="Low confidence"):
        out = get_structure(get_config([str(f)]), spark=spark)
    assert "'name'" in out


def test_cli_csv_format_override(spark, tmp_path):
    f = tmp_path / "p.csv"
    f.write_text("a|b\n1|x\n2|y\n3|z\n")
    out = get_structure(get_config(["--csv-format", "|", str(f)]),
                        spark=spark)
    assert "'a': int range=1..3" in out


def test_cli_color_styling(spark, tmp_path):
    # --color always wraps type names in cyan, suffixes in green,
    # patterns in yellow (the reference's XSLT styling, reference
    # ui/cli.py:271-278); --color never (and auto off-tty) emits no
    # escapes at all
    f = tmp_path / "c.json"
    with f.open("w") as fh:
        for i in range(30):
            fh.write(json.dumps({"id": i, "code": f"{i % 5:03d}"}) + "\n")
    plain = get_structure(get_config(["--color", "never", str(f)]),
                          spark=spark)
    assert "\x1b[" not in plain
    styled = get_structure(get_config(["--color", "always", str(f)]),
                           spark=spark)
    assert "\x1b[36mint\x1b[0m" in styled          # cyan type name
    assert "\x1b[32m" in styled                    # green suffix
    assert "\x1b[33m" in styled                    # yellow pattern
    # stripping the escapes reproduces the plain render exactly
    import re
    assert re.sub(r"\x1b\[[0-9;]*m", "", styled) == plain
    # auto without a tty stays plain
    auto = get_structure(get_config(["--color", "auto", str(f)]),
                         spark=spark)
    assert "\x1b[" not in auto


def test_cli_save_and_diff_profile(spark, tmp_path):
    import json as _json
    day1 = tmp_path / "day1.json"
    with day1.open("w") as fh:
        for i in range(60):
            fh.write(_json.dumps({"id": i, "score": i * 0.5}) + "\n")
    prof = tmp_path / "day1.profile.json"
    out = get_structure(get_config(
        [str(day1), "--save-profile", str(prof)]), spark=spark)
    assert "'id': int range=0..59" in out     # summary still printed
    assert prof.exists()
    # same data diffed against itself: no drift
    same = get_structure(get_config(
        [str(day1), "--diff", str(prof)]), spark=spark)
    assert same == "(no drift)"
    # day 2 drifts: wider range + a new field
    day2 = tmp_path / "day2.json"
    with day2.open("w") as fh:
        for i in range(60):
            fh.write(_json.dumps(
                {"id": i + 100, "score": i * 0.5, "lang": "en"}) + "\n")
    drift = get_structure(get_config(
        [str(day2), "--diff", str(prof)]), spark=spark)
    assert "lang" in drift and drift != "(no drift)"


def test_cli_rolling_baseline_same_path(spark, tmp_path):
    # the rolling-baseline one-liner: --save-profile and --diff with
    # the SAME path must diff against YESTERDAY's file, then update
    # it — not overwrite first and report "(no drift)" forever
    import json as _json
    prof = tmp_path / "rolling.profile.json"
    day1 = tmp_path / "d1.json"
    with day1.open("w") as fh:
        for i in range(40):
            fh.write(_json.dumps({"id": i}) + "\n")
    # bootstrap run: no baseline yet — must still SAVE and say so,
    # not crash with FileNotFoundError before writing anything
    boot = get_structure(get_config(
        [str(day1), "--save-profile", str(prof), "--diff", str(prof)]),
        spark=spark)
    assert boot == f"(no baseline at {prof})"
    assert prof.exists()
    day2 = tmp_path / "d2.json"
    with day2.open("w") as fh:
        for i in range(40):
            fh.write(_json.dumps({"id": i, "extra": "x"}) + "\n")
    drift = get_structure(get_config(
        [str(day2), "--save-profile", str(prof), "--diff", str(prof)]),
        spark=spark)
    assert "extra" in drift and drift != "(no drift)"
    # and the baseline WAS updated: day2 vs itself is clean
    again = get_structure(get_config(
        [str(day2), "--diff", str(prof)]), spark=spark)
    assert again == "(no drift)"
    # --json --diff emits structured changes, not the text report
    out = get_structure(get_config(
        [str(day1), "--diff", str(prof), "--json"]), spark=spark)
    changes = _json.loads(out)
    assert isinstance(changes, list) and any(
        c["kind"] == "removed" for c in changes)
    # a missing baseline that this run will NOT create (typo'd path,
    # no same-path --save-profile) stays a hard error so exit-code
    # monitors are not silently disabled
    with pytest.raises(FileNotFoundError):
        get_structure(get_config(
            [str(day1), "--diff", str(tmp_path / "nope.json")]),
            spark=spark)
    # bootstrap JSON marker is an object, not an empty change list
    prof2 = tmp_path / "fresh.profile.json"
    out = get_structure(get_config(
        [str(day1), "--save-profile", str(prof2),
         "--diff", str(prof2), "--json"]), spark=spark)
    assert _json.loads(out) == {"no_baseline": str(prof2)}
