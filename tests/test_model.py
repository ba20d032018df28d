from structa_spark.model import (
    BoolT, DateTimeT, Empty, FieldT, FloatT, IntT, ListT, NumReprT,
    RecordT, StrReprT, StrT, TableT, URLT, ValueAny, merge,
    record_similarity,
)
from structa_spark.stats import LengthStats, Stats


def s(lo=None, hi=None, card=10):
    return Stats(card=card, min=lo, max=hi)


def test_empty_is_identity():
    node = IntT(stats=s(1, 5))
    assert merge(Empty(), node) == node
    assert merge(node, Empty()) == node
    assert isinstance(merge(Empty(), Empty()), Empty)


def test_value_is_top():
    assert isinstance(merge(ValueAny(), IntT(stats=s())), ValueAny)
    assert isinstance(merge(StrT(stats=s()), ValueAny()), ValueAny)


def test_numeric_tower_widens():
    # bool < int < float (reference types.py:780-834)
    assert isinstance(merge(BoolT(stats=s()), IntT(stats=s())), IntT)
    assert isinstance(merge(IntT(stats=s()), FloatT(stats=s())), FloatT)
    assert isinstance(merge(BoolT(stats=s()), FloatT(stats=s())), FloatT)
    assert isinstance(merge(IntT(stats=s()), IntT(stats=s())), IntT)


def test_merge_combines_ranges():
    m = merge(IntT(stats=s(0, 10)), IntT(stats=s(5, 20)))
    assert m.stats.min == 0 and m.stats.max == 20
    assert m.stats.card == 20


def test_int_str_mix_is_value():
    # type mixing is never threshold-excused (fixture F4)
    assert isinstance(merge(IntT(stats=s()), StrT(stats=s())), ValueAny)


def test_url_narrows_to_str():
    m = merge(URLT(stats=s()), StrT(stats=s()))
    assert isinstance(m, StrT) and not isinstance(m, URLT)
    assert isinstance(merge(URLT(stats=s()), URLT(stats=s())), URLT)


def test_strrepr_merge_same_pattern():
    a = StrReprT(inner=IntT(stats=s(0, 5)), pattern="d")
    b = StrReprT(inner=IntT(stats=s(3, 9)), pattern="d")
    m = merge(a, b)
    assert isinstance(m, StrReprT) and m.pattern == "d"
    assert m.inner.stats.max == 9


def test_strrepr_base_widening():
    a = StrReprT(inner=IntT(stats=s()), pattern="d")
    b = StrReprT(inner=IntT(stats=s()), pattern="x")
    assert isinstance(merge(a, b), StrReprT)


def test_numrepr_falls_back_to_physical():
    ts = NumReprT(inner=DateTimeT(stats=s()), pattern="f", epoch="unix",
                  scale=1.0)
    m = merge(ts, FloatT(stats=s(0.0, 1.0)))
    assert isinstance(m, FloatT)


def test_list_merge():
    a = ListT(element=IntT(stats=s(0, 5)))
    b = ListT(element=FloatT(stats=s(1.0, 9.0)))
    m = merge(a, b)
    assert isinstance(m, ListT) and isinstance(m.element, FloatT)


def test_record_merge_optional_fields():
    a = RecordT(fields=(FieldT(key="x", value=IntT(stats=s()), count=5),))
    b = RecordT(fields=(
        FieldT(key="x", value=IntT(stats=s()), count=3),
        FieldT(key="y", value=StrT(stats=s()), count=3),
    ))
    m = merge(a, b)
    fields = {f.key: f for f in m.fields}
    assert not fields["x"].optional
    assert fields["y"].optional          # present on one side only
    assert fields["x"].count == 8


def test_record_table_absorption():
    rec = RecordT(fields=(FieldT(key="a", value=IntT(stats=s())),))
    tab = TableT(key=StrT(stats=s()), value=IntT(stats=s()))
    m = merge(rec, tab)
    assert isinstance(m, TableT)
    assert isinstance(m.value, IntT)


def test_str_pattern_positional_union():
    pa = tuple(__import__("structa_spark.chars", fromlist=["CharClass"])
               .CharClass(c) for c in ("a", "b"))
    pb = tuple(__import__("structa_spark.chars", fromlist=["CharClass"])
               .CharClass(c) for c in ("x", "b"))
    a = StrT(stats=s(), pattern=pa, lengths=LengthStats(2, 2, 2))
    b = StrT(stats=s(), pattern=pb, lengths=LengthStats(2, 2, 2))
    m = merge(a, b)
    assert m.pattern[0].chars == frozenset("ax")
    assert m.pattern[1].chars == frozenset("b")


def test_record_similarity():
    a = RecordT(fields=tuple(
        FieldT(key=k, value=IntT(stats=s())) for k in "abcd"))
    b = RecordT(fields=tuple(
        FieldT(key=k, value=IntT(stats=s())) for k in "abxy"))
    assert record_similarity(a, b) == 0.5


def test_size_metric():
    rec = RecordT(fields=(
        FieldT(key="a", value=IntT(stats=s())),
        FieldT(key="b", value=ListT(element=StrT(stats=s()))),
    ))
    # record(1) + field(1)+int(1) + field(1)+list(1)+str(1) = 6
    assert rec.size == 6


def test_profile_json_roundtrip(spark):
    from structa_spark import analyze, Profile
    from structa_spark.serialize import profile_from_json, profile_to_json
    df = spark.createDataFrame(
        [(i, str(i), f"2021-03-{(i % 28) + 1:02d}", f"id {i % 100:02d}",
          [i, i + 1]) for i in range(200)],
        "a: long, b: string, c: string, d: string, e: array<long>")
    p = analyze(df, exact=True)
    q = profile_from_json(profile_to_json(p))
    assert q.row_count == p.row_count
    assert q.root == p.root            # dataclass equality, full tree
    assert q.render() == p.render()


def test_profile_save_load(spark, tmp_path):
    from structa_spark import analyze
    from structa_spark.analyzer import Profile
    df = spark.createDataFrame([(i,) for i in range(50)], "x: long")
    p = analyze(df, exact=True)
    f = tmp_path / "profile.json"
    p.save(str(f))
    q = Profile.load(str(f))
    assert q.root == p.root


def test_quartile_graph():
    # numeric: digits at int(9*(q-min)/delta) over a '.' fill
    s = Stats(card=100, min=0, max=99, q1=24.75, q2=49.5, q3=74.25)
    assert s.quartile_graph() == "..1.2.3..."
    # collisions: later quartile digits overwrite earlier
    s2 = Stats(card=10, min=0, max=9, q1=5, q2=5, q3=5)
    assert s2.quartile_graph() == ".....3...."
    # strings aren't subtractable -> no graph (reference types.py:108)
    s3 = Stats(card=5, min="a", max="z", q1="c", q2="m", q3="t")
    assert s3.quartile_graph() == ""
    # zero range -> no graph
    s4 = Stats(card=5, min=7, max=7, q1=7, q2=7, q3=7)
    assert s4.quartile_graph() == ""
    # timestamps subtract to timedeltas and divide to floats
    import datetime as dt
    t0 = dt.datetime(2021, 1, 1)
    s5 = Stats(card=10, min=t0, max=t0 + dt.timedelta(days=9),
               q1=t0 + dt.timedelta(days=2),
               q2=t0 + dt.timedelta(days=5),
               q3=t0 + dt.timedelta(days=7))
    assert s5.quartile_graph() == "..1..2.3.."


def test_stats_merge_keeps_bottom():
    a = Stats(card=10, sample=(("x", 5),), bottom=(("r", 1),))
    b = Stats(card=10, sample=(("x", 4),), bottom=(("r", 2), ("q", 1)))
    m = a + b
    assert dict(m.bottom) == {"r": 3, "q": 1}


# -- styled / indented rendering -------------------------------------------

def test_indent_render_breaks_nested_containers():
    from structa_spark.model import RenderOptions
    root = RecordT(fields=(
        FieldT(key="a", value=IntT(stats=Stats(card=3, min=1, max=9))),
        FieldT(key="b", value=ListT(element=RecordT(fields=(
            FieldT(key="c", value=StrT(stats=Stats(card=3))),
        )))),
    ))
    out = root.render(RenderOptions(indent=True))
    lines = out.splitlines()
    # root breaks (2 fields), list breaks (container element), inner
    # single-scalar record stays inline — the XSLT's exact rule
    assert lines[0] == "{"
    assert lines[1] == "    'a': int range=1..9,"
    assert lines[2] == "    'b': ["
    assert lines[3] == "        { 'c': str }"
    assert lines[4] == "    ]"
    assert lines[5] == "}"
    # single-line render is unchanged by default
    assert "\n" not in root.render()


def test_ansi_render_styles_types_patterns_unique():
    from structa_spark.model import ANSI_STYLES, RenderOptions
    opts = RenderOptions(styles=ANSI_STYLES)
    n = IntT(stats=Stats(card=3, min=1, max=9))
    assert "\x1b[36mint\x1b[0m" in n.render(opts)
    u = IntT(stats=Stats(card=3, min=1, max=9, unique=True))
    assert "\x1b[4m" in u.render(opts)          # unique -> underline
    from structa_spark.chars import CharClass
    s = StrT(stats=Stats(card=3), pattern=(CharClass("ab"),))
    assert "\x1b[33m" in s.render(opts)         # pattern -> yellow
    f = FieldT(key="k", value=n, optional=True)
    assert "\x1b[32m?\x1b[0m" in f.render(opts)  # optional -> green
    # plain render contains no escapes
    assert "\x1b" not in f.render()


def test_cli_indent_and_color_flags(spark, tmp_path):
    import json as _json
    from structa_spark.ui.cli import get_config, get_structure
    doc = [{"name": f"n{i}", "vals": [{"x": i}]} for i in range(5)]
    f = tmp_path / "d.json"
    f.write_text(_json.dumps(doc))
    plain = get_structure(get_config([str(f)]), spark=spark)
    assert "\n" not in plain
    indented = get_structure(
        get_config(["--indent", str(f)]), spark=spark)
    assert indented.splitlines()[0] == "{"
    assert "    'name':" in indented
    colored = get_structure(
        get_config(["--color", "always", str(f)]), spark=spark)
    assert "\x1b[36m" in colored
