from structa_spark.chars import (
    ANY_CHAR, CharClass, dec_digit, hex_digit, induce_pattern, oct_digit,
    pattern_str,
)


def test_union_and_subset():
    a = CharClass("abc")
    b = CharClass("bcd")
    assert (a | b).chars == frozenset("abcd")
    assert CharClass("ab").issubset(a)
    assert not a.issubset(CharClass("ab"))
    assert a.issubset(ANY_CHAR)
    assert (a | ANY_CHAR) == ANY_CHAR
    assert (a & ANY_CHAR) == a


def test_display_codes():
    assert CharClass("0123").code == "o"
    assert CharClass("059").code == "d"
    assert CharClass("0a").code == "x"
    assert CharClass("AZ_").code == "I"
    assert CharClass("aZ_").code == "i"
    assert CharClass("a9_").code == "i"
    assert CharClass("x").code == "x"  # single literal char
    assert CharClass("!@").code == "*"
    assert ANY_CHAR.code == "*"


def test_digit_run_promotion():
    # "num 017"-style: positions 4-6 digits of mixed bases promote to
    # the widest base in the run (oct < dec < hex)
    sets = [(0, {"n"}), (1, {"u"}), (2, {"m"}), (3, {" "}),
            (4, {"0", "1"}), (5, {"0", "9"}), (6, {"2", "7"})]
    pattern = induce_pattern(sets)
    assert pattern_str(pattern) == "num ddd"


def test_oct_run_stays_oct():
    sets = [(0, {"0", "1"}), (1, {"2", "7"})]
    assert pattern_str(induce_pattern(sets)) == "oo"


def test_hex_promotion():
    sets = [(0, {"0", "9"}), (1, {"a", "f"}), (2, {"0", "1"})]
    assert pattern_str(induce_pattern(sets)) == "xxx"


def test_identifier_shape():
    sets = [(0, {"A", "B"}), (1, {"a", "b"}), (2, {"c", "d"})]
    assert pattern_str(induce_pattern(sets)) == "Iii"


def test_generalize_to_any():
    sets = [(0, set("abcdefghijk!@#"))]
    assert pattern_str(induce_pattern(sets)) == "*"
