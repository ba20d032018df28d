"""Character-class algebra for string pattern induction.

Driver-side, pure Python: operates on the *tiny* per-position
``collect_set(char)`` aggregates produced by the Spark job in
:mod:`structa_spark.analyzer` — never on row data.

Semantics follow the reference's character-set algebra
(reference: structa/chars.py:32-284): a pattern position is a set of
characters, displayable as a named class when it is a subset of one
(octal / decimal / hex digits, identifier chars), and generalizing to
"any char" when too diverse.
"""

from __future__ import annotations

import string
from functools import total_ordering


@total_ordering
class CharClass:
    """An immutable set of characters with union/subset algebra.

    Display rules (mirroring the reference's terminal output):

    * subset of a named class -> that class's code char
      (``o`` octal digit, ``d`` decimal digit, ``x`` hex digit,
      ``I`` identifier-first, ``i`` identifier char)
    * a single literal char -> that char
    * otherwise -> ``*`` ("any char")
    """

    __slots__ = ("chars",)

    def __init__(self, chars):
        object.__setattr__(self, "chars", frozenset(chars))

    def __setattr__(self, name, value):  # pragma: no cover - immutability
        raise AttributeError("CharClass is immutable")

    # -- set algebra ------------------------------------------------------
    def __or__(self, other: "CharClass") -> "CharClass":
        if isinstance(other, AnyChar):
            return ANY_CHAR
        return CharClass(self.chars | other.chars)

    __add__ = __or__

    def __and__(self, other: "CharClass") -> "CharClass":
        if isinstance(other, AnyChar):
            return self
        return CharClass(self.chars & other.chars)

    def issubset(self, other: "CharClass") -> bool:
        if isinstance(other, AnyChar):
            return True
        return self.chars <= other.chars

    def __contains__(self, ch: str) -> bool:
        return ch in self.chars

    def __len__(self) -> int:
        return len(self.chars)

    def __eq__(self, other) -> bool:
        if isinstance(other, AnyChar):
            return False
        if isinstance(other, CharClass):
            return self.chars == other.chars
        return NotImplemented

    def __lt__(self, other) -> bool:
        if isinstance(other, AnyChar):
            return True
        if isinstance(other, CharClass):
            return sorted(self.chars) < sorted(other.chars)
        return NotImplemented

    def __hash__(self) -> int:
        return hash(self.chars)

    def __repr__(self) -> str:
        return f"CharClass({''.join(sorted(self.chars))!r})"

    # -- display ----------------------------------------------------------
    @property
    def code(self) -> str:
        """One-char display code for this position."""
        if len(self.chars) == 1:
            ch = next(iter(self.chars))
            # literal display; escape the class codes themselves
            return ch
        has_digit = any(c.isdigit() for c in self.chars)
        for cls, code in _NAMED:
            # digit-class codes (o/d/x) only apply when a digit is
            # actually present: {a,b} is a hex subset but reads as an
            # identifier, not a hex number
            if code in ("o", "d", "x") and not has_digit:
                continue
            if self.chars <= cls:
                return code
        return "*"


class AnyChar(CharClass):
    """The universal character class (top of the lattice)."""

    def __init__(self):
        object.__setattr__(self, "chars", None)

    def __or__(self, other):
        return self

    __add__ = __or__

    def __and__(self, other):
        return other

    def issubset(self, other):
        return isinstance(other, AnyChar)

    def __contains__(self, ch):
        return True

    def __len__(self):  # pragma: no cover - display only
        return 0x110000

    def __eq__(self, other):
        return isinstance(other, AnyChar)

    def __hash__(self):
        return hash(AnyChar)

    def __repr__(self):
        return "AnyChar()"

    @property
    def code(self) -> str:
        return "*"


ANY_CHAR = AnyChar()

oct_digit = frozenset(string.octdigits)
dec_digit = frozenset(string.digits)
hex_digit = frozenset(string.hexdigits)
ident_first = frozenset(string.ascii_letters + "_")
ident_char = frozenset(string.ascii_letters + string.digits + "_")

# Ordered most-specific-first for display resolution. 'I' displays
# upper-case identifier positions, 'i' mixed/lower-case ones.
upper_ident = frozenset(string.ascii_uppercase + "_")
_NAMED = [
    (oct_digit, "o"),
    (dec_digit, "d"),
    (hex_digit, "x"),
    (upper_ident, "I"),
    (ident_char, "i"),
]


def induce_pattern(position_sets, generalize_threshold: int = 10):
    """Build a per-position pattern from ``[(pos, set_of_chars), ...]``.

    Digit-run promotion: if every position in a contiguous run of
    digit-ish classes fits a base (oct < dec < hex), promote the whole
    run to the widest base seen (mirrors the reference's base
    promotion, structa/analyzer.py:685-719). Positions with more than
    ``generalize_threshold`` distinct chars that fit no named class
    generalize to ``*`` (any char).

    Returns a list of :class:`CharClass`.
    """
    classes = []
    for _, chars in sorted(position_sets):
        cc = CharClass(chars)
        if len(cc) > generalize_threshold and cc.code == "*":
            classes.append(ANY_CHAR)
        else:
            classes.append(cc)

    # promote digit runs to the max base within the run
    def base_of(cc):
        if isinstance(cc, AnyChar) or len(cc) <= 1:
            return None
        if cc.chars <= oct_digit:
            return 8
        if cc.chars <= dec_digit:
            return 10
        if cc.chars <= hex_digit:
            return 16
        return None

    out = list(classes)
    i = 0
    while i < len(out):
        if base_of(out[i]) is None:
            i += 1
            continue
        j = i
        run_base = 0
        run_has_digit = False
        while j < len(out) and base_of(out[j]) is not None:
            run_base = max(run_base, base_of(out[j]))
            run_has_digit = run_has_digit or any(
                c.isdigit() for c in out[j].chars)
            j += 1
        # a run of letters-only "hex" positions (e.g. {a,b}{c,d}) is an
        # identifier, not a number: promote only digit-bearing runs
        if run_has_digit:
            widened = {8: oct_digit, 10: dec_digit, 16: hex_digit}[run_base]
            for k in range(i, j):
                if len(out[k]) > 1:
                    out[k] = CharClass(widened)
        i = j
    return out


def pattern_str(classes) -> str:
    """Render a pattern list as the display string (e.g. ``"Iii"``)."""
    return "".join(c.code for c in classes)
