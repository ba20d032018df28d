"""Candidate string-representation conversions as Spark expressions.

The reference tries conversions one-by-one per type candidate,
re-walking the data each time (reference: structa/analyzer.py:722-740,
structa/conversions.py:16-54). Here every candidate's *failure count*
is computed in a single wide aggregation pass (JVM-side, whole-stage
codegen) and the driver then picks the first candidate whose failures
fall within ``bad_threshold`` — occurrences, not distinct values.

Each candidate carries:

* ``name``      - stable agg-column suffix
* ``pattern``   - the display pattern (structa-style: base char, bool
                  word pair, or strptime-ish datetime format)
* ``ok(col)``   - Column<bool>: does this value parse?
* ``cast(col)`` - Column: the logical-value expression (the compiled
                  cast chain for plans/validation)
* ``kind``      - 'bool' | 'int' | 'float' | 'datetime'
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Candidate:
    name: str
    pattern: str
    kind: str
    ok: Callable[[Column], Column]
    cast: Callable[[Column], Column]
    fixed_len: bool = False
    # length range a value must have to possibly parse — lets the
    # analyzer skip whole candidates per column from min/max(length)
    # alone, so e.g. a long-text column never evaluates any of them
    min_len: int = 1
    max_len: int | None = None

    def possible(self, col_lmin: int, col_lmax: int) -> bool:
        """Could ANY value of a column with this length range parse?"""
        if col_lmax < self.min_len:
            return False
        if self.max_len is not None and max(col_lmin, 1) > self.max_len:
            return False
        return True


def _regex_candidate(name, pattern, kind, regex, cast,
                     min_len=1, max_len=None):
    return Candidate(
        name=name, pattern=pattern, kind=kind,
        ok=lambda c, r=regex: c.rlike(r),
        cast=cast, min_len=min_len, max_len=max_len,
    )


# -- bool word pairs (false|true ordered) — reference analyzer.py:54-62
_BOOL_PAIRS = [
    ("0", "1"),
    ("f", "t"),
    ("n", "y"),
    ("false", "true"),
    ("no", "yes"),
    ("off", "on"),
    ("", "x"),
]


def _bool_candidates() -> List[Candidate]:
    out = []
    for false_w, true_w in _BOOL_PAIRS:
        pat = f"{false_w}|{true_w}"
        words = [w for w in (false_w, true_w)]
        out.append(Candidate(
            name="bool_" + (false_w or "blank") + "_" + true_w,
            pattern=pat,
            kind="bool",
            ok=lambda c, ws=tuple(words): F.lower(c).isin(list(ws)),
            cast=lambda c, t=true_w: (F.lower(c) == t),
            min_len=min((len(w) for w in words if w), default=1),
            max_len=max(len(w) for w in words),
        ))
    return out


# -- int bases — reference analyzer.py:63, types.py:784-801
_INT_CANDIDATES = [
    _regex_candidate(
        "int_o", "o", "int", r"^[-+]?0?[oO]?[0-7]+$",
        lambda c: F.conv(F.regexp_replace(c, r"^[-+]?0?[oO]?", ""), 8, 10)
        .try_cast("long"), max_len=24),
    _regex_candidate(
        "int_d", "d", "int", r"^[-+]?[0-9]+$",
        lambda c: c.try_cast("long"), max_len=20),
    _regex_candidate(
        "int_x", "x", "int", r"^[-+]?(0[xX])?[0-9a-fA-F]+$",
        lambda c: F.conv(F.regexp_replace(c, r"^[-+]?(0[xX])?", ""), 16, 10)
        .try_cast("long"), max_len=19),
]

_FLOAT_CANDIDATE = _regex_candidate(
    "float_f", "f", "float",
    r"^[-+]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][-+]?[0-9]+)?$",
    lambda c: c.try_cast("double"), max_len=30)


# -- datetime formats: (display strptime-ish pattern, Spark/Java
#    format, prefilter regex, fixed_len) — reference analyzer.py:64-82
#    tries 7 fixed-length and a set of variable-length formats; this is
#    the equivalent set. The prefilter regex matters for throughput:
#    ``try_to_timestamp`` failures are exception-driven in the JVM
#    (~us each), so the cheap regex gates the parse and non-datetime
#    columns never pay for parse attempts at all.
_D2 = r"\d{2}"
_D4 = r"\d{4}"
_TZ = r"(Z|[+-]\d{2}:?\d{2})"
_DT_FORMATS = [
    ("%Y-%m-%d %H:%M:%S", "yyyy-MM-dd HH:mm:ss",
     rf"^{_D4}-{_D2}-{_D2} {_D2}:{_D2}:{_D2}$", True, 19, 19),
    ("%Y-%m-%dT%H:%M:%S", "yyyy-MM-dd'T'HH:mm:ss",
     rf"^{_D4}-{_D2}-{_D2}T{_D2}:{_D2}:{_D2}$", True, 19, 19),
    ("%Y-%m-%d %H:%M:%S.%f", "yyyy-MM-dd HH:mm:ss.SSSSSS",
     rf"^{_D4}-{_D2}-{_D2} {_D2}:{_D2}:{_D2}\.\d{{6}}$", True, 26, 26),
    ("%Y-%m-%dT%H:%M:%S.%f", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
     rf"^{_D4}-{_D2}-{_D2}T{_D2}:{_D2}:{_D2}\.\d{{6}}$", True, 26, 26),
    ("%Y-%m-%d", "yyyy-MM-dd", rf"^{_D4}-{_D2}-{_D2}$", True, 10, 10),
    ("%Y%m%d", "yyyyMMdd", rf"^{_D4}{_D2}{_D2}$", True, 8, 8),
    ("%H:%M:%S", "HH:mm:ss", rf"^{_D2}:{_D2}:{_D2}$", True, 8, 8),
    ("%Y-%m-%d %H:%M:%S%z", "yyyy-MM-dd HH:mm:ssXXX",
     rf"^{_D4}-{_D2}-{_D2} {_D2}:{_D2}:{_D2}{_TZ}$", False, 20, 25),
    ("%Y-%m-%dT%H:%M:%S%z", "yyyy-MM-dd'T'HH:mm:ssXXX",
     rf"^{_D4}-{_D2}-{_D2}T{_D2}:{_D2}:{_D2}{_TZ}$", False, 20, 25),
    ("%d/%m/%Y", "dd/MM/yyyy", rf"^{_D2}/{_D2}/{_D4}$", False, 10, 10),
    ("%m/%d/%Y", "MM/dd/yyyy", rf"^{_D2}/{_D2}/{_D4}$", False, 10, 10),
    ("%Y/%m/%d", "yyyy/MM/dd", rf"^{_D4}/{_D2}/{_D2}$", False, 10, 10),
    # NOTE: day-of-week text ('EEE, dd MMM yyyy...') is unparseable in
    # Spark >= 3.0 datetime patterns; RFC-1123 detection is out of scope.
]


def _dt_candidates() -> List[Candidate]:
    out = []
    for i, (disp, java_fmt, rx, fixed, lmin, lmax) in enumerate(_DT_FORMATS):
        def ok(c, f=java_fmt, r=rx):
            return F.when(c.rlike(r),
                          F.try_to_timestamp(c, F.lit(f))).isNotNull()

        def cast(c, f=java_fmt, r=rx):
            return F.when(c.rlike(r), F.try_to_timestamp(c, F.lit(f)))

        out.append(Candidate(
            name=f"dt_{i}", pattern=disp, kind="datetime",
            ok=ok, cast=cast, fixed_len=fixed,
            min_len=lmin, max_len=lmax,
        ))
    return out


URL_REGEX = r"^https?://"


def candidates() -> List[Candidate]:
    """All candidates in priority order: bool pairs, int bases, float,
    datetimes (the reference's ladder order, analyzer.py:622-640)."""
    return (_bool_candidates() + _INT_CANDIDATES
            + [_FLOAT_CANDIDATE] + _dt_candidates())
