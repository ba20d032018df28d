"""Typed CLI argument parsers.

The reference exposes percent/fraction numbers, k/m/g byte sizes,
epoch specs ("unix", "excel", "days since 1970-01-01") and
absolute-or-relative timestamps as argparse types (reference:
structa/ui/cli.py:345-401, structa/conversions.py:88-179). These are
driver-side plain Python — no Spark involvement.
"""

from __future__ import annotations

import datetime as dt
import re
from typing import Optional, Tuple

_SIZE_SUFFIX = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}


def num(s: str) -> float:
    """'2%' -> 0.02, '1/3' -> 0.333..., '0.5' -> 0.5."""
    s = s.strip()
    if s.endswith("%"):
        return float(s[:-1]) / 100.0
    if "/" in s:
        a, b = s.split("/", 1)
        return float(a) / float(b)
    return float(s)


def size(s: str) -> int:
    """'1m' -> 1048576; bare numbers are bytes."""
    s = s.strip().lower()
    if s and s[-1] in _SIZE_SUFFIX:
        return int(float(s[:-1]) * _SIZE_SUFFIX[s[-1]])
    return int(s)


_DURATION_RX = re.compile(
    r"(?P<n>[+-]?\d+(?:\.\d+)?)\s*"
    r"(?P<unit>y(?:ears?)?|mo(?:nths?)?|w(?:eeks?)?|d(?:ays?)?|"
    r"h(?:(?:ou)?rs?)?|m(?:in(?:utes?)?)?|s(?:ec(?:onds?)?)?)\b",
    re.IGNORECASE)

_UNIT_SECONDS = {
    "y": 365.2425 * 86400, "mo": 30.4369 * 86400, "w": 7 * 86400,
    "d": 86400, "h": 3600, "m": 60, "s": 1,
}


def parse_duration(s: str) -> dt.timedelta:
    """'5 minutes, 30 seconds' -> timedelta; accepts y/mo/w/d/h/m/s
    unit words (reference: structa/conversions.py:88-157)."""
    total = 0.0
    matched = False
    for m in _DURATION_RX.finditer(s):
        matched = True
        unit = m.group("unit").lower()
        key = "mo" if unit.startswith("mo") else unit[0]
        total += float(m.group("n")) * _UNIT_SECONDS[key]
    if not matched:
        raise ValueError(f"not a duration: {s!r}")
    return dt.timedelta(seconds=total)


def parse_timestamp(s: str) -> dt.datetime:
    from dateutil import parser as _p
    return _p.parse(s)


def parse_duration_or_timestamp(
        s: str, now: Optional[dt.datetime] = None) -> dt.datetime:
    """Absolute timestamp, or a duration interpreted relative to now
    (reference: structa/ui/cli.py:345-359)."""
    now = now or dt.datetime.now()
    try:
        return now - parse_duration(s)
    except ValueError:
        return parse_timestamp(s)


def parse_epoch(s: str) -> Tuple[str, float, Optional[dt.datetime]]:
    """Epoch spec -> (name, scale seconds, custom base).

    'unix' -> seconds since 1970; 'excel' -> days since 1899-12-30;
    '<unit>s since <date>' -> custom (reference ui/cli.py:361-383)."""
    s = s.strip().lower()
    if s == "unix":
        return "unix", 1.0, None
    if s == "excel":
        return "excel", 86400.0, None
    m = re.match(r"(\w+?)s?\s+since\s+(.+)$", s)
    if m:
        unit, base = m.group(1), parse_timestamp(m.group(2))
        key = "mo" if unit.startswith("mo") else unit[0]
        if key not in _UNIT_SECONDS:
            raise ValueError(f"unknown epoch unit: {unit!r}")
        return "custom", _UNIT_SECONDS[key], base
    raise ValueError(f"not an epoch spec: {s!r}")
