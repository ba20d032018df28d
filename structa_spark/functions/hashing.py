"""Deterministic cross-engine hashing helpers.

Built on ``md5`` (identical in Spark and any ANSI-SQL oracle) rather
than ``xxhash64``/``hash`` (engine-specific seeds), so every
hash-derived operator (minhash, simhash, LSH buckets, fingerprints)
can be verified value-for-value against a DuckDB oracle.

``md5_long(c)``: first 15 hex chars of md5 -> non-negative int64
(60 bits, no overflow). Spark: ``conv(substr(md5(c),1,15),16,10)``;
DuckDB: ``CAST('0x' || substr(md5(c),1,15) AS BIGINT)``.

MinHash uses universal hashing h_i(x) = (a_i * x + b_i) mod P with
P = 2^31 - 1 (Mersenne prime). x is first reduced mod P so the
product stays < 2^62 — exact in int64 in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1

# Fixed universal-hash parameters (odd a, 0 < a,b < P), generated once
# from a seeded PRNG and frozen here for reproducibility across
# engines and rounds.
MINHASH_PARAMS = [
    (1664525, 1013904223),
    (22695477, 1),
    (1103515245, 12345),
    (134775813, 1),
    (214013, 2531011),
    (16843009, 826366247),
    (69069, 1234567),
    (1000000007, 998244353),
    (48271, 11),
    (65539, 362437),
    (1566083941, 1),
    (1812433253, 1),
    (741103597, 887987685),
    (1597334677, 851723965),
    (747796405, 2891336453 % MERSENNE_P),
    (277803737, 1),
]


# md5_long keeps the first 15 hex chars = 60 bits (NOT 64 — 16 chars
# could overflow a signed int64). All three twins below — Spark
# column, DuckDB SQL, driver-side Python — MUST derive from this one
# constant or a silent drift makes hash-membership tests match
# nothing (test_hashing pins the three-way equality).
MD5_LONG_HEX_CHARS = 15


def md5_long(c: Column) -> Column:
    """Deterministic non-negative int64 (60-bit) hash of a string
    column."""
    return F.conv(F.substring(F.md5(c), 1, MD5_LONG_HEX_CHARS),
                  16, 10).try_cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`md5_long`."""
    return (f"CAST(('0x' || substr(md5({expr}), 1, "
            f"{MD5_LONG_HEX_CHARS})) AS BIGINT)")


def md5_long_py(s: str) -> int:
    """Driver-side Python equivalent of :func:`md5_long` (e.g. for
    baking a bounded span set into a streaming plan as literals)."""
    import hashlib
    return int(hashlib.md5(s.encode("utf-8"))
               .hexdigest()[:MD5_LONG_HEX_CHARS], 16)


def universal_hash(x: Column, a: int, b: int) -> Column:
    """(a * (x mod P) + b) mod P — exact int64 in Spark and DuckDB."""
    return (F.lit(a) * (x % F.lit(MERSENNE_P)) + F.lit(b)) % F.lit(MERSENNE_P)


def universal_hash_sql(expr: str, a: int, b: int) -> str:
    return f"(({a} * (({expr}) % {MERSENNE_P}) + {b}) % {MERSENNE_P})"
