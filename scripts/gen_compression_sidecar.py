"""Fixture-time sidecar of expected zlib byte counts for the
``compression_ratio_screen`` oracle.

DuckDB exposes no deflate, so the one registry entry that measures
zlib output could previously only take the driver's rows-only check.
This script closes that gap: it computes ``(text_md5, n_bytes,
n_compressed)`` once, at fixture time, for every DISTINCT document
text across the test tiers (sf0.001 / sf0.01 / sf0.1) with the same
pinned ``zlib.compress(level=6)`` call the operator makes, and writes
the table to ``fixtures/compression_expected.parquet``. The oracle
SQL then joins ``documents`` against this sidecar on
``md5(coalesce(text, ''))`` — tier-independent by construction (equal
texts deflate to equal byte counts) — and recomputes the rounded
ratio and keep flag arithmetically, so the driver's full
rows+schema+hash compare applies.

Rerun whenever the test corpus changes:

    python scripts/gen_compression_sidecar.py
"""
import hashlib
import os
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

TIERS = ("sf0.001", "sf0.01", "sf0.1")
LEVEL = 6  # pinned: must match text.compression_ratio_screen
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures",
    "compression_expected.parquet")


def main() -> None:
    seen = {}
    for tier in TIERS:
        path = f"/root/testdata/{tier}/documents.parquet"
        if not os.path.exists(path):
            print(f"skip {tier}: {path} missing")
            continue
        tbl = pq.read_table(path, columns=["text"])
        for txt in tbl.column("text").to_pylist():
            raw = (txt or "").encode("utf-8")
            key = hashlib.md5(raw).hexdigest()
            if key in seen:
                continue
            n = len(raw)
            c = 0 if n == 0 else len(zlib.compress(raw, LEVEL))
            seen[key] = (n, c)
    keys = sorted(seen)
    out = pa.table({
        "text_md5": pa.array(keys, pa.string()),
        "n_bytes": pa.array([seen[k][0] for k in keys], pa.int64()),
        "n_compressed": pa.array([seen[k][1] for k in keys],
                                 pa.int64()),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(out, OUT, compression="zstd")
    print(f"wrote {OUT}: {out.num_rows} distinct texts")


if __name__ == "__main__":
    main()
