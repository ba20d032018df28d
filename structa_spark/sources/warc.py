"""WARC (Web ARChive, ISO 28500) ingestion — the container format of
web-crawl corpora (Common-Crawl-style dumps): a file is a sequence of
records, each a ``WARC/1.x`` version line, colon-separated headers, a
blank line and ``Content-Length`` payload bytes; archives usually
store one gzip member per record so readers can split on member
boundaries.

Spark shape: ``binaryFiles`` + executor-side record parse, the same
posture as the XML/YAML readers (``reader.py``) — parallelism is by
FILE, which matches how crawl dumps ship (thousands of ~1 GB
segments). A production refinement for giant single files is to
pre-index gzip-member offsets and read ranges; the per-record member
layout exists precisely to allow that.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])


def gunzip_members(data: bytes, max_bytes: int = 1 << 32) -> bytes:
    """Concatenated-gzip-member inflate (the WARC storage layout:
    one member per record). Streaming with a total-size cap; a
    non-gzip input passes through unchanged. The input is walked as
    a memoryview, so per-member cost is the member itself — a 100k-
    member segment stays linear, not O(members x file size) memcpy."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = []
    total = 0
    buf = memoryview(data)
    i = 0
    while i < len(data) and bytes(buf[i:i + 2]) == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=47)
        chunk = d.decompress(buf[i:], max_bytes + 1 - total)
        total += len(chunk)
        if total > max_bytes:
            raise ValueError("inflated WARC exceeds max_bytes")
        if not d.eof:
            raise ValueError("truncated gzip member")
        out.append(chunk)
        consumed = (len(data) - i) - len(d.unused_data)
        if consumed <= 0:
            break
        i += consumed
    return b"".join(out)


def parse_warc_records(data: bytes):
    """Yield ``(headers_dict, payload_bytes)`` per WARC record.
    Header names lowercase; malformed trailing garbage ends the walk
    rather than raising (a crawl segment can be truncated)."""
    i = 0
    while True:
        j = data.find(b"WARC/", i)
        if j < 0:
            return
        he = data.find(b"\r\n\r\n", j)
        if he < 0:
            return
        lines = data[j:he].decode("utf-8", "replace").split("\r\n")
        hdrs = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                hdrs[k.strip().lower()] = v.strip()
        try:
            # clamp: a negative Content-Length would walk i backwards
            # and re-yield the same record forever
            n = max(0, int(hdrs.get("content-length", "0")))
        except ValueError:
            n = 0
        if he + 4 + n > len(data):
            # final record cut mid-payload: drop it rather than yield
            # a silently short body as if it were a complete document
            return
        body = data[he + 4:he + 4 + n]
        yield hdrs, body
        i = he + 4 + n


def strip_http_headers(body: bytes) -> bytes:
    """For ``response`` records the payload is an HTTP message;
    return just its entity body (bytes after the header block).
    Falls back to bare-LF header delimiters — non-conformant but
    real servers emit them, and leaving the header block in would
    pollute the extracted text."""
    if body[:5] != b"HTTP/":
        return body
    sep = body.find(b"\r\n\r\n")
    if sep >= 0:
        return body[sep + 4:]
    sep = body.find(b"\n\n")
    return body[sep + 2:] if sep >= 0 else body


def read_warc(spark: SparkSession, path: str,
              http_body: bool = False,
              max_bytes_per_file: int = 1 << 32) -> DataFrame:
    """Read WARC file(s) into (file, record_id, warc_type,
    target_uri, warc_date, content_type, content_length, payload).

    Handles plain and per-record-gzip archives (member-concatenated
    streams inflate with a size cap). With ``http_body=True``,
    ``response`` payloads are stripped to the HTTP entity body — the
    usual first step before charset decode + quality filtering.
    Payload bytes stay executor-side; compose with
    ``operators.multimodal.decompress_payloads`` /
    ``operators.text`` for the rest of the landing pipeline."""
    rdd = spark.sparkContext.binaryFiles(path)

    def parse(kv):
        fname, data = kv
        try:
            raw = gunzip_members(bytes(data), max_bytes_per_file)
        except ValueError:
            return []
        rows = []
        for hdrs, body in parse_warc_records(raw):
            if http_body and hdrs.get("warc-type") == "response":
                body = strip_http_headers(body)
            rows.append((fname,
                         hdrs.get("warc-record-id"),
                         hdrs.get("warc-type"),
                         hdrs.get("warc-target-uri"),
                         hdrs.get("warc-date"),
                         hdrs.get("content-type"),
                         len(body),
                         bytearray(body)))
        return rows

    return spark.createDataFrame(rdd.flatMap(parse), WARC_SCHEMA)


def warc_bytes(records, gzip_members: bool = False) -> bytes:
    """Synthetic WARC writer (the test/round-trip twin of
    :func:`read_warc`): ``records`` is a list of (headers_dict,
    payload_bytes); with ``gzip_members`` each record becomes its own
    gzip member, the real archives' layout."""
    import gzip as _gzip

    out = []
    for hdrs, body in records:
        head = "WARC/1.0\r\n" + "".join(
            f"{k}: {v}\r\n" for k, v in hdrs.items()
            if k.lower() != "content-length")
        head += f"Content-Length: {len(body)}\r\n\r\n"
        rec = head.encode() + body + b"\r\n\r\n"
        out.append(_gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)
