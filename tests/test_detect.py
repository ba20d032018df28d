"""Source-layer detection tests (mirrors the reference's
tests/test_source.py pillar): encoding, format, and CSV dialect
sniffing — all driver-side, no Spark session needed."""

import codecs
import json

from structa_spark.sources.detect import (
    detect_csv_dialect, detect_encoding, detect_format, sniff,
)


# -- encoding --------------------------------------------------------------

def test_encoding_ascii():
    enc, conf = detect_encoding(b"hello world\n")
    assert enc == "utf-8" and conf == 1.0


def test_encoding_utf8():
    enc, conf = detect_encoding("héllo wörld\n".encode("utf-8"))
    assert enc == "utf-8" and conf >= 0.9


def test_encoding_latin1_fallback():
    enc, conf = detect_encoding("héllo\n".encode("latin-1"))
    assert enc == "iso-8859-1" and conf < 0.9


def test_encoding_boms_decode_without_feff():
    # the detected codec must CONSUME the BOM: decoding the sample
    # with it may not leave a U+FEFF on the first character (that
    # would corrupt header detection / the first CSV column name)
    cases = [
        (codecs.BOM_UTF8 + "col_a,col_b\n1,2\n".encode("utf-8"),
         "utf-8-sig"),
        ("col_a,col_b\n1,2\n".encode("utf-16"), "utf-16"),
        (codecs.BOM_UTF16_BE + "col_a,col_b\n".encode("utf-16-be"),
         "utf-16"),
        (codecs.BOM_UTF32_LE + "col_a,col_b\n".encode("utf-32-le"),
         "utf-32"),
        (codecs.BOM_UTF32_BE + "col_a,col_b\n".encode("utf-32-be"),
         "utf-32"),
    ]
    for raw, want in cases:
        enc, conf = detect_encoding(raw)
        assert enc == want and conf == 1.0
        assert raw.decode(enc).startswith("col_a"), (want, raw[:8])


def test_encoding_bomless_utf16():
    raw = "name,value\nalpha,1\nbeta,2\n".encode("utf-16-le")
    enc, conf = detect_encoding(raw)
    assert enc == "utf-16-le" and conf == 0.8
    raw_be = "name,value\nalpha,1\nbeta,2\n".encode("utf-16-be")
    enc, conf = detect_encoding(raw_be)
    assert enc == "utf-16-be" and conf == 0.8


# -- format ----------------------------------------------------------------

def test_format_xml():
    assert detect_format(b"<?xml version='1.0'?><r/>", "utf-8") == "xml"
    assert detect_format(b"<html><body/></html>", "utf-8") == "xml"


def test_format_document_json():
    doc = json.dumps({"a": {"b": [1, 2, 3]}}, indent=2).encode()
    assert detect_format(doc, "utf-8") == "json"


def test_format_json_array():
    assert detect_format(b'["x", "y", "z"]', "utf-8") == "json"


def test_format_ndjson():
    lines = b"\n".join(
        json.dumps({"i": i}).encode() for i in range(20))
    assert detect_format(lines, "utf-8") == "ndjson"


def test_format_csv():
    rows = b"\n".join(b"a,b,c" for _ in range(20))
    assert detect_format(b"name,qty,price\n" + rows, "utf-8") == "csv"


def test_format_yaml():
    text = (b"# config\n"
            b"server:\n"
            b"  host: localhost\n"
            b"  port: 8080\n"
            b"users:\n"
            b"- alice\n"
            b"- bob\n")
    assert detect_format(text, "utf-8") == "yaml"


# -- CSV dialect -----------------------------------------------------------

def test_csv_dialect_semicolons():
    sample = b"name;qty\n" + b"\n".join(
        f"item{i};{i}".encode() for i in range(20))
    delim, quote, header = detect_csv_dialect(sample, "utf-8")
    assert delim == ";"
    assert header is True


def test_csv_dialect_tabs_no_header():
    sample = b"\n".join(f"{i}\t{i * 2}".encode() for i in range(20))
    delim, quote, header = detect_csv_dialect(sample, "utf-8")
    assert delim == "\t"
    assert header is False


def test_csv_dialect_pipes():
    sample = b"a|b|c\n1|2|3\n4|5|6\n"
    delim, _, _ = detect_csv_dialect(sample, "utf-8")
    assert delim == "|"


# -- integrated sniff ------------------------------------------------------

def test_sniff_csv_end_to_end():
    sample = ("Name,Nationality\n"
              + "\n".join(f"person{i},country{i}" for i in range(10))
              ).encode()
    s = sniff(sample)
    assert s.format == "csv"
    assert s.csv_delimiter == ","
    assert s.csv_header is True


def test_sniff_ndjson_end_to_end():
    sample = b"\n".join(
        json.dumps({"k": i}).encode() for i in range(5))
    s = sniff(sample)
    assert s.format == "ndjson"
    assert s.encoding == "utf-8"
