"""Office-document text extraction — DOCX (OOXML WordprocessingML),
the second-most-common document format in scraped corpora after PDF.
Stdlib-only, the ``sources/pdf.py`` discipline: the container is a
ZIP archive (``zipfile`` over executor-side bytes), the text lives in
``word/document.xml`` as ``<w:t>`` runs inside ``<w:p>`` paragraphs,
and extraction is a regex walk of that machine-generated XML (real
DOCX writers never pretty-print or split tags across the patterns
used here) with hard caps on the inflated size — a zip bomb yields an
error row, never an OOM.

Spark shape: pure per-row parse inside Arrow-batched ``mapInPandas``
(:func:`docx_extract_text`); payload bytes stay executor-side, no
shuffle — the same 100 TB posture as the PDF/WARC/multimodal
decoders."""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame

MAX_XML_BYTES = 1 << 26

_T_RUN = re.compile(rb"<w:t(?:\s[^>]*)?>(.*?)</w:t>", re.S)
_PARA_SPLIT = re.compile(rb"</w:p>")
_BR = re.compile(rb"<w:(?:br|cr)\s*/>")
_TAB = re.compile(rb"<w:tab\s*/>")
_ENT = {b"&amp;": b"&", b"&lt;": b"<", b"&gt;": b">",
        b"&quot;": b'"', b"&apos;": b"'"}


def _unescape_xml(raw: bytes) -> bytes:
    for ent, rep in _ENT.items():
        raw = raw.replace(ent, rep)
    return re.sub(rb"&#(\d+);",
                  lambda m: chr(int(m.group(1))).encode("utf-8"), raw)


def extract_docx_text(payload, max_xml: int = MAX_XML_BYTES
                      ) -> Tuple[Optional[str], int, Optional[str]]:
    """Extract visible text from one DOCX payload. Returns
    ``(text, n_paragraphs, error)`` — paragraphs join with newlines,
    ``<w:br/>``/``<w:cr/>`` become newlines and ``<w:tab/>`` tabs
    within a paragraph, XML entities (named + decimal numeric)
    unescape; non-ZIP / text-less payloads yield ``(None, 0,
    reason)``. The document part is read through the zip member with
    a hard size cap (central-directory sizes lie in crafted bombs, so
    the cap is enforced on the INFLATED stream, not the header)."""
    if payload is None or len(payload) < 4:
        return (None, 0, "empty/truncated payload")
    p = bytes(payload)
    if p[:2] != b"PK":
        return (None, 0, "not a ZIP container")
    try:
        zf = zipfile.ZipFile(io.BytesIO(p))
    except (zipfile.BadZipFile, OSError) as e:
        return (None, 0, f"corrupt zip: {e}")
    try:
        names = set(zf.namelist())
    except Exception as e:  # crafted central directories raise oddly
        return (None, 0, f"corrupt zip directory: {e}")
    if "word/document.xml" not in names:
        return (None, 0, "no word/document.xml (not a DOCX)")
    try:
        with zf.open("word/document.xml") as fh:
            data = fh.read(max_xml + 1)
    except Exception as e:
        return (None, 0, f"corrupt document part: {e}")
    err = None
    if len(data) > max_xml:
        err = "document.xml inflate cap exceeded"
        data = data[:max_xml]
    paras = []
    for chunk in _PARA_SPLIT.split(data):
        chunk = _BR.sub(b"\n", chunk)
        chunk = _TAB.sub(b"\t", chunk)
        runs = [_unescape_xml(r) for r in _T_RUN.findall(chunk)]
        if runs:
            paras.append(b"".join(runs).decode("utf-8", "replace"))
    if not paras:
        return (None, 0, err or "no text runs")
    return ("\n".join(paras), len(paras), err)


def docx_extract_text(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "media_id") -> DataFrame:
    """Distributed DOCX text extraction over a binary payload column:
    ``(id, text, n_chars, n_paragraphs, error)``, one row per input
    (failed extractions keep their row with null text). Arrow-batched
    ``mapInPandas``; payload bytes never leave the executor."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                text, np_, err = extract_docx_text(
                    bytes(payload) if payload is not None else None)
                out.append((int(mid), text,
                            len(text) if text is not None else None,
                            np_, err))
            yield pd.DataFrame(
                out, columns=[id_col, "text", "n_chars",
                              "n_paragraphs", "error"])

    return df.mapInPandas(
        batches, schema=(f"{id_col} long, text string, n_chars long, "
                         "n_paragraphs int, error string"))


# ---------------------------------------------------------------------------
# test/query fixture generator
# ---------------------------------------------------------------------------

def _esc_xml(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def docx_bytes(text: str, compress: bool = True) -> bytes:
    """A minimal structurally-valid DOCX showing ``text`` (one
    ``<w:p>`` per input line, each line split into two ``<w:t>``
    runs so run concatenation is exercised): [Content_Types].xml,
    the package relationship, and word/document.xml, zipped with
    deflate (or stored when ``compress=False``)."""
    paras = []
    for ln in text.split("\n"):
        mid = len(ln) // 2
        runs = (f"<w:r><w:t xml:space=\"preserve\">"
                f"{_esc_xml(ln[:mid])}</w:t></w:r>"
                f"<w:r><w:t xml:space=\"preserve\">"
                f"{_esc_xml(ln[mid:])}</w:t></w:r>")
        paras.append(f"<w:p>{runs}</w:p>")
    doc = ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
           "<w:document xmlns:w=\"http://schemas.openxmlformats.org/"
           "wordprocessingml/2006/main\"><w:body>"
           + "".join(paras) + "</w:body></w:document>")
    ctypes = ("<?xml version=\"1.0\"?><Types xmlns=\"http://schemas."
              "openxmlformats.org/package/2006/content-types\">"
              "<Default Extension=\"xml\" ContentType=\"application/"
              "xml\"/><Override PartName=\"/word/document.xml\" "
              "ContentType=\"application/vnd.openxmlformats-"
              "officedocument.wordprocessingml.document.main+xml\"/>"
              "</Types>")
    rels = ("<?xml version=\"1.0\"?><Relationships xmlns=\"http://"
            "schemas.openxmlformats.org/package/2006/relationships\">"
            "<Relationship Id=\"rId1\" Type=\"http://schemas."
            "openxmlformats.org/officeDocument/2006/relationships/"
            "officeDocument\" Target=\"word/document.xml\"/>"
            "</Relationships>")
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        zf.writestr("[Content_Types].xml", ctypes)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# ODT (OpenDocument text) — the same ZIP walk, content.xml part
# ---------------------------------------------------------------------------

_ODT_P = re.compile(rb"<text:p(?:\s[^>]*)?>(.*?)</text:p>", re.S)
_ODT_BR = re.compile(rb"<text:line-break\s*/>")
_ODT_TAB = re.compile(rb"<text:tab\s*/>")
_ODT_TAGS = re.compile(rb"<[^>]+>")


def extract_odt_text(payload, max_xml: int = MAX_XML_BYTES
                     ) -> Tuple[Optional[str], int, Optional[str]]:
    """Extract visible text from one ODT payload — the OpenDocument
    twin of :func:`extract_docx_text`: the ZIP member is
    ``content.xml``, paragraphs are ``<text:p>`` elements (inner
    ``<text:span>`` markup stripped, ``<text:line-break/>`` /
    ``<text:tab/>`` honored), entities unescape, the inflate cap is
    enforced on the decompressed part."""
    if payload is None or len(payload) < 4:
        return (None, 0, "empty/truncated payload")
    p = bytes(payload)
    if p[:2] != b"PK":
        return (None, 0, "not a ZIP container")
    try:
        zf = zipfile.ZipFile(io.BytesIO(p))
        names = set(zf.namelist())
    except Exception as e:
        return (None, 0, f"corrupt zip: {e}")
    if "content.xml" not in names:
        return (None, 0, "no content.xml (not an ODT)")
    try:
        with zf.open("content.xml") as fh:
            data = fh.read(max_xml + 1)
    except Exception as e:
        return (None, 0, f"corrupt content part: {e}")
    err = None
    if len(data) > max_xml:
        err = "content.xml inflate cap exceeded"
        data = data[:max_xml]
    paras = []
    for body in _ODT_P.findall(data):
        body = _ODT_BR.sub(b"\n", body)
        body = _ODT_TAB.sub(b"\t", body)
        body = _ODT_TAGS.sub(b"", body)
        paras.append(_unescape_xml(body).decode("utf-8", "replace"))
    if not paras:
        return (None, 0, err or "no text paragraphs")
    return ("\n".join(paras), len(paras), err)


def office_extract_text(df: DataFrame, payload_col: str = "payload",
                        id_col: str = "media_id") -> DataFrame:
    """Distributed office-document extraction dispatching on the ZIP
    contents: DOCX (``word/document.xml``) and ODT (``content.xml``)
    payloads in one column, ``(id, kind, text, n_chars,
    n_paragraphs, error)`` out, one row per input. Arrow-batched
    ``mapInPandas``."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(payload) if payload is not None else None
                kind = None
                if p is not None and p[:2] == b"PK":
                    try:
                        names = set(zipfile.ZipFile(
                            io.BytesIO(p)).namelist())
                        if "word/document.xml" in names:
                            kind = "docx"
                        elif "content.xml" in names:
                            kind = "odt"
                    except Exception:
                        pass
                if kind == "docx":
                    text, np_, err = extract_docx_text(p)
                elif kind == "odt":
                    text, np_, err = extract_odt_text(p)
                else:
                    text, np_, err = (None, 0,
                                      "not a DOCX/ODT container")
                out.append((int(mid), kind, text,
                            len(text) if text is not None else None,
                            np_, err))
            yield pd.DataFrame(
                out, columns=[id_col, "kind", "text", "n_chars",
                              "n_paragraphs", "error"])

    return df.mapInPandas(
        batches, schema=(f"{id_col} long, kind string, text string, "
                         "n_chars long, n_paragraphs int, "
                         "error string"))


def odt_bytes(text: str, compress: bool = True) -> bytes:
    """A minimal structurally-valid ODT showing ``text`` (one
    ``<text:p>`` per line, half of it wrapped in a ``<text:span>`` so
    inner-markup stripping is exercised)."""
    paras = []
    for ln in text.split("\n"):
        mid = len(ln) // 2
        paras.append(f"<text:p>{_esc_xml(ln[:mid])}"
                     f"<text:span>{_esc_xml(ln[mid:])}</text:span>"
                     f"</text:p>")
    doc = ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
           "<office:document-content xmlns:office=\"urn:oasis:names:"
           "tc:opendocument:xmlns:office:1.0\" xmlns:text=\"urn:"
           "oasis:names:tc:opendocument:xmlns:text:1.0\">"
           "<office:body><office:text>" + "".join(paras)
           + "</office:text></office:body></office:document-content>")
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        zf.writestr("mimetype",
                    "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", doc)
    return buf.getvalue()
