"""Format-dispatching distributed readers.

``open_source(spark, path)`` sniffs the file (driver-side, bounded
sample) and configures the right distributed read — the Spark
re-expression of the reference's eager whole-file parse
(reference: structa/source.py:226-254):

* ndjson  -> ``spark.read.json`` (line-splittable, fully parallel)
* json    -> ``spark.read.option("multiLine", True).json`` — one task
             per file; document-JSON fundamentally parallelizes by
             *file count*, not bytes (survey §7 hard part (e))
* csv     -> ``spark.read.csv`` with sniffed delimiter/quote/header
* yaml    -> no built-in source: files are read whole
             (``wholeTextFiles``) and parsed per-file in EXECUTORS via
             a mapPartitions YAML parse — parallel by file count, like
             document JSON
* xml     -> wholeTextFiles + executor-side ElementTree parse to
             nested dicts (attributes as ``@attr``, text as ``#text``,
             repeated child tags as arrays). The reference declines
             XML (structa/source.py:249-250); this engine reads it.

Multi-file analysis = union of per-file reads
(``unionByName(allowMissingColumns=True)``), the reference's
sources_list semantics (structa/types.py:674-679).
"""

from __future__ import annotations

import json
import warnings
from typing import List

from pyspark.sql import DataFrame, SparkSession

from .detect import Sniff, ValidationWarning, sniff_file, spark_charset

#: charsets Spark's json/csv readers accept natively; anything else
#: (Shift_JIS, EUC-*, GB18030, KOI8-R, windows-125x from the prober)
#: needs spark.sql.legacy.javaCharsets plus an explicit lineSep —
#: '\n' is safe for every probed codec (none uses 0x0A as a trail
#: byte)
_BUILTIN_CHARSETS = {
    "us-ascii", "iso-8859-1", "utf-8", "utf-16", "utf-16be",
    "utf-16le", "utf-32", "utf-32be", "utf-32le",
}


def _needs_java_charset(spark: SparkSession, enc: str) -> bool:
    """True when `enc` needs the non-builtin charset path. Spark
    re-validates reader charsets at every ACTION (JSONOptionsInRead
    is rebuilt per execution from the live SQLConf), so the flag
    cannot be scoped to the read call of a lazy DataFrame — it is
    enabled for the remainder of the session, which only relaxes
    charset validation for this session's readers."""
    if enc.lower() in _BUILTIN_CHARSETS:
        return False
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    return True


def open_source(spark: SparkSession, path: str, *,
                format: str = "auto",
                encoding: str = "auto",
                csv_delimiter: str = "auto",
                csv_quotechar: str = "auto",
                yaml_safe: bool = True,
                json_strict: bool = True,
                sample_limit: int = 1 << 20) -> DataFrame:
    """Sniff + distributed read (same parameter surface as the
    reference's Source, structa/source.py:22-83). ``json_strict=False``
    tolerates unquoted control characters; ``yaml_safe=False`` is
    refused — arbitrary-object YAML has no distributed-safe parse."""
    s = sniff_file(path, sample_limit)
    fmt = s.format if format == "auto" else format
    enc = s.encoding if encoding == "auto" else encoding
    if encoding == "auto" and s.confidence < 0.9:
        warnings.warn(ValidationWarning(
            f"Low confidence ({s.confidence}) in detected character "
            f"set {s.encoding!r} for {path}"))
    py_enc = enc               # Python codec name (XML decodes in
    enc = spark_charset(enc)   # executors); Spark charset otherwise

    if fmt == "ndjson":
        rd = (spark.read.option("encoding", enc)
              .option("allowUnquotedControlChars", not json_strict))
        if _needs_java_charset(spark, enc):
            rd = rd.option("lineSep", "\n")
        return _fallback_if_corrupt(spark, rd.json(path), path)
    if fmt == "json":
        _needs_java_charset(spark, enc)
        df = (spark.read.option("multiLine", True)
              .option("allowUnquotedControlChars", not json_strict)
              .option("encoding", enc).json(path))
        return _fallback_if_corrupt(spark, df, path)
    if fmt == "csv":
        delim = s.csv_delimiter if csv_delimiter == "auto" else csv_delimiter
        quote = s.csv_quotechar if csv_quotechar == "auto" else csv_quotechar
        rd = (spark.read
              .option("header", bool(s.csv_header))
              .option("sep", delim or ",")
              .option("quote", quote or '"')
              .option("encoding", enc)
              .option("inferSchema", True))
        if _needs_java_charset(spark, enc):
            rd = rd.option("lineSep", "\n")
        return rd.csv(path)
    if fmt == "yaml":
        if not yaml_safe:
            raise NotImplementedError(
                "unsafe YAML (arbitrary objects) is not supported")
        return read_yaml(spark, path, encoding=enc)
    if fmt == "xml":
        return read_xml(spark, path, encoding=py_enc)
    raise NotImplementedError(f"format {fmt!r} not supported")


#: synthetic column wrapping a file whose payload is scalars (the
#: reference analyzes such a file as a plain list of values; a
#: DataFrame needs a named column — the CLI unwraps it at render time)
VALUE_COL = "__value__"


def _fallback_if_corrupt(spark: SparkSession, df: DataFrame,
                         path: str) -> DataFrame:
    """JSON whose top level is scalars (or an array of scalars) gives
    spark.read.json only a _corrupt_record column; re-read it as
    whole documents parsed in executors."""
    cols = set(df.columns)
    if cols and cols != {"_corrupt_record"}:
        return df
    return _read_json_documents(spark, path)


def _read_json_documents(spark: SparkSession, path: str) -> DataFrame:
    """Whole-document JSON parse in executors (parallel by file
    count); top-level arrays flatten to rows, scalar items are wrapped
    in VALUE_COL so the result is a DataFrame."""
    rdd = spark.sparkContext.wholeTextFiles(path)

    def parse(kv):
        import json as _j
        _, text = kv
        data = _j.loads(text)
        items = data if isinstance(data, list) else [data]
        for it in items:
            if isinstance(it, dict):
                yield _j.dumps(it)
            else:
                yield _j.dumps({VALUE_COL: it})

    return spark.read.json(rdd.flatMap(parse))


def read_yaml(spark: SparkSession, path: str,
              encoding: str = "utf-8") -> DataFrame:
    """Distributed YAML: wholeTextFiles ships each file to an
    executor, the YAML parse happens there, rows come back as JSON
    strings so Spark's schema inference stays in charge.

    Scale note: parallelism == file count (a single huge YAML document
    is inherently unsplittable, same as multiLine JSON)."""
    try:
        import yaml  # noqa: F401
    except ImportError as e:     # pragma: no cover
        raise NotImplementedError("pyyaml not available") from e

    rdd = spark.sparkContext.wholeTextFiles(path)

    def parse(kv):
        import yaml as _y
        _, text = kv
        data = _y.safe_load(text)
        items = data if isinstance(data, list) else [data]
        for item in items:
            if isinstance(item, dict):
                yield json.dumps(item)
            else:
                yield json.dumps({VALUE_COL: item})

    return spark.read.json(rdd.flatMap(parse))


def _strip_ns(t: str) -> str:
    """Tag name without its ``{namespace}`` prefix."""
    return t.rsplit("}", 1)[-1] if "}" in t else t


def _xml_list_tags(root) -> frozenset:
    """Tags that repeat under ANY parent in this document. These are
    forced to arrays EVERYWHERE in the document, so a field that is
    sometimes singular and sometimes repeated keeps ONE JSON type —
    otherwise Spark's schema inference would resolve the
    string-vs-array conflict by stringifying the arrays."""
    out, stack = set(), [root]
    while stack:
        el = stack.pop()
        seen = set()
        for c in el:
            t = _strip_ns(c.tag)
            if t in seen:
                out.add(t)
            seen.add(t)
            stack.append(c)
    return frozenset(out)


def _xml_element_to_obj(el, list_tags: frozenset = frozenset()):
    """One XML element -> plain Python object, xmltodict-style:
    attributes become ``@name`` keys, mixed/leaf text becomes
    ``#text`` (or the value itself for a pure-text leaf), repeated
    child tags group into arrays (forced for every tag in
    ``list_tags``, see :func:`_xml_list_tags`), namespace prefixes
    are stripped. All leaf values stay strings — XML is untyped
    text, and the analyzer's string-representation ladder (StrRepr
    of int/float/datetime) is exactly the right consumer for that."""
    obj = {"@" + _strip_ns(k): v for k, v in el.attrib.items()}
    children = list(el)
    text = (el.text or "").strip()
    if not children:
        if not obj:
            return text or None
        if text:
            obj["#text"] = text
        return obj
    grouped = {}
    for c in children:
        grouped.setdefault(_strip_ns(c.tag), []).append(
            _xml_element_to_obj(c, list_tags))
    for t, items in grouped.items():
        obj[t] = (items if len(items) > 1 or t in list_tags
                  else items[0])
    if text:
        obj["#text"] = text
    return obj


def read_xml(spark: SparkSession, path: str,
             encoding: str = "utf-8") -> DataFrame:
    """Distributed XML: binaryFiles ships each file's raw bytes to an
    executor, ElementTree parses them there (a bytes parse honors the
    BOM and the XML declaration's encoding), rows come back as JSON
    strings so Spark's schema inference stays in charge (same shape
    as ``read_yaml``). The reference declines XML entirely
    (structa/source.py:249-250); this engine reads it.

    Row semantics: a root whose children all share one tag with >= 2
    occurrences (``<rows><row>..</row><row>..</row></rows>``) yields
    one row per child — the standard export convention — else the
    whole document is a single row. Scalar rows are wrapped in
    VALUE_COL, mirroring the JSON/YAML scalar-payload path.

    Failure handling mirrors the JSON reader's PERMISSIVE mode: a
    payload expat cannot parse (after retrying with the sniffed
    ``encoding`` for charsets expat lacks) yields one
    ``_corrupt_xml`` row instead of failing the job (not named
    ``_corrupt_record`` — Spark's JSON reader reserves that column
    name and nulls it in parsed rows) — the sniffer
    routes anything '<'-leading here, including HTML.

    Scale note: parallelism == file count (one XML document is
    unsplittable, same as multiLine JSON). Entity-expansion attacks
    are bounded by expat's built-in billion-laughs amplification
    limits; external entities are never fetched by ElementTree."""
    rdd = spark.sparkContext.binaryFiles(path)

    def parse(kv):
        import json as _j
        import re as _re
        import xml.etree.ElementTree as _ET
        _, content = kv
        root = None
        try:
            root = _ET.fromstring(content)
        except _ET.ParseError:
            # expat natively decodes only UTF-8/16, ASCII and
            # latin-1; re-decode with the sniffed charset and strip
            # the declaration (ET refuses str input that declares an
            # encoding)
            try:
                txt = content.decode(encoding, errors="replace")
                txt = _re.sub(r"^\s*<\?xml[^>]*\?>", "", txt, count=1)
                root = _ET.fromstring(txt)
            except (_ET.ParseError, LookupError):
                root = None
        if root is None:
            yield _j.dumps({"_corrupt_xml":
                            content[:1024].decode("utf-8",
                                                  errors="replace")})
            return

        list_tags = _xml_list_tags(root)
        children = list(root)
        tags = {_strip_ns(c.tag) for c in children}
        if len(children) >= 2 and len(tags) == 1 and not root.attrib:
            items = [_xml_element_to_obj(c, list_tags)
                     for c in children]
        else:
            items = [_xml_element_to_obj(root, list_tags)]
        for it in items:
            if isinstance(it, dict):
                yield _j.dumps(it)
            else:
                yield _j.dumps({VALUE_COL: it})

    return spark.read.json(rdd.flatMap(parse))


def open_sources(spark: SparkSession, paths: List[str],
                 **kwargs) -> DataFrame:
    """Multi-file union with missing-column tolerance — the
    reference's 'files assumed to share a source' rule."""
    dfs = [open_source(spark, p, **kwargs) for p in paths]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
