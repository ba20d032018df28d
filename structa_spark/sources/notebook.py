"""Jupyter notebook (``.ipynb``) ingestion — the code-corpus
landing zone for notebooks, beside the PDF/office/markdown paths.

Spark-first: a notebook is ONE JSON document, so parsing never
leaves the JVM — two typed ``from_json`` reads of the payload (one
per real-world ``source`` encoding), a ``posexplode`` over the cell
array, and codegen'd string folds. No Python UDF, no Arrow batch;
the JSON parser itself prunes every subtree the schemas do not
mention (outputs, attachments, execution counts), so multi-megabyte
embedded outputs are skipped, not materialized.

Real-world variance handled (nbformat 3 and 4):

* ``source`` is either a list of line strings or one plain string —
  the list-typed parse nulls the string variant and vice versa is
  recovered from the string-typed parse, so both coalesce;
* nbformat 3 code cells store ``input`` instead of ``source``;
* kernel language comes from ``metadata.kernelspec.language`` with
  the nbformat-3 ``metadata.language`` fallback.

The reference engine loads JSON documents generically
(/root/reference/structa/source.py:226-254) but has no
notebook-aware cell model; this module exceeds it for code-pipeline
parity (The-Stack-style corpora treat notebooks as first-class).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Typed views of the same JSON: the "list source" nbformat-4 shape
# (with the nbformat-3 ``input`` sibling) and the "plain string
# source" variant some exporters emit. Fields absent from a given
# notebook parse as null; fields whose JSON type mismatches the
# schema parse as null without poisoning their siblings (verified
# behavior of Spark's PERMISSIVE JSON reader).
_LIST_SCHEMA = (
    "struct<nbformat:int,"
    "metadata:struct<kernelspec:struct<language:string>,"
    "language:string>,"
    "cells:array<struct<cell_type:string,source:array<string>,"
    "input:array<string>>>>"
)
_STR_SCHEMA = (
    "struct<cells:array<struct<cell_type:string,source:string,"
    "input:string>>>"
)


def notebook_cells(df: DataFrame, json_col: str = "payload_json",
                   keep_cols=("doc_id",)) -> DataFrame:
    """Explode notebooks into typed cells.

    Returns one row per cell: ``keep_cols`` passthrough plus
    ``nbformat``, ``kernel_lang``, ``cell_idx`` (0-based, notebook
    order), ``cell_type`` and ``cell_text`` (source lines joined
    exactly as stored — nbformat keeps the newlines inside the line
    strings, so the join separator is empty).

    Scale shape: one projection + one generator (``posexplode``) —
    no shuffle, no Python; a corpus of notebooks flattens into a
    cell relation at scan speed and every downstream screen
    (license, quality, dedup) applies unchanged to ``cell_text``.
    """
    a = F.from_json(F.col(json_col), _LIST_SCHEMA)
    b = F.from_json(F.col(json_col), _STR_SCHEMA)
    base = df.select(
        *keep_cols,
        a["nbformat"].alias("nbformat"),
        F.coalesce(a["metadata"]["kernelspec"]["language"],
                   a["metadata"]["language"]).alias("kernel_lang"),
        a["cells"].alias("__a"),
        b["cells"].alias("__b"),
    )
    exploded = base.select(
        *keep_cols, "nbformat", "kernel_lang",
        F.posexplode_outer("__a").alias("cell_idx", "__ac"),
        F.col("__b").alias("__b"),
    )
    ac = F.col("__ac")
    bc = F.try_element_at(F.col("__b"), F.col("cell_idx") + F.lit(1))
    text = F.coalesce(
        F.when(ac["source"].isNotNull(),
               F.concat_ws("", ac["source"])),
        bc["source"],
        F.when(ac["input"].isNotNull(),
               F.concat_ws("", ac["input"])),
        bc["input"],
    )
    return exploded.select(
        *keep_cols, "nbformat", "kernel_lang", "cell_idx",
        ac["cell_type"].alias("cell_type"),
        text.alias("cell_text"),
    )


def notebook_json(text: Column, code: Column = None,
                  language: str = "python") -> Column:
    """Writer twin for round-trip tests and fixture wrapping: build
    a structurally-valid nbformat-4 notebook (kernelspec metadata, a
    markdown cell holding ``text`` as its source lines, and a code
    cell) as ONE ``to_json`` expression — JSON escaping is the
    engine's, so any payload round-trips byte-exactly through
    :func:`notebook_cells`."""
    if code is None:
        code = F.lit("print('ok')")
    cell = lambda kind, src: F.struct(  # noqa: E731
        F.lit(kind).alias("cell_type"), src.alias("source"))
    return F.to_json(F.struct(
        F.lit(4).alias("nbformat"),
        F.struct(
            F.struct(F.lit(language).alias("language"))
            .alias("kernelspec")).alias("metadata"),
        F.array(
            cell("markdown", F.array(F.lit("# Title\n"), text)),
            cell("code", F.array(code)),
        ).alias("cells")))
