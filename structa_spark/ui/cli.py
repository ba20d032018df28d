"""Command-line interface: ``python -m structa_spark <files>``.

Same user surface as the reference CLI (reference: structa/ui/cli.py:
68-234): analyze one or more JSON/NDJSON/CSV/YAML/XML files (format
auto-detected per file) and print the inferred structure. Multiple
files are assumed to share a source and are analyzed as a union
(reference ui/cli.py:73-76). ``--indent`` reproduces the reference
display's multi-line nested layout and ``--color`` its ANSI styling
(cyan types / yellow patterns / green suffixes / underlined unique —
reference ui/cli.py:271-278, ui/cli.xsl) without the XSLT detour:
the renderer styles nodes directly.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
from typing import List, Optional

from . import params


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="structa-spark",
        description="Analyze files/datasets for common structure "
                    "(Spark-distributed).")
    p.add_argument("files", nargs="+",
                   help="files to analyze; '-' reads stdin")
    p.add_argument("--version", action="version",
                   version="structa-spark 0.1.0")
    p.add_argument("-B", "--bad-threshold", type=params.num, default="1%",
                   help="tolerated conversion failures (default 1%%)")
    p.add_argument("-E", "--empty-threshold", type=params.num,
                   default="99%",
                   help="tolerated blank strings (default 99%%)")
    p.add_argument("-N", "--null-threshold", type=params.num,
                   default="99%",
                   help="tolerated nulls (default 99%%)")
    p.add_argument("-F", "--field-threshold", type=int, default=20,
                   help="record-vs-table distinct key gate (default 20)")
    p.add_argument("-M", "--merge-threshold", type=params.num,
                   default="50%",
                   help="record-collapse similarity gate (default 50%%)")
    p.add_argument("--max-numeric-len", type=int, default=30,
                   help="longest string to try conversions on")
    p.add_argument("--sample-bytes", type=params.size, default="1m",
                   help="bytes sniffed for encoding/format detection")
    p.add_argument("-e", "--encoding", default="auto")
    p.add_argument("-f", "--format", default="auto",
                   choices=["auto", "json", "ndjson", "csv", "yaml",
                            "xml", "parquet"])
    p.add_argument("--csv-format", default=None, metavar="FIELD[QUOTE]",
                   help="CSV delimiter + optional quote char, e.g. ';' "
                        "or ',\"' (overrides the sniffer)")
    p.add_argument("--csv-delimiter", default="auto")
    p.add_argument("--csv-quotechar", default="auto")
    p.add_argument("--no-yaml-safe", action="store_false",
                   dest="yaml_safe", help="(refused: unsafe YAML has "
                   "no distributed-safe parse)")
    p.add_argument("--no-json-strict", action="store_false",
                   dest="json_strict",
                   help="tolerate unquoted control chars in JSON")
    # display toggles (reference ui/cli.py:120-158)
    p.add_argument("--show-count", action="store_true",
                   help="show per-field occurrence counts")
    p.add_argument("--show-lengths", action="store_true",
                   help="show string/container length ranges")
    p.add_argument("--show-samples", action="store_true",
                   help="show most/least-frequent value samples")
    p.add_argument("--show-graph", action="store_true",
                   help="show the 10-char quartile position graph")
    p.add_argument("--str-limit", type=int, default=20,
                   help="truncate displayed strings to this length")
    p.add_argument("--indent", action="store_true",
                   help="multi-line indented layout for nested "
                        "structures (the reference display's default)")
    p.add_argument("--color", choices=["auto", "always", "never"],
                   default="auto",
                   help="ANSI styling: cyan types, yellow patterns, "
                        "green suffixes, underlined unique columns "
                        "(auto = only when stdout is a tty)")
    p.add_argument("--timestamps", type=params.parse_epoch,
                   default="unix", metavar="EPOCH",
                   help="'unix', 'excel', or e.g. 'days since "
                        "1970-01-01' — how numbers decode to datetimes")
    p.add_argument("--min-timestamp",
                   type=params.parse_duration_or_timestamp, default=None,
                   help="oldest plausible auto-detected timestamp "
                        "(absolute, or a duration before now)")
    p.add_argument("--max-timestamp",
                   type=params.parse_duration_or_timestamp, default=None)
    p.add_argument("--no-strip-whitespace", action="store_false",
                   dest="strip_whitespace",
                   help="don't trim strings before analysis")
    p.add_argument("--json", action="store_true", dest="json_out",
                   help="emit the summary tree as JSON instead of text")
    p.add_argument("--no-merge", action="store_true",
                   help="skip the record-collapse merge fixpoint")
    p.add_argument("--exact", action="store_true",
                   help="exact quartiles/distincts instead of sketches")
    p.add_argument("--master", default=None,
                   help="Spark master (default: local[*])")
    p.add_argument("--save-profile", metavar="PATH", default=None,
                   help="persist the full-fidelity profile as JSON "
                        "(reload with Profile.load / --diff)")
    p.add_argument("--diff", metavar="PATH", default=None,
                   help="load a previously saved profile and print "
                        "the schema-drift report against THIS run "
                        "instead of the summary")
    return p


def get_config(argv: Optional[List[str]] = None) -> argparse.Namespace:
    return get_parser().parse_args(argv)


def get_structure(cfg: argparse.Namespace, spark=None) -> str:
    from pyspark.sql import SparkSession

    from .. import analyze, AnalyzerConfig, merge_to_fixpoint
    from ..sources.reader import open_sources

    own_session = spark is None
    if own_session:
        spark = (SparkSession.builder
                 .master(cfg.master or "local[*]")
                 .config("spark.sql.adaptive.enabled", "true")
                 .config("spark.sql.session.timeZone", "UTC")
                 .config("spark.ui.enabled", "false")
                 .appName("structa-spark").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
    try:
        epoch_name, scale, base = cfg.timestamps
        acfg = AnalyzerConfig(
            bad_threshold=cfg.bad_threshold,
            empty_threshold=cfg.empty_threshold,
            null_threshold=cfg.null_threshold,
            field_threshold=cfg.field_threshold,
            merge_threshold=cfg.merge_threshold,
            max_numeric_len=cfg.max_numeric_len,
            strip_whitespace=cfg.strip_whitespace,
            exact=cfg.exact,
            epoch=epoch_name, epoch_base=base, scale=scale,
            min_timestamp=cfg.min_timestamp,
            max_timestamp=cfg.max_timestamp,
        )
        csv_delim, csv_quote = cfg.csv_delimiter, cfg.csv_quotechar
        if cfg.csv_format:
            csv_delim = cfg.csv_format[0]
            if len(cfg.csv_format) > 1:
                csv_quote = cfg.csv_format[1]
        paths, cleanup = [], []
        for f in cfg.files:
            if f == "-":
                tmp = tempfile.NamedTemporaryFile(
                    "wb", suffix=".stdin", delete=False)
                tmp.write(sys.stdin.buffer.read())
                tmp.close()
                paths.append(tmp.name)
                cleanup.append(tmp.name)
            else:
                paths.append(f)
        try:
            if cfg.format == "parquet":
                df = spark.read.parquet(*paths)
            else:
                df = open_sources(
                    spark, paths, format=cfg.format,
                    encoding=cfg.encoding,
                    csv_delimiter=csv_delim,
                    csv_quotechar=csv_quote,
                    yaml_safe=cfg.yaml_safe,
                    json_strict=cfg.json_strict,
                    sample_limit=cfg.sample_bytes)
            profile = analyze(df, acfg)
            root = profile.root
            if not cfg.no_merge:
                root = merge_to_fixpoint(root, acfg)
            if getattr(cfg, "save_profile", None) or \
                    getattr(cfg, "diff", None):
                from ..analyzer import Profile
                from ..serialize import load_profile, save_profile
                merged = Profile(root=root,
                                 row_count=profile.row_count,
                                 cfg=acfg)
                # load the diff baseline BEFORE saving: the rolling-
                # baseline one-liner passes the SAME path to both
                # flags, and save-first would overwrite yesterday's
                # profile and then diff the run against itself. A
                # missing baseline (the bootstrap run) is not an
                # error — save still happens and the diff reports
                # that there is nothing to compare against yet.
                baseline = missing = None
                if cfg.diff:
                    try:
                        baseline = load_profile(cfg.diff)
                    except FileNotFoundError:
                        # tolerated ONLY for the rolling bootstrap
                        # (this same run writes the baseline). A
                        # missing baseline that this run will NOT
                        # create — e.g. a typo'd path in a monitor —
                        # must stay a hard error, or exit-code-based
                        # alerting is silently disabled forever
                        if cfg.save_profile != cfg.diff:
                            raise
                        missing = cfg.diff
                if cfg.save_profile:
                    save_profile(merged, cfg.save_profile)
                if missing is not None:
                    if getattr(cfg, "json_out", False):
                        # an OBJECT, not an (empty) change list — a
                        # monitor must be able to tell "no drift"
                        # from "nothing to compare against" (typo'd
                        # or bootstrap baseline path)
                        import json as _json
                        return _json.dumps({"no_baseline": missing})
                    return f"(no baseline at {missing})"
                if baseline is not None:
                    from dataclasses import asdict

                    from ..diff import diff_profiles, render_diff
                    changes = diff_profiles(baseline, merged)
                    if getattr(cfg, "json_out", False):
                        import json as _json
                        return _json.dumps(
                            [dict(asdict(c), path=list(c.path))
                             for c in changes], indent=2)
                    return render_diff(changes)
            # a scalar-payload file was wrapped in a synthetic column;
            # render it the way the reference shows a list of values
            from ..model import RecordT, RenderOptions, node_to_dict
            from ..sources.reader import VALUE_COL
            wrapped = (isinstance(root, RecordT) and len(root.fields) == 1
                       and root.fields[0].key == VALUE_COL)
            if getattr(cfg, "json_out", False):
                import json as _json
                node = root.fields[0].value if wrapped else root
                return _json.dumps(node_to_dict(node), indent=2)
            from ..model import ANSI_STYLES, Styles
            color = getattr(cfg, "color", "never")
            use_color = (color == "always"
                         or (color == "auto" and sys.stdout.isatty()))
            ropts = RenderOptions(
                show_count=cfg.show_count,
                show_lengths=cfg.show_lengths,
                show_samples=cfg.show_samples,
                show_graph=cfg.show_graph,
                str_limit=cfg.str_limit,
                indent=getattr(cfg, "indent", False),
                styles=ANSI_STYLES if use_color else Styles())
            if wrapped:
                return f"[ {root.fields[0].value.render(ropts)} ]"
            return root.render(ropts)
        finally:
            for t in cleanup:
                os.unlink(t)
    finally:
        if own_session:
            spark.stop()


def main(argv: Optional[List[str]] = None, spark=None) -> int:
    cfg = get_config(argv)
    print(get_structure(cfg, spark=spark))
    return 0


if __name__ == "__main__":     # pragma: no cover
    sys.exit(main())
