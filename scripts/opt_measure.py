#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds.

Usage:
    python scripts/opt_measure.py SUFFIX query1 query2 ...

For each named bench-suite entry this times the query in isolation
with the noop sink (guide section 1.4: eagerly computes every column
of every row, no sink cost, no count-driven pruning) over N passes
(min reported), labels the jobs, and writes the formatted physical
plan to plans/r11/<name>_<SUFFIX>.txt so plan claims are auditable
without running Spark.

Profile entries (no single DataFrame) are timed around their full
inference loop instead and dump no plan.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_OPT_RUNS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_RUNS = int(os.environ.get("SPARK_GRAFT_OPT_RUNS", "3"))
# plan-only mode: dump .explain("formatted") without executing —
# for capturing the "before" plan of a change cheaply
PLAN_ONLY = os.environ.get("SPARK_GRAFT_OPT_PLAN_ONLY", "0") == "1"


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled",
                     "true")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .appName("structa-spark-opt-measure")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    sys.modules.setdefault("__bench__", bench)
    # rebuild the bench suite against this session
    import importlib
    suite = _make_suite(spark)

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"))
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = suite[name]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        if hasattr(fn, "_df"):
            df = fn._df()
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(os.path.join(plans_dir,
                                   f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
            if PLAN_ONLY:
                print(json.dumps({name: "plan dumped"}), flush=True)
                continue
            # warm-up (codegen/class-load) pass, discarded
            df.write.format("noop").mode("overwrite").save()
            # timed passes include the BUILDER (training loops /
            # driver-side model fits run inside fn._df()), matching
            # what bench.py times; the sink is noop, not count
            ts = []
            for _ in range(N_RUNS):
                t0 = time.time()
                df = fn._df()
                df.write.format("noop").mode("overwrite").save()
                ts.append(round(time.time() - t0, 3))
        else:
            fn()  # warm-up
            ts = []
            for _ in range(N_RUNS):
                t0 = time.time()
                fn()
                ts.append(round(time.time() - t0, 3))
        out[name] = {"min": min(ts), "passes": ts,
                     "loadavg": round(os.getloadavg()[0], 1)}
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(out))
    spark.stop()


def _make_suite(spark):
    """Re-create bench.py's suite dict against an existing session
    (bench.main builds its own session, so inline the construction
    by importing the query registry the same way)."""
    import bench as _b  # noqa: F401 - path side effect

    # Reuse bench.py's make_suite by executing main()'s preamble is
    # not factored out; replicate the tiny wrapper here instead.
    from structa_spark import analyze
    from structa_spark.operators import dedup, similarity
    from structa_spark.queries import REGISTRY
    from structa_spark.sources.tables import load_table

    sf_dir = SF_DIR

    suite = {}

    def df_thunk(build):
        def thunk():
            return build().count()
        thunk._df = build
        return thunk

    # map bench entry name -> registry query name where they differ
    import re
    import bench as b
    src = open(b.__file__).read()
    body = src[src.index("def make_suite"):src.index("suite = make_suite")]
    for m in re.finditer(r'"([a-z0-9_]+)":\s*run_df\(([a-z0-9_]+)\)',
                         body):
        entry, qname = m.groups()
        fn = REGISTRY[qname][0]
        suite[entry] = df_thunk(
            lambda f=fn: f(spark, sf_dir))

    def bench_profile():
        p = analyze(load_table(spark, sf_dir, "lineitem"))
        return p.row_count

    def bench_profile_docs():
        p = analyze(load_table(spark, sf_dir, "documents"))
        return p.row_count

    suite["profile_lineitem"] = bench_profile
    suite["profile_documents"] = bench_profile_docs
    suite["minhash_candidates"] = df_thunk(
        lambda: dedup.minhash_candidates(
            load_table(spark, sf_dir, "documents")))
    suite["simhash_pairs"] = df_thunk(
        lambda: dedup.simhash_near_duplicates(
            load_table(spark, sf_dir, "documents")))
    suite["neardup_lsh"] = df_thunk(
        lambda: similarity.embedding_near_duplicates(
            load_table(spark, sf_dir, "embeddings"),
            threshold=0.9, use_lsh=True))

    def _containment_df():
        d = load_table(spark, sf_dir, "documents")
        cands = dedup.minhash_candidates(d)
        return dedup.containment_pairs(
            d, threshold=0.5, candidates=cands)

    suite["containment"] = df_thunk(_containment_df)
    suite["winnow_overlap"] = df_thunk(
        lambda: dedup.winnow_overlap_pairs(
            load_table(spark, sf_dir, "documents"),
            min_shared=8, max_postings=100))
    return suite


if __name__ == "__main__":
    main()
