#!/usr/bin/env python
"""Standalone quiet-box re-measure of the two round-9 `weak` flags
(`unigram_vocab` = unigram_tokenizer_vocab, `host_hits` =
host_hits_scores): the driver's r9 rerun recorded 12.63 s / 13.25 s
under loadavg 12-18, where the committed quiet-box artifact reads
0.63 s / 1.75 s. Protocol is the one that cleared ccnet_buckets in
round 9 (BENCH_remeasure_r09.json): min-of-7 at sf0.1 after a
discarded warm-up, shared cache cleared between passes, loadavg
recorded per pass, plus min-of-3 per scale tier (sf0.01 / sf0.1 /
local sf1 fixture) for a 3-point row-count exponent fit."""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .appName("structa-spark-remeasure-r10")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from structa_spark.operators._cache import clear_caches
    from structa_spark.queries import (
        host_hits_scores, unigram_tokenizer_vocab,
    )

    targets = {
        "unigram_vocab": unigram_tokenizer_vocab,
        "host_hits": host_hits_scores,
    }
    tiers = {
        "0.01": "/root/testdata/sf0.01",
        "0.1": "/root/testdata/sf0.1",
    }
    sf1 = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "spark-warehouse", "sf1")
    if os.path.isdir(sf1):
        tiers["1.0"] = sf1

    out = {"protocol": ("min-of-7 at sf0.1 after discarded warmup; "
                        "min-of-3 per tier for the exponent; shared "
                        "cache cleared between passes; standalone "
                        "quiet box")}
    for label, fn in targets.items():
        # discarded warm-up (codegen + class loading)
        fn(spark, tiers["0.1"]).count()
        clear_caches()
        passes, loads = [], []
        rows = None
        for _ in range(7):
            loads.append(round(os.getloadavg()[0], 1))
            t0 = time.time()
            rows = fn(spark, tiers["0.1"]).count()
            passes.append(round(time.time() - t0, 3))
            clear_caches()
        tier_mins = {}
        for sf_label, sf_dir in tiers.items():
            fn(spark, sf_dir).count()  # warm
            clear_caches()
            best = None
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                clear_caches()
            tier_mins[sf_label] = round(best, 3)
        entry = {
            "standalone_passes": passes,
            "min": min(passes),
            "median": sorted(passes)[3],
            "loadavg": loads,
            "rows": rows,
            "tier_mins": tier_mins,
        }
        xs = [math.log(float(k)) for k in tier_mins]
        ys = [math.log(v) for v in tier_mins.values()]
        if len(xs) >= 2:
            mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
            denom = sum((x - mx) ** 2 for x in xs)
            entry["exponent_3pt"] = round(
                sum((x - mx) * (y - my)
                    for x, y in zip(xs, ys)) / denom, 2)
        out[label] = entry
        print(label, json.dumps(entry))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_remeasure_r10.json")
    with open(path, "w") as fh:
        json.dump(out, fh)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
