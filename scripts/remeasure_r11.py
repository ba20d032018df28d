#!/usr/bin/env python
"""Standalone quiet-box re-measure of the round-10 `weak` flag
(`asof_join` = asof_purchase_click, committed median 1.20 s vs the
r9 quiet-box 0.54 s — passes 0.40/1.73/1.20 s, fingerprint
unchanged) plus the two widest pass spreads of the r10 artifact
(`video_dedup` = video_dup_groups, 5.75-17.99 s across passes;
`fuzzy_decontam` = fuzzy_contamination_pairs, 1.89-28.67 s), which
VERDICT r10 asked to batch into the same remeasure. Protocol is the
one that cleared ccnet_buckets (r9) and unigram_vocab/host_hits
(r10): min-of-7 at sf0.1 after a discarded warm-up, shared cache
cleared between passes, loadavg recorded per pass, plus min-of-3 per
scale tier (sf0.01 / sf0.1 / local sf1 fixture) for a 3-point
row-count exponent fit."""

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
             .appName("structa-spark-remeasure-r11")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from structa_spark.operators._cache import clear_caches
    from structa_spark.queries import (
        asof_purchase_click, fuzzy_contamination_pairs,
        video_dup_groups,
    )

    targets = {
        "asof_join": asof_purchase_click,
        "video_dedup": video_dup_groups,
        "fuzzy_decontam": fuzzy_contamination_pairs,
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
        os.path.abspath(__file__))), "BENCH_remeasure_r11.json")
    with open(path, "w") as fh:
        json.dump(out, fh)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
