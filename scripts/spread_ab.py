#!/usr/bin/env python
"""A/B isolation for the single-row-group scan spread (commit
18fc029): times each named bench-suite entry with the spread ON and
OFF inside ONE session, alternating arms pass-by-pass so box drift
hits both arms equally. The timed action is the bench's `.count()`
(the judged metric). Usage:

    python scripts/spread_ab.py query1 query2 ...

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_OPT_RUNS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_RUNS = int(os.environ.get("SPARK_GRAFT_OPT_RUNS", "3"))


def main():
    names = sys.argv[1:]

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
             .appName("structa-spark-spread-ab")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from opt_measure import _make_suite
    suite = _make_suite(spark)

    out = {}
    for name in names:
        fn = suite[name]
        res = {}
        for arm in ("1", "0"):           # warm both arms, discarded
            os.environ["SPARK_GRAFT_SPREAD"] = arm
            spark.sparkContext.setJobDescription(f"ab:{name}:warm{arm}")
            fn()
        for arm in ("1", "0"):
            res[arm] = []
        for _ in range(N_RUNS):
            for arm in ("1", "0"):
                os.environ["SPARK_GRAFT_SPREAD"] = arm
                spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
                t0 = time.time()
                fn()
                res[arm].append(round(time.time() - t0, 3))
        out[name] = {
            "spread_min": min(res["1"]), "nospread_min": min(res["0"]),
            "spread": res["1"], "nospread": res["0"],
            "loadavg": round(os.getloadavg()[0], 1),
        }
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    os.environ.pop("SPARK_GRAFT_SPREAD", None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
