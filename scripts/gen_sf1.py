#!/usr/bin/env python
"""Generate a local sf1-equivalent bench fixture (10x sf0.1) under
spark-warehouse/sf1 — the THIRD point of bench.py's row-count scale
ladder, so exponent fits stop extrapolating from two points and AQE
runs at real partition counts.

This is a BENCH fixture, not driver data: /root/testdata stays the
only input for correctness (TESTDATA.md forbids regenerating it), the
output directory is gitignored, and bench.py simply skips the upper
tier when the fixture is absent.

Construction: ten deterministic copies of every sf0.1 table (copy 0
is the identity, so sf0.1 is a subset), preserving each table's
distributions while keeping the copies from interfering with each
other's algorithmic structure:

* fact/dim keys shift by a copy stride far above the key range, so
  joins, groupings and sessionization stay within-copy;
* region/nation are fixed-size dimensions at every TPC-H scale
  factor and are copied once, unchanged;
* document texts remap their (31-word) vocabulary through a per-copy
  permutation: within-copy duplicate/near-dup structure is preserved
  EXACTLY (equal docs stay equal), while cross-copy shingle sets are
  disjoint — naive 10x text duplication would hand the dedup benches
  a fake 10x near-dup explosion;
* embeddings multiply by a per-copy deterministic +-1 sign pattern:
  within-copy dot products and norms are bit-preserved (signs cancel
  pairwise), cross-copy cosines decorrelate — naive duplication
  would do to ANN/SemDeDup what text duplication does to dedup;
* event timestamps keep their range (10x traffic density), ids and
  users shift per copy.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF1_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get(
    "SPARK_GRAFT_SF1_OUT",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "spark-warehouse", "sf1"))
COPIES = int(os.environ.get("SPARK_GRAFT_SF1_COPIES", "10"))

STRIDES = {
    "c_custkey": 1_000_000, "s_suppkey": 1_000_000,
    "p_partkey": 1_000_000, "o_orderkey": 10_000_000,
    "o_custkey": 1_000_000, "l_orderkey": 10_000_000,
    "l_partkey": 1_000_000, "l_suppkey": 1_000_000,
    "event_id": 10_000_000, "user_id": 1_000_000,
    "doc_id": 1_000_000, "vec_id": 1_000_000,
}

EMB_DIM = 64


def _sign_pattern(k: int):
    # deterministic balanced-ish +-1 pattern per copy; copy 0 is all
    # +1 (identity) so sf0.1 rows survive verbatim
    if k == 0:
        return [1.0] * EMB_DIM
    return [1.0 if ((i * 2654435761 + k * 40503) >> 3) % 2 == 0
            else -1.0 for i in range(EMB_DIM)]


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from structa_spark.sources.tables import load_table

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .appName("gen-sf1").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    os.makedirs(OUT, exist_ok=True)

    # per-copy vocabulary permutation for documents: 31 is prime, so
    # any multiplier in 1..30 is a bijection mod 31
    vocab = sorted(r.t for r in load_table(spark, SRC, "documents")
                   .select(F.explode(F.split("text", " ")).alias("t"))
                   .distinct().collect())
    V = len(vocab)

    def remap_expr(k: int):
        if k == 0:
            return F.col("text")
        a = (3 * k + 1) % V or 1
        # i -> i*a + k is a bijection mod V ONLY when gcd(a, V) == 1;
        # the default fixture's V=31 is prime so any a in 1..30
        # works, but an overridden SPARK_GRAFT_SF1_SRC with composite
        # vocab size would silently collapse words and break the
        # claimed within-copy dup preservation — search up to the
        # next coprime multiplier instead
        import math
        while math.gcd(a, V) != 1:
            a = (a + 1) % V or 1
        mapping = {w: vocab[(i * a + k) % V]
                   for i, w in enumerate(vocab)}
        m = F.create_map(*[F.lit(x) for kv in mapping.items()
                           for x in kv])
        return F.concat_ws(" ", F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.coalesce(F.element_at(m, t), t)))

    def shifted(df, k: int):
        out = df
        for c in df.columns:
            if c in STRIDES:
                out = out.withColumn(
                    c, (F.col(c) + F.lit(k * STRIDES[c]))
                    .cast(dict(df.dtypes)[c]))
        return out

    plain = ["customer", "supplier", "part", "orders", "lineitem",
             "events"]
    for name in plain + ["region", "nation", "documents",
                         "embeddings"]:
        src = load_table(spark, SRC, name)
        if name in ("region", "nation"):
            copies = [src]          # fixed-size dims at any sf
        elif name == "documents":
            copies = []
            for k in range(COPIES):
                t = remap_expr(k)
                copies.append(shifted(src, k).select(
                    "doc_id", t.alias("text"), "lang", "source",
                    F.length(t).cast("long").alias("n_chars")))
        elif name == "embeddings":
            copies = []
            for k in range(COPIES):
                s = F.lit(_sign_pattern(k))
                copies.append(shifted(src, k).select(
                    "vec_id",
                    F.zip_with("embedding", s,
                               lambda a, b: a * b)
                    .cast("array<float>").alias("embedding"),
                    "label"))
        else:
            copies = [shifted(src, k) for k in range(COPIES)]
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        (df.repartition(8)
         .write.mode("overwrite")
         .parquet(os.path.join(OUT, f"{name}.parquet")))
        print(f"{name}: {spark.read.parquet(os.path.join(OUT, f'{name}.parquet')).count()} rows")

    spark.stop()
    print(f"sf1 fixture written to {OUT}")


if __name__ == "__main__":
    main()
