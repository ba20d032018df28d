"""A/B harness for the HOF quadratic-re-derivation fix.

Builds 200 docs x N tokens and times the token-pipeline operators
before/after the let-binding fix. Run: python scripts/hof_ab.py [n_tokens]
"""
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def main():
    n_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .appName("hof_ab").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa", "lam", "mu"]
    rows = []
    for d in range(200):
        toks = [words[(d * 7 + i * 3) % len(words)] + str((d + i) % 97)
                for i in range(n_tokens)]
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id int, text string").repartition(8)
    df.persist().count()

    from structa_spark.operators import text as T
    from structa_spark.operators import dedup as D
    from structa_spark.operators import sampling as S

    def timeit(name, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(f"{name:28s} {dt:8.2f}s  ({out})", flush=True)
        return dt

    timeit("bigram_logprob", lambda: T.bigram_logprob(df, persist=False)
           .agg(F.sum("n_bigrams")).collect()[0][0])
    timeit("word_shingles->explode", lambda: df.select(
        F.explode(D.word_shingles(F.col("text"), 3)).alias("s")).count())
    timeit("span_dup_per_doc", lambda: D.span_dup_per_doc(df, n=5)
           .agg(F.sum("n_spans")).collect()[0][0])
    timeit("dsir_hashed_counts", lambda: S._hashed_ngram_counts(
        df, 1024, "doc_id", "text").count())
    timeit("chunk_passages", lambda: T.chunk_passages(df, k=32).count())
    timeit("chunk_windows", lambda: T.chunk_windows(df, 32, 16).count())
    timeit("fingerprint", lambda: T.fingerprint(df, k=8)
           .agg(F.sum("fingerprint")).collect()[0][0])
    timeit("char_shingles->explode", lambda: df.select(
        F.explode(D.char_shingles(F.col("text"), 5)).alias("s")).count())
    timeit("winnow_fingerprints", lambda: D.winnow_fingerprints(df, k=8, w=16)
           .count())
    spark.stop()


if __name__ == "__main__":
    main()
