"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join is shuffling both
sides on the join key. Writing both tables bucketed by that key
moves the partitioning to WRITE time: every subsequent join on the
key reads co-located buckets and the sort-merge join runs with NO
exchange — the classic pay-once layout for a join-heavy star schema
or a repeatedly-self-joined event table.

``sortBy`` note: Spark exploits per-bucket SORTEDNESS (eliding the
join's per-bucket sort) only when each bucket consists of a single
file; an ordinary multi-partition write produces several files per
bucket, and the plan then still sorts each side. The shuffle
elimination — the expensive half — holds regardless; compact each
bucket to one file (one write task per bucket) when the sort matters
too.

Bucket-count discipline: both sides must use the same bucket count
(or one a multiple of the other with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``); pick a count
sized so one bucket of the LARGER table fits an executor's memory —
for a 100 TB fact table and 512 MB target buckets that is ~200k
buckets, well within Spark's supported range.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, keys: Sequence[str],
                   n_buckets: int, path: Optional[str] = None,
                   sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) parquet
    table in the session catalog. ``path`` makes it an external
    table (the metadata still lives in the catalog — bucketing info
    is catalog metadata, which is why a bare ``.parquet(path)`` write
    cannot produce a bucketed table)."""
    w = (df.write.mode("overwrite")
         .bucketBy(n_buckets, *keys))
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)


def bucketed_join(spark: SparkSession, left: str, right: str,
                  on: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys —
    reads co-located buckets, so the plan contains no Exchange for
    either side (assert-able via ``.explain``)."""
    return spark.table(left).join(spark.table(right), list(on), how)
