"""Sized parquet sink: bounded file sizes at any scale.

The small-files problem is the classic 100 TB sink failure: a write
with P partition-column values receiving rows from T shuffle tasks
produces up to P x T files — millions of tiny files that throttle
the namenode and every subsequent scan's task scheduling. The dual
failure is one file per huge partition value: a single 2 TB file one
task must write (and one task must later read).

``write_sized`` bounds both ends: rows route to (partition value,
salt) groups where the salt fans each value over exactly the number
of files its row count warrants, and ``maxRecordsPerFile`` backstops
the estimate. Planned file count = ceil(value_rows /
records_per_file) PER VALUE — independent of task count and of how
the upstream job happened to partition.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _field_size_expr(dt, col):
    """Approximate serialized bytes of one value as a Column
    expression — evaluated EXECUTOR-side, so sizing never ships
    payload bytes to the driver."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.StringType, T.BinaryType)):
        return F.coalesce(F.octet_length(col), F.lit(0)) + F.lit(8)
    if isinstance(dt, T.BooleanType):
        return F.lit(1)
    if isinstance(dt, (T.NumericType, T.TimestampType,
                       T.TimestampNTZType, T.DateType)):
        return F.lit(8)
    if isinstance(dt, T.ArrayType):
        n = F.coalesce(F.size(col), F.lit(0))
        et = dt.elementType
        if isinstance(et, (T.StringType, T.BinaryType)):
            return F.coalesce(
                F.aggregate(col, F.lit(0), lambda a, x:
                            a + F.coalesce(F.octet_length(x), F.lit(0))),
                F.lit(0)) + n * 8 + F.lit(16)
        if isinstance(et, (T.NumericType, T.BooleanType)):
            return n * 8 + F.lit(16)
        return n * 64 + F.lit(16)
    if isinstance(dt, T.StructType):
        total = F.lit(8)
        for f in dt.fields:
            total = total + _field_size_expr(f.dataType, col[f.name])
        return total
    if isinstance(dt, T.MapType):
        # a flat guess here would let a 10 KB-per-row map column size
        # as 64 bytes and inflate records_per_file ~100x — the
        # giant-file failure; measure keys and values as arrays
        return (_field_size_expr(T.ArrayType(dt.keyType),
                                 F.map_keys(col))
                + _field_size_expr(T.ArrayType(dt.valueType),
                                   F.map_values(col)))
    return F.lit(64)                  # exotics: flat guess


def _sampled_row_bytes(df: DataFrame,
                       sample_rows: int = 1024) -> Optional[float]:
    """Measured bytes/row from a bounded sample: ``limit(N)`` then an
    executor-side aggregate over per-column size expressions
    (octet_length for strings/binary, fixed widths for scalars,
    element sums for arrays). Only ONE aggregated row reaches the
    driver — a 50 MB-payload media table sizes as cheaply as a table
    of ints. Returns None for an empty input."""
    parts = [_field_size_expr(f.dataType, F.col(f.name))
             for f in df.schema.fields]
    total = parts[0] if parts else F.lit(1)
    for p in parts[1:]:
        total = total + p
    row = (df.limit(sample_rows)
           .select(total.cast("double").alias("__sz__"))
           .agg(F.avg("__sz__").alias("avg_sz"))
           .collect()[0])
    if row.avg_sz is None:
        return None
    return max(1.0, float(row.avg_sz))


def estimate_row_bytes(df: DataFrame) -> float:
    """Bytes/row for file sizing, MEASURED from a bounded sample —
    never read from Catalyst plan statistics: the size-only stats
    visitor multiplies child sizes through joins, so a post-join
    plan can claim astronomically large bytes/row and collapse the
    records-per-file bound to 1 (one file per row — the exact
    small-files failure the sink exists to prevent). An empty input
    sizes as 1 byte/row."""
    est = _sampled_row_bytes(df)
    return 1.0 if est is None else est


def write_sized(df: DataFrame, path: str,
                partition_by: Sequence[str] = (),
                salt_col: Optional[str] = None,
                target_file_mb: int = 256,
                compression_ratio: float = 3.0,
                mode: str = "overwrite") -> int:
    """Write ``df`` as parquet under ``path`` with per-file sizes
    near ``target_file_mb``, regardless of upstream partitioning or
    partition-value skew. Returns the records-per-file bound used.

    How: estimate rows-per-file from a measured sample (in-memory
    bytes/row over ``compression_ratio`` — parquet's typical 3-5x),
    count rows per partition value (an aggregation bounded by the
    number of values), broadcast that tiny map back and salt each
    row by ``pmod(hash(salt_col), files_for_its_value)``. The final
    repartition on (partition columns, salt) puts each planned file
    in one task; ``maxRecordsPerFile`` backstops under-estimates.

    ``salt_col`` should be a stable row key (e.g. the doc id) so the
    file layout is deterministic across reruns; when omitted, an
    input-partition-derived salt is used (layout then depends on the
    upstream partitioning, though file SIZES stay bounded).

    Scale notes: the per-value count is one map-side-combined
    aggregation; the broadcast is #values rows; the repartition is
    the one unavoidable shuffle a size-governed layout needs. For
    bucketed-join layouts use ``write_bucketed`` instead — bucketing
    is catalog metadata and governs co-location, not file size.
    """
    partition_by = list(partition_by)
    # one materialization feeds the row count, the sampled sizing,
    # the per-value counts AND the write — without it an expensive
    # upstream pipeline (joins, dedup) would run up to 4x. Persist
    # and compute inside the SAME try so a failing count can never
    # leak the cache entry for the session lifetime.
    df = df.persist()
    try:
        total = df.count()
        # bytes/row is MEASURED from a sample, never taken from plan
        # statistics: Catalyst's size-only estimate multiplies child
        # sizes through joins, which would collapse records_per_file
        # to 1 and write one file per row (see estimate_row_bytes)
        bytes_per_row = (_sampled_row_bytes(df) or 1.0) if total \
            else 1.0
        records_per_file = max(
            1, int(target_file_mb * (1 << 20) * compression_ratio
                   / bytes_per_row))

        out = df
        if partition_by:
            per = (df.groupBy(*partition_by)
                   .agg(F.count(F.lit(1)).alias("__n__"))
                   .withColumn(
                       "__files__",
                       F.greatest(F.lit(1),
                                  F.ceil(F.col("__n__")
                                         / F.lit(records_per_file)))
                       .cast("int"))
                   .drop("__n__"))
            # LEFT join: an inner join would silently DROP every row
            # whose partition value is NULL (null keys never
            # equi-match); null-valued rows still belong in the write
            # (parquet puts them under __HIVE_DEFAULT_PARTITION__)
            # and get 1 file
            out = (out.join(F.broadcast(per), partition_by, "left")
                   .withColumn("__files__",
                               F.coalesce("__files__", F.lit(1))))
            if salt_col is not None:
                salt = F.pmod(F.abs(F.hash(F.col(salt_col))),
                              F.col("__files__"))
            else:
                salt = F.pmod(F.spark_partition_id(),
                              F.col("__files__"))
            out = (out.withColumn("__salt__", salt)
                   .repartition(*[F.col(c) for c in partition_by],
                                F.col("__salt__"))
                   .drop("__files__", "__salt__"))
        else:
            n_files = max(1, math.ceil(total / records_per_file))
            if salt_col is not None:
                out = (out.withColumn(
                    "__salt__",
                    F.pmod(F.abs(F.hash(F.col(salt_col))),
                           F.lit(n_files)))
                    .repartition(n_files, F.col("__salt__"))
                    .drop("__salt__"))
            else:
                out = out.repartition(n_files)

        w = (out.write.mode(mode)
             .option("maxRecordsPerFile", records_per_file))
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
    finally:
        df.unpersist()
    return records_per_file


def stream_compacted(sdf: DataFrame, path: str,
                     checkpoint: str,
                     partition_by: Sequence[str] = (),
                     salt_col: Optional[str] = None,
                     target_file_mb: int = 256,
                     trigger_available_now: bool = False):
    """Streaming ingest with size-governed files: route each
    microbatch through :func:`write_sized` via ``foreachBatch`` —
    the standard answer to streaming's small-files problem (a plain
    ``writeStream.parquet`` emits one file per task per microbatch,
    which at one 30-second trigger per day is ~3k tiny files per
    partition per day).

    Batches append; per-batch file counts follow the batch's own
    size, so a quiet microbatch writes one file, a burst fans out.
    Exactly-once caveat: ``foreachBatch`` re-runs a batch after a
    failure, and a plain parquet append is not idempotent — pair
    with downstream dedup (``incremental_dedup``) or a transactional
    table format in production; the checkpoint bounds the replay to
    the last batch.

    Returns the started ``StreamingQuery``.
    """
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # write_sized persists internally (its count / sizing /
        # per-value passes and the write share one materialization)
        if batch_df.isEmpty():
            return
        write_sized(batch_df, path, partition_by=partition_by,
                    salt_col=salt_col,
                    target_file_mb=target_file_mb,
                    mode="append")

    w = (sdf.writeStream.foreachBatch(write_batch)
         .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
