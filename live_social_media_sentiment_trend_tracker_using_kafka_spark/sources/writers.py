"""Batch sinks designed for the 100 TB layout: partitioned parquet for
pruning, bucketed tables for exchange-free joins.

The reference's only batch-readable sink is unpartitioned JSON-lines part
files (consumer/spark_streaming_job.py:151-161) that the dashboard re-reads
wholesale — no pruning, no co-location. These writers are the layouts a
large deployment actually reads from:

- ``write_partitioned``: hive-style directory partitioning (e.g. by event
  date) → partition pruning turns time-range scans into file skips.
- ``write_bucketed``: ``bucketBy(key)`` tables; two tables bucketed on the
  same key with the same bucket count join WITHOUT a shuffle exchange on
  either side (verified by plan assertion in tests/test_writers.py).
- ``compact``: repartition before write so output file count is controlled
  (the classic small-files problem of streaming sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned write; readers filtering on ``partition_by`` columns
    scan only matching directories.

    Overwrites are pinned to DYNAMIC partition overwrite: an incremental
    write of one day's partition replaces only the partitions present in
    ``df`` — under Spark's default STATIC mode the same call would truncate
    the whole path and silently delete every other existing partition.
    """
    (
        df.write.format(fmt)
        .mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .save(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table.

    Joins/aggregations on ``bucket_cols`` between tables sharing the layout
    skip the shuffle exchange entirely — the physical plan reads buckets
    pairwise. This is the batch analogue of Kafka partitioning-by-key.
    """
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def compact(df: DataFrame, num_files: int, by: list[str] | None = None) -> DataFrame:
    """Control output file count (repartition by key when given, else round
    robin) — pair with any writer to avoid the small-files problem."""
    return df.repartition(num_files, *by) if by else df.repartition(num_files)
