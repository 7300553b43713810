"""Physical-layout utilities: partition-count hygiene.

A small parquet file scans as ONE partition (files.maxPartitionBytes), so a
CPU-bound per-row operator (hashing, array folds, Pandas UDFs) would run on a
single core regardless of cluster size. `ensure_parallelism` round-robins the
input across the default parallelism when — and only when — the scan is
under-partitioned; at real scale (thousands of input splits) it's a no-op, so
the same operator code is correct at sf0.001 and at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the current plan has fewer partitions than the
    session's default parallelism.

    Streaming DataFrames have no driver-side partition count (``df.rdd``
    would throw) — their parallelism comes from the source + shuffle confs,
    so they pass through unchanged. For batch the ``df.rdd.getNumPartitions``
    probe costs one extra plan conversion; callers sit at pipeline heads, not
    in per-batch loops, so that is a one-time planning cost.
    """
    if df.isStreaming:
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def write_date_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout — the 100 TB table convention:
    partition by low-cardinality date/region columns so per-partition
    predicates prune entire directories at scan time (Catalyst partition
    pruning shows in .explain as PartitionFilters)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write: pre-shuffles data into n_buckets files per the
    bucket columns so later equi-joins / aggregations on those columns read
    co-located data and skip the shuffle entirely (SortMergeJoin with no
    Exchange — asserted in tests). This is the pay-once-shuffle-many-times
    layout for the big fact tables at 100 TB; choose n_buckets so one bucket
    of the largest table fits an executor core's memory."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
