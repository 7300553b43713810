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
    session's default parallelism (cheap check via the physical RDD)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
