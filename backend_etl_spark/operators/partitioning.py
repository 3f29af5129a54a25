"""Parallelism right-sizing for compute-heavy stages.

A narrow scan (one small parquet file → one partition) feeding a
compute-heavy projection (shingling, hashing, Arrow UDFs) serializes
the whole stage on one core — the local-mode miniature of a cluster
reading one giant unsplittable file. ``spread`` repartitions *only when
upstream parallelism is below the session default*, so at 100 TB (where
the scan already yields thousands of splits) it is a no-op and adds no
shuffle; locally it unlocks all cores for the expensive expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition up to the session's default parallelism if (and only
    if) the plan currently has fewer partitions. Hash-partitions on
    ``key_cols`` when given (keeps downstream per-key aggregation
    co-partitioned); round-robin otherwise."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)
