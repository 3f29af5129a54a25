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


def forget_partitioned(
    spark,
    root: str,
    tombstones: DataFrame,
    key_col: str,
    partition_col: str,
) -> None:
    """Right-to-be-forgotten sweep over a hive-partitioned parquet table
    at ``root``: delete every row whose ``key_col`` appears in
    ``tombstones``, rewriting ONLY the partitions that contain one.

    Mechanics: the affected-partitions slice is re-read, anti-joined
    against the (broadcast) tombstone list, localCheckpoint()ed (the
    write overwrites the path it read), and written back under
    partitionOverwriteMode=dynamic — so untouched partitions keep their
    files byte-for-byte. A partition whose every row was tombstoned has
    no survivors and dynamic overwrite cannot express its deletion, so
    those directories are dropped explicitly afterward (both bookkeeping
    sets are partition-dimension-sized collects).

    Cost scales with affected partitions, never table size: a 0.1%
    deletion list on a 1000-partition 100 TB table touches ~0.1% of
    bytes.

    Caveats (deliberate, documented): ``root`` must be a LOCAL
    filesystem path (the emptied-directory cleanup uses shutil; on
    object storage you'd route it through the store's delete API), and
    the rewrite is NOT crash-atomic — dynamic partition overwrite
    replaces each affected partition's files in place, so a crash
    mid-write can leave an affected partition partially rewritten.
    Production GDPR deletion should run this against a table format
    with atomic commits (Iceberg/Delta) or stage-and-swap the affected
    partition directories; the plan shape (touch only affected
    partitions) is the part that carries to 100 TB."""
    import shutil

    tomb = tombstones.select(key_col).distinct()
    table = spark.read.parquet(root)
    # partition-dimension-sized collect, taken BEFORE the overwrite —
    # any lazy plan over `table` is invalid once its files are replaced
    affected = {
        r[0]
        for r in table.join(F.broadcast(tomb), key_col)
        .select(partition_col)
        .distinct()
        .collect()
    }
    if not affected:  # nothing to forget: leave the table untouched
        return
    survivors = (
        table.where(F.col(partition_col).isin(*affected))
        .join(F.broadcast(tomb), key_col, "left_anti")
        .select(*table.columns)
        .localCheckpoint()
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        survivors.write.mode("overwrite").partitionBy(partition_col).parquet(root)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # survivors is checkpointed, so reading it post-overwrite is safe
    emptied = affected - {
        r[0] for r in survivors.select(partition_col).distinct().collect()
    }
    for v in emptied:
        shutil.rmtree(f"{root}/{partition_col}={v}", ignore_errors=True)
