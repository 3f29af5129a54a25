"""Incrementally-maintained multigrain rollup (continuous aggregate).

The batch catalog query ``rollup_multigrain_events`` defines the
hour/day/month rollup; this module maintains the same table
incrementally from a stream: each micro-batch computes its partial
aggregates (count/sum are algebraic, so partials merge exactly) and
folds them into the materialized rollup with an atomic write-new+swap.

At 100 TB this is the TimescaleDB/Druid continuous-aggregate pattern
Spark-first: the rollup table is O(|grains| × |buckets| × |types|) —
thousands of rows — so the per-batch merge rewrites a tiny table while
the raw events stay append-only; dashboards read the rollup and never
scan raw history.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_etl_spark.streaming.windowed import read_events_stream
from backend_etl_spark.streaming import drain_conf

GRAINS = ("hour", "day", "month")


def _partial_rollup(events: DataFrame) -> DataFrame:
    grains = None
    for grain in GRAINS:
        g = events.select(
            F.lit(grain).alias("grain"),
            F.date_trunc(grain, F.col("ts")).alias("grain_start"),
            "event_type",
            "value",
        )
        grains = g if grains is None else grains.unionByName(g)
    return grains.groupBy("grain", "grain_start", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")
    )


_BATCH_MARKER = "_last_batch_id.json"  # underscore-prefixed: parquet readers skip it


def _last_applied(rollup_path: str) -> int:
    marker = os.path.join(rollup_path, _BATCH_MARKER)
    if os.path.isfile(marker):
        with open(marker) as fh:
            return json.load(fh)["batch_id"]
    return -1


def _merge_into(rollup_path: str, partial: DataFrame, batch_id: int) -> None:
    spark = partial.sparkSession
    if os.path.isdir(rollup_path):
        merged = (
            spark.read.parquet(rollup_path)
            .unionByName(partial)
            .groupBy("grain", "grain_start", "event_type")
            .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
        )
    else:
        merged = partial
    tmp = f"{rollup_path}.tmp-{uuid.uuid4().hex[:8]}"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    # the applied-batch marker travels inside the dir, so data + marker
    # swap in as one atomic rename — a crash between swap and stream
    # checkpoint leaves the marker proving the batch already folded
    with open(os.path.join(tmp, _BATCH_MARKER), "w") as fh:
        json.dump({"batch_id": batch_id}, fh)
    if os.path.isdir(rollup_path):
        shutil.rmtree(rollup_path)
    os.rename(tmp, rollup_path)


def maintain_rollup(
    spark: SparkSession, source_dir: str, rollup_path: str, checkpoint_dir: str
) -> None:
    """Drain new events through the incremental rollup maintenance.

    foreachBatch is at-least-once, and the additive fold is not
    idempotent on its own — so each fold records its batch_id in a
    marker swapped atomically with the table, and replayed batches
    (crash after swap, before the checkpoint commit) are skipped.
    That closes the recovery window to exactly-once; partials merge
    algebraically so any batch split gives the same table."""

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_applied(rollup_path):
            return  # replayed batch (recovery): already folded in
        _merge_into(rollup_path, _partial_rollup(batch), batch_id)

    with drain_conf(spark):
        (
            read_events_stream(spark, source_dir)
            .writeStream.foreachBatch(_fold)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The rollup with presentation rounding (matches the batch catalog
    query's 2-dp sums)."""
    return spark.read.parquet(rollup_path).select(
        "grain",
        "grain_start",
        "event_type",
        "n",
        F.round("sum_value", 2).alias("sum_value"),
    )
