"""Watermarked windowed aggregation + within-watermark dedup streams.

The reference's incremental loop (SURVEY §2.10) re-reads overlap windows
and absorbs re-delivery with natural-key dedup; Structured Streaming
expresses both natively:

- ``withWatermark + window()`` — the tumbling-window rollup the
  reference's downstream consumers would build over the mention tables
  (and the streaming twin of the batch ``time_bucket_hourly_events``
  catalog query, which is its oracle).
- ``dropDuplicatesWithinWatermark`` — the reference's ON CONFLICT
  DO NOTHING (utils/db_helpers.py:92-301) under at-least-once delivery,
  with bounded state: keys are held only for the watermark horizon
  instead of forever. At 100 TB/day this bounded-state form is the only
  viable one — an unbounded ``dropDuplicates`` state grows without
  limit; the horizon + idempotent-sink pair gives the same
  effectively-once result.

Batch-equivalence discipline (SURVEY §7.3): every stream here drains
with ``Trigger.AvailableNow`` into a parquet sink the driver can read
back, so the DuckDB batch oracle checks streaming results hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_etl_spark.sources.loader import load_table
from backend_etl_spark.streaming import drain_conf

EVENTS_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def stage_events_source(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    duplicate_n: int = 0,
    files: int | None = None,
) -> None:
    """Materialize `events` as a stream-readable source directory
    (µs timestamps — readStream has no nanosAsLong shim). With
    ``duplicate_n`` > 0, re-deliver the first n events as a second file,
    simulating the reference's overlap-window re-scrapes (at-least-once).
    ``files`` stages that many sequential TS-RANGE slices with
    increasing mtimes — the delivery order a live tailer produces, and
    the only order under which a per-trigger cap is semantics-safe: the
    r11 knee measurement (scripts/streaming_trigger_knee.py, BASELINE §x)
    showed a repartition-scrambled multi-file source drained under
    ``maxFilesPerTrigger`` yields phantom sessions and watermark drops,
    so time-scrambled staging is NOT offered. The global ntile sort is
    fine for a staging helper (it is test plumbing, not an operator)."""
    ev = load_table(spark, sf_dir, "events")
    if files:
        import time as _time

        from pyspark.sql.window import Window

        sliced = ev.withColumn(
            "_slice",
            F.ntile(int(files)).over(Window.orderBy("ts", "event_id")),
        )
        mode = "overwrite"
        for i in range(1, int(files) + 1):
            (
                sliced.where(F.col("_slice") == i)
                .drop("_slice")
                .coalesce(1)
                .write.mode(mode)
                .parquet(out_dir)
            )
            mode = "append"
            _time.sleep(0.1)  # distinct ms mtimes → stable source order
    else:
        ev.write.mode("overwrite").parquet(out_dir)
    if duplicate_n:
        ev.orderBy("event_id").limit(duplicate_n).write.mode("append").parquet(out_dir)


def read_events_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a staged directory. With
    ``max_files_per_trigger`` unset, an availableNow drain takes all
    staged files in ONE micro-batch (minimum scheduling overhead);
    setting it bounds per-batch input — the latency/throughput knob a
    live deployment turns, measured in BASELINE §x."""
    r = spark.readStream.schema(EVENTS_DDL)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return r.parquet(source_dir)


def run_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    delay: str = "30 minutes",
) -> None:
    """Tumbling-window count/sum per event_type with event-time watermark.

    Complete-mode foreachBatch overwriting the parquet sink: the final
    micro-batch holds every window, so the drained sink equals the batch
    aggregation exactly — late data within `delay` folds in, and the
    result is deterministic under any file→batch split.
    """
    agg = (
        read_events_stream(spark, source_dir)
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )

    def _overwrite(batch: DataFrame, _batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(sink_path)

    with drain_conf(spark):
        (
            agg.writeStream.foreachBatch(_overwrite)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )


def run_dedup_within_watermark(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    delay: str = "36500 days",
) -> None:
    """Drain the source through ``dropDuplicatesWithinWatermark`` on the
    natural key (event_id) into an append parquet sink.

    State is bounded by the watermark horizon — the scale-safe form of
    the reference's insert-if-absent. The default horizon here is
    effectively-unbounded so the drained result is exactly DISTINCT for
    the oracle; production sets `delay` to the real late-data bound.
    """
    deduped = (
        read_events_stream(spark, source_dir)
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    with drain_conf(spark):
        (
            deduped.writeStream.format("parquet")
            .option("path", sink_path)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )


def run_topk_trending(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    delay: str = "30 minutes",
    k: int = 3,
) -> None:
    """Live 'trending now' table: per tumbling window, the top-k event
    types by count. The rank runs INSIDE foreachBatch over the
    complete-mode aggregate — each micro-batch refreshes the whole
    serving table (the standard leaderboard pattern: streaming state
    holds only the windowed counts; the k-row-per-window rank is cheap
    on the aggregate, never on raw events), so the final drain equals
    the batch twin exactly."""
    agg = (
        read_events_stream(spark, source_dir)
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )

    def _rank_overwrite(batch: DataFrame, _batch_id: int) -> None:
        from pyspark.sql.window import Window

        rk = Window.partitionBy("window_start").orderBy(
            F.col("n").desc(), F.col("event_type")
        )
        (
            batch.withColumn("rank", F.row_number().over(rk).cast("bigint"))
            .where(F.col("rank") <= k)
            .write.mode("overwrite")
            .parquet(sink_path)
        )

    with drain_conf(spark):
        (
            agg.writeStream.foreachBatch(_rank_overwrite)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
