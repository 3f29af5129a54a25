"""Stream-stream and stream-static joins — the attribution and
enrichment patterns of a live event pipeline.

- Stream-stream interval join: purchases joined to the clicks that
  preceded them within an attribution window, both sides watermarked and
  the join carrying an event-time band — Structured Streaming uses the
  band to bound the join state (clicks older than the watermark + band
  are evicted), which is what makes the operator viable on an unbounded
  stream. This is the streaming twin of the batch
  ``range_join_clicks_before_purchase`` catalog entry.
- Stream-static join: each micro-batch hash-joins against a static
  dimension snapshot (broadcast by Catalyst when small) — the streaming
  form of the reference's tenant-stamping join (J1).

Both drain with ``Trigger.AvailableNow`` into parquet sinks so the
DuckDB batch oracle hash-checks the streaming results (SURVEY §7.3
batch-equivalence discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_etl_spark.sources.loader import load_table
from backend_etl_spark.streaming.windowed import read_events_stream
from backend_etl_spark.streaming import drain_conf


def run_purchase_click_attribution(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    delay: str = "30 minutes",
    max_files_per_trigger: int | None = None,
) -> None:
    """Inner stream-stream join: (purchase, click) pairs where the click
    landed in (purchase_ts - window, purchase_ts] for the same user.

    The event-time band plus per-side watermarks bound the join state:
    at 100 TB/day each side holds only `delay + window` of events keyed
    by user — eviction is continuous, state never grows with stream
    length. Inner join emits matches immediately, so an availableNow
    drain yields exactly the batch join set.
    """
    p = (
        read_events_stream(spark, source_dir, max_files_per_trigger)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", delay)
    )
    c = (
        read_events_stream(spark, source_dir, max_files_per_trigger)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", delay)
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("purchase_id", "click_id", F.col("p_user").alias("user_id"))
    with drain_conf(spark):
        (
            joined.writeStream.format("parquet")
            .option("path", sink_path)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )


def run_stream_static_enrich(
    spark: SparkSession,
    sf_dir: str,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
) -> None:
    """Stream-static enrichment: the events stream inner-joined to the
    customer dimension per micro-batch. The static side is re-planned
    each batch (picking up dimension updates) and broadcast when small —
    no stream state at all, so this scales with dimension size only."""
    ev = read_events_stream(spark, source_dir).where(
        F.col("event_type") == "purchase"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = ev.join(F.broadcast(dim), "user_id", "inner").select(
        "event_id", "user_id", "c_mktsegment", "value"
    )
    with drain_conf(spark):
        (
            enriched.writeStream.format("parquet")
            .option("path", sink_path)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
