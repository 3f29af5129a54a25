"""Structured Streaming variant of the incremental ingest pipeline.

Same logical pipeline as pipeline.run_incremental, expressed as a
stream: file source → watermarked dedup → foreachBatch idempotent sink.
Keeping the batch body shared (write_idempotent) means the DuckDB batch
oracle covers the streaming logic too (SURVEY §7.3: streaming state is
the least oracle-checkable surface, so the streaming wrapper stays
thin).

The reference's late-data posture (SURVEY §2.10 W7) — overlap windows +
natural-key dedup absorbing re-delivery — maps exactly onto
``withWatermark + dropDuplicates`` + an idempotent sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from backend_etl_spark.pipeline import _mentions_projection
from backend_etl_spark.sink import write_idempotent

EVENTS_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def stream_events_to_sink(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    watermark_delay: str = "10 minutes",
) -> None:
    """Run the ingest pipeline as an available-now stream (one drain of
    whatever is in `source_dir`, checkpointed for incremental re-runs)."""
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .parquet(source_dir)
        .withWatermark("ts", watermark_delay)
        .dropDuplicates(["event_id"])
    )

    def _sink(batch: DataFrame, batch_id: int) -> None:
        write_idempotent(_mentions_projection(batch), sink_path, ["mention_id"])

    (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
