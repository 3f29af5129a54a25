"""Streaming catalog entries: each runs a real Structured Streaming query
(availableNow drain into a parquet sink) and returns the sink — so the
driver's DuckDB oracle hash-checks *streaming* results against batch SQL.

This is the batch-equivalence discipline from SURVEY §7.3 made
checkable: watermarked windowed agg, within-watermark dedup, and the
custom stateful sessionizer all must equal their relational batch twins.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from backend_etl_spark.catalog.registry import register
from backend_etl_spark.session import tune
from backend_etl_spark.streaming import stateful, windowed


def _dirs(tag: str) -> tuple[str, str, str]:
    base = tempfile.mkdtemp(prefix=f"spark-graft-{tag}-")
    return f"{base}/src", f"{base}/sink", f"{base}/ckpt"


@register(
    "streaming_windowed_counts",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*)             AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window streaming aggregation; drained sink
    must hash-match the batch hourly rollup."""
    tune(spark)
    src, sink, ckpt = _dirs("winagg")
    windowed.stage_events_source(spark, sf_dir, src)
    windowed.run_windowed_counts(spark, src, sink, ckpt)
    return spark.read.parquet(sink)


@register(
    "streaming_dedup_drain",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
    """,
)
def streaming_dedup_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark under simulated at-least-once
    redelivery (first 100 events delivered twice); the drained sink must
    equal the exact event set."""
    tune(spark)
    src, sink, ckpt = _dirs("dedup")
    windowed.stage_events_source(spark, sf_dir, src, duplicate_n=100)
    windowed.run_dedup_within_watermark(spark, src, sink, ckpt)
    return spark.read.parquet(sink).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@register(
    "streaming_sessionize_stateful",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
)
def streaming_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState sessionizer) over
    a sentinel-flushed drain; must hash-match the batch lag/running-sum
    sessionization."""
    tune(spark)
    src, sink, ckpt = _dirs("sessions")
    stateful.stage_events_with_sentinels(spark, sf_dir, src)
    stateful.run_sessionize(spark, src, sink, ckpt)
    return spark.read.parquet(sink)
