"""Streaming catalog entries: each runs a real Structured Streaming query
(availableNow drain into a parquet sink) and returns the sink — so the
driver's DuckDB oracle hash-checks *streaming* results against batch SQL.

This is the batch-equivalence discipline from SURVEY §7.3 made
checkable: watermarked windowed agg, within-watermark dedup, and the
custom stateful sessionizer all must equal their relational batch twins.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_etl_spark.catalog.registry import register
from backend_etl_spark.session import tune
from backend_etl_spark.streaming import joins, stateful, windowed


def _dirs(tag: str) -> tuple[str, str, str]:
    # fresh per-invocation (checkpoint state must not be shared), but
    # under the per-process staging root so runs don't leak dirs
    from backend_etl_spark.sources.loader import scratch_dir

    base = scratch_dir(tag)
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
    "streaming_purchase_click_join",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
                FROM events)
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM ev WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >  p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    """,
)
def streaming_purchase_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase←click attribution) with
    watermark-bounded state; the drained sink must hash-match the batch
    interval join over the same events."""
    tune(spark)
    src, sink, ckpt = _dirs("ssjoin")
    windowed.stage_events_source(spark, sf_dir, src)
    joins.run_purchase_click_attribution(spark, src, sink, ckpt)
    return spark.read.parquet(sink)


@register(
    "streaming_static_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    """,
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment (the J1 tenant-stamping join in
    streaming form): zero stream state, dimension re-planned per batch."""
    tune(spark)
    src, sink, ckpt = _dirs("ssenrich")
    windowed.stage_events_source(spark, sf_dir, src)
    joins.run_stream_static_enrich(spark, sf_dir, src, sink, ckpt)
    return spark.read.parquet(sink)


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


def _incr_dedup_oracle() -> str:
    from backend_etl_spark.catalog.llmops import _SIGS_CTE
    from backend_etl_spark.catalog.llmops2 import INCR_SNAPSHOT_ORACLE

    return INCR_SNAPSHOT_ORACLE.format(sigs_cte=_SIGS_CTE)


@register("streaming_incremental_dedup", oracle=_incr_dedup_oracle())
def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-crawl dedup run INCREMENTALLY (round-3 verdict item 8):
    the incoming crawl (doc_id%10 >= 8) arrives as a multi-batch file
    stream — with its first 50 docs redelivered, simulating the
    reference's overlap re-scrape — and each micro-batch LSH-probes the
    static corpus snapshot inside foreachBatch, landing through the
    idempotent natural-key sink (W5). The drained sink must hash-match
    the one-shot batch entry dedup_incremental_snapshot exactly: same
    oracle, same relation, any file→batch split."""
    from backend_etl_spark.sources.loader import load_table
    from backend_etl_spark.streaming import incremental

    tune(spark)
    src, sink, ckpt = _dirs("incrdedup")
    docs = load_table(spark, sf_dir, "documents")
    # 2 files + the redelivery file at 2 files/trigger = 2 real
    # micro-batches (the r7 ivfpq_append A/B: per-batch fixed cost
    # dominates tiny batches, so multi-batch + at-least-once realism is
    # intact at half the drain cost; "any file->batch split" is the
    # entry's own contract)
    incremental.stage_docs_batch_source(
        spark, docs.where(F.col("doc_id") % 10 >= 8), src, redeliver=50, files=2
    )
    incremental.stream_dedup_against_corpus(
        spark, docs.where(F.col("doc_id") % 10 < 8), src, sink, ckpt
    )
    return spark.read.parquet(sink)


@register(
    "streaming_topk_trending",
    oracle="""
    WITH counts AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT window_start, event_type, n, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY window_start
                                       ORDER BY n DESC, event_type) AS rank
          FROM counts)
    WHERE rank <= 3
    """,
)
def streaming_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Trending now' leaderboard as a stream: watermarked hourly counts
    per event_type, top-3 per window ranked inside foreachBatch over the
    complete-mode aggregate (rank touches only the windowed counts,
    never raw events). Drained sink must hash-match the batch
    count+row_number twin."""
    tune(spark)
    src, sink, ckpt = _dirs("topk")
    windowed.stage_events_source(spark, sf_dir, src)
    windowed.run_topk_trending(spark, src, sink, ckpt)
    return spark.read.parquet(sink)
