"""End-to-end ingest: REST-shaped feed → schema-on-read → projection →
idempotent sink → watermark advance.

This is the reference's scrape-task lifecycle (SURVEY §3.1) as one
declarative pipeline: the connector pushes the time window down
(tasks.py:187-199 computes [watermark | now−90d, now]), from_json types
the payload (N6), the platform projection flattens it (§2.3-2.4), the
sink dedups on the natural key (ON CONFLICT semantics), and the
watermark advances only when rows landed (tasks.py:198-199).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_etl_spark.ingest import projections, schemas
from backend_etl_spark.sink import WatermarkStore, write_idempotent
from backend_etl_spark.sources.datasource import FixtureFeedDataSource

CATCHUP_WINDOW = dt.timedelta(days=90)  # reference backfill depth, tasks.py:177


@dataclass(frozen=True)
class FeedSpec:
    """One platform's feed wiring: raw payload shape, projection (closed
    over the tenant's dimension attributes — the reference stamps these
    at dispatch, tasks.py:112-119), sink table, and how to read event
    time off the projected record for the incremental window."""

    table: str
    raw_ddl: str
    project: Callable[[DataFrame, dict, Column], DataFrame]
    event_ts: Callable[[], Column] | None


def _lit(t: dict, key: str) -> Column:
    return F.lit(t.get(key))


FEEDS: dict[str, FeedSpec] = {
    "twitter": FeedSpec(
        "twitter_mentions",
        schemas.TWITTER_RAW_DDL,
        lambda raw, t, fa: projections.project_twitter(raw, _lit(t, "company_name"), fa),
        lambda: F.col("created_at"),
    ),
    "instagram": FeedSpec(
        "instagram_mentions",
        schemas.INSTAGRAM_RAW_DDL,
        lambda raw, t, fa: projections.project_instagram(raw, _lit(t, "company_name"), fa),
        lambda: F.col("created_at"),
    ),
    "facebook": FeedSpec(
        "facebook_posts",
        schemas.FACEBOOK_RAW_DDL,
        lambda raw, t, fa: projections.project_facebook(
            raw, _lit(t, "company_name"), _lit(t, "facebook_username"), fa
        ),
        lambda: F.to_timestamp("created_at"),  # ISO string in the record
    ),
    "linkedin": FeedSpec(
        "linkedin_posts",
        schemas.LINKEDIN_RAW_DDL,
        lambda raw, t, fa: projections.project_linkedin(raw, _lit(t, "company_name"), fa),
        lambda: F.timestamp_millis(F.col("posted_at_ts")),
    ),
    "reddit": FeedSpec(
        "reddit_posts",
        schemas.REDDIT_RAW_DDL,
        lambda raw, t, fa: projections.project_reddit(raw, _lit(t, "company_name"), fa),
        lambda: F.to_timestamp("review_date"),
    ),
    "trustpilot": FeedSpec(
        "trustpilot_reviews",
        schemas.TRUSTPILOT_RAW_DDL,
        lambda raw, t, fa: projections.project_trustpilot(
            raw, _lit(t, "company_name"), _lit(t, "company_web_address"), fa
        ),
        lambda: F.col("review_date").cast("timestamp"),
    ),
    "feefo": FeedSpec(
        "feefo_reviews",
        schemas.FEEFO_RAW_DDL,
        lambda raw, t, fa: projections.project_feefo(
            raw, _lit(t, "company_name"), _lit(t, "feefo_business_info"), fa
        ),
        lambda: F.col("review_date").cast("timestamp"),
    ),
    "google_maps": FeedSpec(
        "google_maps_reviews",
        schemas.GOOGLE_MAPS_RAW_DDL,
        lambda raw, t, fa: projections.project_google_maps(
            raw, _lit(t, "company_name"), _lit(t, "place_url"), fa
        ),
        lambda: F.to_timestamp("review_date"),
    ),
}


def ingest_feed(
    spark: SparkSession,
    platform: str,
    feed_dir: str,
    sink_path: str,
    state: WatermarkStore,
    tenant: dict,
    as_of: dt.datetime,
    max_items: int | None = None,
) -> int:
    """One scrape tick for one (tenant, platform): connector read →
    from_json typing → platform projection → incremental window →
    idempotent sink → watermark advance iff rows landed. The generic
    form of the reference's per-platform task bodies (tasks.py:105-717,
    one hand-written function per platform there; one FeedSpec row here).
    """
    spec = FEEDS[platform]
    spark.dataSource.register(FixtureFeedDataSource)
    watermark = state.get(tenant["id"], platform)
    since = watermark or (as_of - CATCHUP_WINDOW)

    reader = spark.read.format("fixture_feed").option("path", feed_dir)
    if max_items:
        reader = reader.option("max_items", str(max_items))
    raw = reader.load().select(
        F.from_json("item", spec.raw_ddl).alias("r")
    ).select("r.*")

    projected = spec.project(raw, tenant, F.lit(as_of))
    if spec.event_ts is not None:
        ts = spec.event_ts()
        projected = projected.where((ts > F.lit(since)) & (ts <= F.lit(as_of)))

    n = write_idempotent(projected, sink_path, schemas.DEDUP_KEYS[spec.table])
    if n:  # advance only on non-empty batch (W1)
        landed = spark.createDataFrame(
            [(tenant["id"], platform, as_of)], WatermarkStore.SCHEMA
        )
        state.advance(landed)
    return n


def ingest_twitter_feed(
    spark: SparkSession,
    feed_dir: str,
    sink_path: str,
    state: WatermarkStore,
    tenant_id: int,
    company_name: str,
    as_of: dt.datetime,
    max_items: int = 500,  # reference cap, twitter_scraper.py:35
) -> int:
    """One Twitter scrape tick for one tenant (thin wrapper over the
    generic FeedSpec dispatch). Returns rows appended."""
    return ingest_feed(
        spark,
        "twitter",
        feed_dir,
        sink_path,
        state,
        {"id": tenant_id, "company_name": company_name},
        as_of,
        max_items,
    )


def stream_ingest_feed(
    spark: SparkSession,
    platform: str,
    feed_dir: str,
    sink_path: str,
    state: WatermarkStore,
    tenant: dict,
    as_of: dt.datetime,
    checkpoint_dir: str,
) -> None:
    """The generic tick as a true Structured Streaming job: the
    cursor-as-offset stream reader consumes new feed pages, each
    micro-batch runs the same projection + window + idempotent sink +
    watermark advance via foreachBatch. The checkpoint replaces the
    reference's hand-rolled cursor bookkeeping (reddit_scraper.py:57-125)
    — a killed run resumes from the committed page offset, and
    redelivered pages are absorbed by the sink's natural-key dedup
    (effectively-once, SURVEY §2.10 W5)."""
    spec = FEEDS[platform]
    spark.dataSource.register(FixtureFeedDataSource)
    watermark = state.get(tenant["id"], platform)
    since = watermark or (as_of - CATCHUP_WINDOW)

    def _tick(batch: DataFrame, _batch_id: int) -> None:
        raw = batch.select(F.from_json("item", spec.raw_ddl).alias("r")).select("r.*")
        projected = spec.project(raw, tenant, F.lit(as_of))
        if spec.event_ts is not None:
            ts = spec.event_ts()
            projected = projected.where((ts > F.lit(since)) & (ts <= F.lit(as_of)))
        n = write_idempotent(projected, sink_path, schemas.DEDUP_KEYS[spec.table])
        if n:
            landed = batch.sparkSession.createDataFrame(
                [(tenant["id"], platform, as_of)], WatermarkStore.SCHEMA
            )
            state.advance(landed)

    (
        spark.readStream.format("fixture_feed")
        .option("path", feed_dir)
        .load()
        .writeStream.foreachBatch(_tick)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
