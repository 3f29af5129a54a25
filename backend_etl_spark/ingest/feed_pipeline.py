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

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from backend_etl_spark.ingest import projections, schemas
from backend_etl_spark.sink import WatermarkStore, write_idempotent
from backend_etl_spark.sources.datasource import FixtureFeedDataSource

CATCHUP_WINDOW = dt.timedelta(days=90)  # reference backfill depth, tasks.py:177


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
    """One scrape tick for one tenant. Returns rows appended."""
    spark.dataSource.register(FixtureFeedDataSource)
    watermark = state.get(tenant_id, "twitter")
    since = watermark or (as_of - CATCHUP_WINDOW)  # general vs catchup window

    feed = (
        spark.read.format("fixture_feed")
        .option("path", feed_dir)
        .option("ts_key", "createdAt")
        # ctime strings don't sort lexicographically, so the window is
        # enforced in-plan below; the connector still applies max_items.
        .option("max_items", str(max_items))
        .load()
    )
    raw = feed.select(
        F.from_json("item", schemas.TWITTER_RAW_DDL).alias("r")
    ).select("r.*")
    projected = projections.project_twitter(
        raw, F.lit(company_name), F.lit(as_of)
    ).where(
        (F.col("created_at") > F.lit(since)) & (F.col("created_at") <= F.lit(as_of))
    )
    n = write_idempotent(
        projected, sink_path, schemas.DEDUP_KEYS["twitter_mentions"]
    )
    if n:  # advance only on non-empty batch (W1)
        landed = spark.createDataFrame(
            [(tenant_id, "twitter", as_of)], WatermarkStore.SCHEMA
        )
        state.advance(landed)
    return n
