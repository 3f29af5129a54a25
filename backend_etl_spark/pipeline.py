"""General / catchup incremental pipeline over the events feed.

The reference's execution heart (SURVEY §3.1/§3.2): Celery beat fires
``*_general`` (incremental since watermark) and ``*_catchup`` (deep
backfill when the watermark is NULL) per platform, fanning out one task
per tenant (tasks.py:80-101, 158-221). Here the whole fleet collapses
into ONE declarative incremental batch per run:

    stale/null-watermark tenants (control scan, db_helpers.py:49-76)
      → windowed source read (pushed-down ts predicate)
      → projection/cleanup
      → idempotent dedup-append sink (ON CONFLICT semantics)
      → watermark advance iff rows landed (tasks.py:198-199)

``as_of`` is injectable so runs are reproducible (no wall-clock in the
plan — SURVEY §7.3 non-determinism discipline).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_etl_spark.sink import WatermarkStore, write_idempotent

PLATFORM = "events"
CATCHUP_WINDOW = dt.timedelta(days=90)  # reference: 90-day backfill, tasks.py:177


def _mentions_projection(events: DataFrame) -> DataFrame:
    """Project the raw feed into the conformed 'mentions'-shaped record
    (platform discriminator + natural key + payload), the Spark idiom for
    the reference's 8 per-platform tables (SURVEY §1.4)."""
    return events.select(
        F.col("event_id").alias("mention_id"),
        F.lit(PLATFORM).alias("platform"),
        F.col("user_id").alias("tenant_id"),
        F.col("ts").alias("created_at"),
        F.col("event_type").alias("kind"),
        F.col("value"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


def run_incremental(
    spark: SparkSession,
    source: DataFrame,
    sink_path: str,
    state: WatermarkStore,
    as_of: dt.datetime,
    tenant_col: str = "user_id",
    ts_col: str = "ts",
) -> dict:
    """One scheduler tick: catchup for never-fetched tenants, general for
    stale ones. Returns per-mode appended-row counts."""
    wm = state.read().where(F.col("platform") == PLATFORM)
    tenants = source.select(F.col(tenant_col).alias("tenant_id")).distinct()
    # broadcast control-dim join: watermark stamped onto each tenant
    ctl = tenants.join(F.broadcast(wm.select("tenant_id", "watermark")), "tenant_id", "left")
    # Materialize the control table BEFORE the mode loop: catchup's
    # state.advance() swaps the watermark directory, and a lazy ctl plan
    # would re-list the deleted parquet files when general mode executes
    # (mixed tick: new tenants land catchup rows while stale tenants
    # still need the general pass). The table is tiny (|tenants| rows),
    # so eager materialization is O(control data), not O(feed).
    ctl = ctl.localCheckpoint(eager=True)

    counts = {}
    for mode in ("catchup", "general"):
        if mode == "catchup":
            # NULL watermark → deep backfill window (reference: now-90d)
            sel = ctl.where(F.col("watermark").isNull()).withColumn(
                "since", F.lit(as_of - CATCHUP_WINDOW)
            )
        else:
            sel = ctl.where(F.col("watermark").isNotNull()).withColumn(
                "since", F.col("watermark")
            )
        batch = (
            source.join(F.broadcast(sel.select("tenant_id", "since")),
                        source[tenant_col] == F.col("tenant_id"))
            .where((F.col(ts_col) > F.col("since")) & (F.col(ts_col) <= F.lit(as_of)))
            .drop("tenant_id", "since")
        )
        n = write_idempotent(_mentions_projection(batch), sink_path, ["mention_id"])
        counts[mode] = n
        if n:
            # advance watermarks only for tenants whose batch landed rows
            landed = (
                _mentions_projection(batch)
                .groupBy("tenant_id")
                .agg(F.max("created_at").alias("watermark"))
                .withColumn("platform", F.lit(PLATFORM))
            )
            state.advance(landed)
    return counts


def health(spark: SparkSession) -> dict:
    """Session liveness probe — the reference's GET /health (app.py:6-8).
    Returns enough to confirm the session executes work, not just that
    the process is up."""
    probe = spark.range(1).count()
    return {
        "status": "ok" if probe == 1 else "degraded",
        "spark_version": spark.version,
        "parallelism": spark.sparkContext.defaultParallelism,
    }


def fetch_now(
    spark: SparkSession,
    source: DataFrame,
    sink_path: str,
    state: WatermarkStore,
    as_of: dt.datetime,
) -> dict:
    """Run the whole pipeline for ALL tenants, now, synchronously, and
    return a summary — the reference's POST /fetch-now intent
    (app.py:10-14, whose fetch_all_companies import dangles; SURVEY
    §3.3). One incremental tick covers every tenant: catchup for
    never-fetched, general for stale."""
    counts = run_incremental(spark, source, sink_path, state, as_of)
    return {"appended": counts, "as_of": as_of.isoformat()}
