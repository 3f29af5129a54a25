"""Idempotent sink + watermark + incremental pipeline semantics
(SURVEY §2.2 K1-K9, §2.10 W1-W5): re-running a batch is a no-op, the
watermark only advances when rows land, catchup handles NULL watermarks."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from backend_etl_spark.pipeline import run_incremental
from backend_etl_spark.sink import WatermarkStore, write_idempotent
from backend_etl_spark.sources.loader import load_table


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_write_idempotent_double_write_is_noop(spark, events, tmp_path):
    path = str(tmp_path / "sink")
    batch = events.limit(100)
    n1 = write_idempotent(batch, path, ["event_id"])
    assert n1 == 100
    n2 = write_idempotent(batch, path, ["event_id"])
    assert n2 == 0  # at-least-once redelivery absorbed (W5)
    assert spark.read.parquet(path).count() == 100


def test_write_idempotent_dedups_within_batch(spark, tmp_path):
    path = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k INT, payload STRING"
    )
    n = write_idempotent(df, path, ["k"])
    assert n == 2
    assert spark.read.parquet(path).select("k").distinct().count() == 2


def test_write_idempotent_partial_overlap(spark, events, tmp_path):
    path = str(tmp_path / "sink")
    write_idempotent(events.where(F.col("event_id") < 50), path, ["event_id"])
    n = write_idempotent(events.where(F.col("event_id") < 80), path, ["event_id"])
    assert n == 30


def test_watermark_store_roundtrip(spark, tmp_path):
    store = WatermarkStore(spark, str(tmp_path / "wm"))
    assert store.get(1, "events") is None  # never fetched → catchup path
    t1 = dt.datetime(2024, 1, 10)
    t2 = dt.datetime(2024, 1, 20)
    store.advance(spark.createDataFrame([(1, "events", t1)], WatermarkStore.SCHEMA))
    assert store.get(1, "events") == t1
    # advance keeps max, never regresses
    store.advance(spark.createDataFrame([(1, "events", t2)], WatermarkStore.SCHEMA))
    store.advance(spark.createDataFrame([(1, "events", t1)], WatermarkStore.SCHEMA))
    assert store.get(1, "events") == t2


def test_incremental_pipeline_catchup_then_general(spark, events, tmp_path):
    sink = str(tmp_path / "mentions")
    store = WatermarkStore(spark, str(tmp_path / "wm"))
    t_mid = dt.datetime(2024, 1, 15)
    t_end = dt.datetime(2024, 2, 1)

    # tick 1: nothing fetched yet → all tenants take the catchup path
    c1 = run_incremental(spark, events, sink, store, as_of=t_mid)
    assert c1["general"] == 0 and c1["catchup"] > 0
    n_after_1 = spark.read.parquet(sink).count()
    assert n_after_1 == c1["catchup"]

    # tick 2: watermarks set → general path picks up only the tail
    c2 = run_incremental(spark, events, sink, store, as_of=t_end)
    assert c2["catchup"] == 0 and c2["general"] > 0
    total = spark.read.parquet(sink).count()
    assert total == c1["catchup"] + c2["general"]
    expected = events.where(F.col("ts") <= F.lit(t_end)).count()
    assert total == expected

    # tick 3: nothing new → no-op, watermark unchanged
    c3 = run_incremental(spark, events, sink, store, as_of=t_end)
    assert c3 == {"catchup": 0, "general": 0}
    assert spark.read.parquet(sink).count() == total
