"""Regression tests for the round-1 ADVICE findings:

1. mixed-tick watermark swap (pipeline.py): catchup's state.advance()
   must not invalidate the general-mode plan in the same tick;
2. rollup replay (streaming/rollup.py): a replayed foreachBatch batch
   must not double-count into the additive fold;
3. NULL composite keys (sink.py): cross-batch anti-join must treat
   NULLs as equal (eqNullSafe), matching dropDuplicates;
4. source limit budget (sources/datasource.py): max_items must be
   charged per emitted row, not per raw line;
5. tokens('') (functions/scalars.py): empty text tokenizes to [].
"""

import datetime as dt
import json

from pyspark.sql import functions as F

from backend_etl_spark.functions.scalars import tokens
from backend_etl_spark.pipeline import run_incremental
from backend_etl_spark.sink import WatermarkStore, write_idempotent
from backend_etl_spark.sources.datasource import FixtureFeedDataSource
from backend_etl_spark.streaming.rollup import maintain_rollup, read_rollup


def test_tokens_empty_and_whitespace_only(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("a  b",), ("  lead trail  ",)], "text STRING"
    ).select(tokens("text").alias("toks"), F.size(tokens("text")).alias("n"))
    rows = df.collect()
    assert rows[0]["toks"] == [] and rows[0]["n"] == 0
    assert rows[1]["toks"] == [] and rows[1]["n"] == 0
    assert rows[2]["toks"] == ["a", "b"]
    assert rows[3]["toks"] == ["lead", "trail"]


def test_sink_null_key_not_reappended(spark, tmp_path):
    path = str(tmp_path / "sink")
    batch = spark.createDataFrame(
        [(1, "a", "x"), (None, "a", "y"), (None, None, "z")],
        "k1 INT, k2 STRING, payload STRING",
    )
    assert write_idempotent(batch, path, ["k1", "k2"]) == 3
    # redelivery: NULL-keyed rows must match their existing copies
    assert write_idempotent(batch, path, ["k1", "k2"]) == 0
    assert spark.read.parquet(path).count() == 3


def test_mixed_tick_catchup_and_general(spark, tmp_path):
    """Tick with BOTH modes active: tenant 1 has a watermark (general),
    tenant 2 is never-fetched (catchup). Catchup runs first and swaps
    the watermark dir; general must still execute correctly."""
    as_of = dt.datetime(2024, 6, 1)
    rows = []
    eid = 0
    for day in (5, 10, 20):  # tenant 1: one event per day in May
        rows.append((eid, 1, dt.datetime(2024, 5, day), "view", 1.0, "{}"))
        eid += 1
    for day in (8, 15):  # tenant 2 (never fetched): May events
        rows.append((eid, 2, dt.datetime(2024, 5, day), "click", 2.0, "{}"))
        eid += 1
    source = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE, props STRING"
    )
    state = WatermarkStore(spark, str(tmp_path / "wm"))
    # tenant 1 fetched through May 7 already
    state.advance(
        spark.createDataFrame(
            [(1, "events", dt.datetime(2024, 5, 7))], WatermarkStore.SCHEMA
        )
    )
    counts = run_incremental(
        spark, source, str(tmp_path / "sink"), state, as_of
    )
    assert counts["catchup"] == 2  # tenant 2 backfill
    assert counts["general"] == 2  # tenant 1: May 10 + May 20 (> watermark)
    assert state.get(1, "events") == dt.datetime(2024, 5, 20)
    assert state.get(2, "events") == dt.datetime(2024, 5, 15)
    assert spark.read.parquet(str(tmp_path / "sink")).count() == 4


def test_rollup_replay_does_not_double_count(spark, tmp_path):
    src = str(tmp_path / "events_src")
    rows = [
        (i, dt.datetime(2024, 1, 1, i), 1, "view", 1.0, "{}") for i in range(4)
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.parquet(src)
    rollup = str(tmp_path / "rollup")
    maintain_rollup(spark, src, rollup, str(tmp_path / "cp1"))
    first = {
        (r["grain"], str(r["grain_start"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in read_rollup(spark, rollup).collect()
    }
    assert first[("day", "2024-01-01 00:00:00", "view")] == (4, 4.0)
    # replay: fresh checkpoint re-delivers the same files as batch 0 —
    # the applied-batch marker must absorb it (no double counting)
    maintain_rollup(spark, src, rollup, str(tmp_path / "cp2"))
    second = {
        (r["grain"], str(r["grain_start"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in read_rollup(spark, rollup).collect()
    }
    assert second == first


def test_feed_budget_counts_only_emitted_rows(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    # page 0: 3 rows before the window, 2 inside, plus a blank line
    with open(feed / "page_000.jsonl", "w") as fh:
        for i in range(3):
            fh.write(json.dumps({"id": f"old{i}", "createdAt": "2023-01-01T00:00:00"}) + "\n")
        fh.write("\n")
        for i in range(2):
            fh.write(json.dumps({"id": f"new0{i}", "createdAt": "2024-06-01T00:00:00"}) + "\n")
    # page 1: 5 rows inside the window
    with open(feed / "page_001.jsonl", "w") as fh:
        for i in range(5):
            fh.write(json.dumps({"id": f"new1{i}", "createdAt": "2024-06-02T00:00:00"}) + "\n")
    spark.dataSource.register(FixtureFeedDataSource)
    df = (
        spark.read.format("fixture_feed")
        .option("path", str(feed))
        .option("ts_key", "createdAt")
        .option("since", "2024-01-01T00:00:00")
        .option("max_items", "6")
        .load()
    )
    # 2 emitted from page 0 + 4 of page 1's 5 (leftover budget) = 6:
    # the raw-line miscount would have starved page 1 entirely
    assert df.count() == 6


def test_cluster_components_reliable_checkpoint(spark, tmp_path):
    """VERDICT fix: cluster_components with a reliable checkpoint_dir
    (fault-tolerant path for real clusters) produces exactly the same
    clustering as the local-mode localCheckpoint path."""
    from backend_etl_spark.operators.dedup import cluster_components

    # two components ({1..4} via a chain + {7,8}) and isolated {5,6,9}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], "doc_a BIGINT, doc_b BIGINT"
    )
    ids = spark.createDataFrame([(i,) for i in range(1, 10)], "doc_id BIGINT")
    want = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_components(pairs, ids, "doc_id").collect()
    }
    assert want == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 7, 8: 7, 9: 9}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_components(
            pairs, ids, "doc_id", checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert got == want
    # reliable checkpoint files actually landed in the given dir
    import os

    assert any(os.scandir(str(tmp_path / "ckpt")))


def test_cluster_components_max_degree_guard(spark):
    """VERDICT r2 item 7: a pathological hub (star graph) is degree-capped
    so it can't stall convergence; genuine clusters are untouched."""
    from backend_etl_spark.operators.dedup import cluster_components

    # star: hub 100 joined to 30 spokes (101..130); plus a real pair (1,2)
    star = [(100, s) for s in range(101, 131)]
    pairs = spark.createDataFrame(star + [(1, 2)], "doc_a BIGINT, doc_b BIGINT")
    ids = spark.createDataFrame(
        [(i,) for i in [1, 2, 100] + list(range(101, 131))], "doc_id BIGINT"
    )

    # without the guard the star is one component labeled by the hub...
    full = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_components(pairs, ids, "doc_id").collect()
    }
    assert full[100] == 100 and all(full[s] == 100 for s in range(101, 131))
    assert full[1] == 1 and full[2] == 1

    # ...with max_degree=10 the hub's edges drop: hub and spokes keep
    # self-labels, the genuine (1,2) pair still clusters
    capped = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_components(pairs, ids, "doc_id", max_degree=10).collect()
    }
    assert capped[100] == 100
    assert all(capped[s] == s for s in range(101, 131))
    assert capped[1] == 1 and capped[2] == 1

    # bounded rounds: with every edge dropped nothing can change label,
    # so the loop exits on the first convergence check even with a huge
    # max_iter budget (guard against pathological-stall regressions)
    import time

    t0 = time.perf_counter()
    cluster_components(pairs, ids, "doc_id", max_iter=500, max_degree=10).collect()
    assert time.perf_counter() - t0 < 60
