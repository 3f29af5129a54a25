"""Structured Streaming ingest: availableNow drain → idempotent sink;
checkpointed re-run is a no-op (the W5 effectively-once recipe)."""

import os
import shutil

from backend_etl_spark.sources.loader import load_table
from backend_etl_spark.streaming.incremental import stream_events_to_sink


def test_stream_drain_and_checkpoint_noop(spark, sf_dir, tmp_path):
    # stage a micro-source (rewrite events as µs timestamps — the stream
    # reader uses an explicit schema, and ns parquet needs the same
    # loader shim as batch)
    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").limit(200).write.parquet(src)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    stream_events_to_sink(spark, src, sink, ckpt)
    n1 = spark.read.parquet(sink).count()
    assert n1 == 200

    # re-run with the same checkpoint: no new files → no new rows
    stream_events_to_sink(spark, src, sink, ckpt)
    assert spark.read.parquet(sink).count() == n1

    # fresh checkpoint, same sink: redelivery absorbed by the sink dedup
    shutil.rmtree(ckpt)
    stream_events_to_sink(spark, src, sink, ckpt)
    assert spark.read.parquet(sink).count() == n1


def test_incremental_dedup_replay_does_not_duplicate(spark, sf_dir, tmp_path):
    """Crash-replay for the streaming cross-crawl dedup (mirrors
    test_rollup_replay_does_not_double_count): a lost checkpoint
    re-delivers every batch file, and the idempotent sink must absorb
    the full replay — same rows, same verdicts, no duplicates."""
    from pyspark.sql import functions as F

    from backend_etl_spark.streaming import incremental

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    incremental.stage_docs_batch_source(
        spark, docs.where(F.col("doc_id") % 10 >= 8), src, redeliver=20
    )
    corpus = docs.where(F.col("doc_id") % 10 < 8)

    incremental.stream_dedup_against_corpus(
        spark, corpus, src, sink, str(tmp_path / "cp1")
    )
    first = sorted(map(tuple, spark.read.parquet(sink).collect()))
    n_batch = docs.where(F.col("doc_id") % 10 >= 8).count()
    assert len(first) == n_batch  # one verdict per doc, redelivery absorbed

    # replay from scratch: fresh checkpoint re-delivers ALL files
    incremental.stream_dedup_against_corpus(
        spark, corpus, src, sink, str(tmp_path / "cp2")
    )
    second = sorted(map(tuple, spark.read.parquet(sink).collect()))
    assert second == first


# ---------------------------------------------------------------------------
# watermarked windowed agg / within-watermark dedup / stateful sessions
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from backend_etl_spark.streaming import stateful, windowed  # noqa: E402


def test_windowed_counts_matches_batch(spark, sf_dir, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    windowed.stage_events_source(spark, sf_dir, src)
    windowed.run_windowed_counts(spark, src, sink, ckpt)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r["h"], r["event_type"]): (r["n"], r["sum_value"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .collect()
    }
    assert got == want


def test_dedup_within_watermark_absorbs_redelivery(spark, sf_dir, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    windowed.stage_events_source(spark, sf_dir, src, duplicate_n=100)
    n_distinct = load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(src).count() == n_distinct + 100

    windowed.run_dedup_within_watermark(spark, src, sink, ckpt)
    out = spark.read.parquet(sink)
    assert out.count() == n_distinct
    assert out.select("event_id").distinct().count() == n_distinct


def _batch_sessions(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = load_table(spark, sf_dir, "events")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.when(gap.isNull() | (gap > stateful.GAP_US), 1).otherwise(0).alias("ns"),
        )
        .select("user_id", "ts", F.sum("ns").over(wrun).alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def test_stateful_sessionize_matches_batch(spark, sf_dir, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    stateful.stage_events_with_sentinels(spark, sf_dir, src)
    stateful.run_sessionize(spark, src, sink, ckpt)

    got = sorted(
        (r["user_id"], r["session_id"], r["n_events"], r["session_start"], r["session_end"])
        for r in spark.read.parquet(sink).collect()
    )
    want = sorted(
        (r["user_id"], r["session_id"], r["n_events"], r["session_start"], r["session_end"])
        for r in _batch_sessions(spark, sf_dir).collect()
    )
    assert got == want


def test_stateful_state_survives_across_drains(spark, sf_dir, tmp_path):
    """Cross-batch state: drain real events first (last session per user
    stays open in state), then deliver sentinels and drain again — the
    held-back sessions emit, and the union matches the batch answer."""
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    windowed.stage_events_source(spark, sf_dir, src)  # no sentinels yet
    stateful.run_sessionize(spark, src, sink, ckpt)
    n_first = spark.read.parquet(sink).count()

    # second delivery: sentinels only, appended as a new source file
    ev = load_table(spark, sf_dir, "events")
    ev.groupBy("user_id").agg(F.max("ts").alias("mx")).select(
        F.lit(-1).cast("bigint").alias("event_id"),
        F.timestamp_micros(F.unix_micros(F.col("mx")) + 2 * stateful.GAP_US).alias("ts"),
        "user_id",
        F.lit("__flush__").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    ).write.mode("append").parquet(src)
    stateful.run_sessionize(spark, src, sink, ckpt)

    total = spark.read.parquet(sink).count()
    want = _batch_sessions(spark, sf_dir).count()
    assert n_first < total == want


def test_incremental_rollup_matches_batch(spark, sf_dir, tmp_path):
    """Continuous aggregate: two incremental drains (half the events,
    then the rest) produce the same hour/day/month rollup as one batch
    aggregation over everything."""
    from backend_etl_spark.streaming import rollup

    src = str(tmp_path / "src")
    roll = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, sf_dir, "events")
    half = ev.count() // 2
    ev.orderBy("event_id").limit(half).write.parquet(src)
    rollup.maintain_rollup(spark, src, roll, ckpt)
    n_after_first = (
        spark.read.parquet(roll).where(F.col("grain") == "hour").agg(F.sum("n")).collect()[0][0]
    )
    assert n_after_first == half

    ev.orderBy(F.col("event_id").desc()).limit(ev.count() - half).write.mode(
        "append"
    ).parquet(src)
    rollup.maintain_rollup(spark, src, roll, ckpt)

    got = {
        (r["grain"], r["grain_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in rollup.read_rollup(spark, roll).collect()
    }
    want = {
        (r["grain"], r["grain_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in rollup._partial_rollup(ev.select("ts", "event_type", "value"))
        .select("grain", "grain_start", "event_type", "n", F.round("sum_value", 2).alias("sum_value"))
        .collect()
    }
    assert set(got) == set(want)
    for key, (n, sv) in want.items():
        gn, gsv = got[key]
        assert gn == n, key
        assert abs(gsv - sv) < 1e-6, key  # summation-order tolerance


def test_stream_ingest_feed_end_to_end(spark, tmp_path):
    """Streaming generic tick: drain a twitter feed page, append a page,
    re-drain — only new items land; a fresh checkpoint redelivers
    everything but the sink dedup absorbs it."""
    import datetime as dt2
    import json as _json

    from backend_etl_spark.ingest.feed_pipeline import stream_ingest_feed
    from backend_etl_spark.sink import WatermarkStore

    feed = tmp_path / "feed"
    feed.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    state = WatermarkStore(spark, str(tmp_path / "wm"))
    tenant = {"id": 3, "company_name": "Acme"}
    as_of = dt2.datetime(2024, 1, 1)

    (feed / "page_0000.jsonl").write_text(
        _json.dumps({"id": "t1", "text": "hi",
                     "createdAt": "Mon Nov 13 22:13:20 +0000 2023"})
    )
    stream_ingest_feed(spark, "twitter", str(feed), sink, state, tenant, as_of, ckpt)
    assert spark.read.parquet(sink).count() == 1
    assert state.get(3, "twitter") == as_of

    # next page: one new tweet (inside the advanced watermark window) +
    # one redelivered old duplicate (outside it — window-filtered)
    (feed / "page_0001.jsonl").write_text(
        "\n".join([
            _json.dumps({"id": "t2", "text": "new",
                         "createdAt": "Mon Jan 15 00:00:00 +0000 2024"}),
            _json.dumps({"id": "t1", "text": "hi",
                         "createdAt": "Mon Nov 13 22:13:20 +0000 2023"}),
        ])
    )
    stream_ingest_feed(
        spark, "twitter", str(feed), sink, state, tenant, dt2.datetime(2024, 2, 1), ckpt
    )
    assert spark.read.parquet(sink).count() == 2

    # fresh checkpoint AND fresh watermark state: t2 is redelivered
    # inside the catchup window — the sink's natural-key dedup absorbs it
    import shutil as _sh

    _sh.rmtree(ckpt)
    fresh_state = WatermarkStore(spark, str(tmp_path / "wm2"))
    stream_ingest_feed(
        spark, "twitter", str(feed), sink, fresh_state, tenant,
        dt2.datetime(2024, 3, 1), ckpt,
    )
    assert spark.read.parquet(sink).count() == 2


def test_stream_throttled_microbatches(spark, sf_dir, tmp_path):
    """W8 rate-limit analog: maxFilesPerTrigger bounds each micro-batch;
    an availableNow drain still consumes everything, in bounded steps."""
    src = str(tmp_path / "src")
    ev = load_table(spark, sf_dir, "events")
    for i in range(3):  # three source files
        ev.limit(50).withColumn("event_id", F.col("event_id") + i * 1000).write.mode(
            "append"
        ).parquet(src)

    batches = []

    def _count(batch, bid):
        batches.append(batch.count())

    (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
            "value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(_count)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert sum(batches) == 150
    assert len(batches) >= 3  # bounded micro-batches, not one big gulp


def test_sessionize_split_independent_under_trigger_cap(spark, sf_dir, tmp_path):
    """The files-per-trigger knob (BASELINE §x latency/throughput curve)
    moves ONLY scheduling: a TIME-ORDERED many-file source drained one
    file per trigger emits exactly the sessions an unbounded single-gulp
    drain emits — more micro-batches, same result. (Time-ordered slices,
    not repartition: an arbitrary scramble is not a valid delivery — a
    straggler older than a flushed session starts a phantom session.)"""
    import time as _time

    from pyspark.sql.window import Window

    src0 = str(tmp_path / "src0")
    stateful.stage_events_with_sentinels(spark, sf_dir, src0)
    src = str(tmp_path / "src")
    sliced = spark.read.parquet(src0).withColumn(
        "_slice", F.ntile(4).over(Window.orderBy("ts", "event_id"))
    )
    for i in range(1, 5):
        sliced.where(F.col("_slice") == i).drop("_slice").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(0.1)

    results = {}
    for tag, fpt in (("capped", 1), ("unbounded", None)):
        sink, ckpt = str(tmp_path / f"sink_{tag}"), str(tmp_path / f"ckpt_{tag}")
        stateful.run_sessionize(spark, src, sink, ckpt, max_files_per_trigger=fpt)
        results[tag] = sorted(
            tuple(r) for r in spark.read.parquet(sink).collect()
        )
        n_commits = len(
            [f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")]
        )
        results[tag + "_batches"] = n_commits
    assert results["capped"] == results["unbounded"] != []
    assert results["capped_batches"] > results["unbounded_batches"]
