"""Structured Streaming ingest: availableNow drain → idempotent sink;
checkpointed re-run is a no-op (the W5 effectively-once recipe)."""

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
