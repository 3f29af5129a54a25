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
from backend_etl_spark.streaming import drain_conf

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

    with drain_conf(spark):
        (
            stream.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )


DOCS_DDL = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def stage_docs_batch_source(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    redeliver: int = 0,
    files: int = 4,
) -> None:
    """Materialize an incoming-crawl document batch as a stream-readable
    source directory, split across ``files`` files so availableNow
    produces multiple micro-batches. ``redeliver`` > 0 re-writes the
    first n docs as an extra file — the reference's overlap-window
    re-scrape (at-least-once) that the idempotent sink must absorb."""
    docs.repartition(files).write.mode("overwrite").parquet(out_dir)
    if redeliver:
        docs.orderBy("doc_id").limit(redeliver).write.mode("append").parquet(out_dir)


def stream_dedup_against_corpus(
    spark: SparkSession,
    corpus: DataFrame,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
) -> None:
    """Streaming cross-crawl dedup (W5 ∘ the incremental-snapshot op):
    each micro-batch of newly crawled documents is MinHash-signed and
    LSH-probed against the static corpus snapshot, and the verdict rows
    land through the idempotent sink keyed on batch_doc_id.

    Scale shape: the corpus band index is computed ONCE outside the
    stream, already MELTED to (corpus_doc_id, band_id, band_value) —
    at 100 TB: a persisted table bucketed on band_value — and only the
    micro-batch side moves per trigger; the probe join is
    O(|batch| × bucket), corpus-size-independent. Redelivered docs are
    absorbed twice over: the conflict-safe minhash groupBy within the
    batch (byte-identical redeliveries collapse because min() is
    duplicate-insensitive; CONFLICTING payloads for one doc_id resolve
    winner-takes-all to the lowest-content-hash version via the
    struct-ordered fold — r10 ADVICE: the plain fold would merge both
    versions' shingles into a chimera signature — still one shuffle,
    no per-batch dropDuplicates), anti-join at the sink across
    batches/restarts.
    """
    import pyspark.sql.functions as F

    from backend_etl_spark.operators import dedup

    corpus_bands = (
        dedup.signature_bands(
            dedup.minhash_signatures(corpus, "doc_id", "text"), "doc_id"
        )
        .select(F.col("doc_id").alias("corpus_doc_id"), "band_id", "band_value")
        .localCheckpoint(eager=True)
    )  # the persisted index: never recomputed (or re-melted) per micro-batch
    stream = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _probe(batch: DataFrame, batch_id: int) -> None:
        bsig = dedup.minhash_signatures(batch, "doc_id", "text",
                                        conflict_safe=True)
        out = dedup.incremental_lsh_matches(
            bsig, None, "doc_id", corpus_bands=corpus_bands
        )
        write_idempotent(out, sink_path, ["batch_doc_id"])

    # n=8: no stream-level state store here (the dedup work is per-batch
    # BATCH compute inside foreachBatch), but unlike the r6
    # counter-examples this drain runs NO Python workers — every
    # micro-batch is a handful of JVM expression shuffles over ~500-row
    # frames, where the session's 32-wide batch width is pure task
    # overhead. Measured A/B at sf0.1 (r10, best-of-3 each): 32-wide
    # 3.64 s vs 8-wide 3.06 s with the same plan shapes; results are
    # width-independent (aggregates + equi-joins only).
    with drain_conf(spark, n=8):
        (
            stream.writeStream.foreachBatch(_probe)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
