#!/usr/bin/env python
"""Measure the latency-vs-throughput knob on the three heaviest
streaming drains (r10 verdict item 6): files-per-trigger 1 / 2 / 4 /
unbounded over a FIXED staged file set, so the only thing that moves is
the micro-batch count — per-batch fixed scheduling cost (state-store
open/commit, offset log, sink commit) × number of batches.

The stateful drains are split-independent for TIME-ORDERED deliveries
(the file-source contract a live tailer satisfies): the events sources
are staged as N sequential time-range slices — an arbitrary
repartition() scramble is NOT a valid delivery, and the sessionizer /
watermarked join legitimately produce different results under one
(phantom sessions from stragglers; watermark drops). The script
re-checks the contract by asserting identical output row counts across
settings. The knee — the largest per-trigger cap that still buys
wall-clock — is recorded in BASELINE §x; a live deployment turns the
same knob the other way to bound per-batch latency.

Usage: python scripts/streaming_trigger_knee.py [sf_dir] [reps]
Writes .ledger/streaming_knee.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pyspark.sql.functions as F  # noqa: E402

from backend_etl_spark.session import get_spark, tune  # noqa: E402
from backend_etl_spark.sources.loader import load_table, scratch_dir  # noqa: E402
from backend_etl_spark.streaming import incremental, joins, stateful  # noqa: E402

#: staged events files — enough that fpt=1/2/4/∞ produce genuinely
#: different batch counts (8/4/2/1) at every setting
N_FILES = 8
FPTS = [1, 2, 4, None]  # None = unbounded (one availableNow batch)


def _batches(ckpt: str) -> int:
    try:
        return len([
            f for f in os.listdir(os.path.join(ckpt, "commits"))
            if not f.startswith(".")
        ])
    except OSError:
        return -1


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("streaming-knee")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)

    def stage_time_ordered(df, out_dir: str, files: int = N_FILES) -> None:
        """Write ``files`` sequential ts-range slices (increasing mtime,
        so the file source delivers them in time order) — the realistic
        multi-batch delivery a live tailer produces."""
        from pyspark.sql.window import Window

        sliced = df.withColumn(
            "_slice",
            F.ntile(files).over(Window.orderBy("ts", "event_id")),
        )
        for i in range(1, files + 1):
            (
                sliced.where(F.col("_slice") == i)
                .drop("_slice")
                .coalesce(1)
                .write.mode("append")
                .parquet(out_dir)
            )
            time.sleep(0.1)  # distinct ms mtimes → stable source order

    # stage the events sources ONCE per drain family as time-ordered
    # slices; the incremental-dedup source keeps its catalog-entry
    # staging (2 files + 1 redelivery file, order-insensitive pipeline)
    # so its numbers are entry-comparable
    ev_src = scratch_dir("knee_events") + "/src"
    stage_time_ordered(load_table(spark, sf_dir, "events"), ev_src)
    sent_src = scratch_dir("knee_sentinels") + "/src"
    stateful.stage_events_with_sentinels(spark, sf_dir, sent_src)
    sent_src2 = scratch_dir("knee_sentinels2") + "/src"
    stage_time_ordered(spark.read.parquet(sent_src), sent_src2)
    docs = load_table(spark, sf_dir, "documents")
    docs_src = scratch_dir("knee_docs") + "/src"
    incremental.stage_docs_batch_source(
        spark, docs.where(F.col("doc_id") % 10 >= 8), docs_src,
        redeliver=50, files=2,
    )
    corpus = docs.where(F.col("doc_id") % 10 < 8)

    def sessionize(fpt, sink, ckpt):
        stateful.run_sessionize(spark, sent_src2, sink, ckpt,
                                max_files_per_trigger=fpt)

    def ssjoin(fpt, sink, ckpt):
        joins.run_purchase_click_attribution(spark, ev_src, sink, ckpt,
                                             max_files_per_trigger=fpt)

    def incrdedup(fpt, sink, ckpt):
        # the entry's own default is 2; None here means "all 3 files in
        # one batch" — measured for the curve, the entry keeps >=2
        # batches for at-least-once realism
        incremental.stream_dedup_against_corpus(
            spark, corpus, docs_src, sink, ckpt,
            max_files_per_trigger=fpt or 1_000_000,
        )

    out: dict[str, dict] = {"sf_dir": sf_dir, "n_files": N_FILES,
                            "reps": reps, "drains": {}}
    for name, fn in [("sessionize", sessionize),
                     ("purchase_click_join", ssjoin),
                     ("incremental_dedup", incrdedup)]:
        rowcounts: set[int] = set()
        curve = {}
        for fpt in FPTS:
            key = str(fpt) if fpt else "unbounded"
            best, batches = float("inf"), -1
            for _ in range(reps):
                base = scratch_dir(f"knee_{name}_{key}")
                sink, ckpt = f"{base}/sink", f"{base}/ckpt"
                t0 = time.perf_counter()
                fn(fpt, sink, ckpt)
                dt = time.perf_counter() - t0
                best = min(best, dt)
                batches = _batches(ckpt)
                rowcounts.add(spark.read.parquet(sink).count())
            curve[key] = {"sec": round(best, 3), "batches": batches}
            print(f"  {name} fpt={key}: {best:.2f}s ({batches} batches)")
        assert len(rowcounts) == 1, (
            f"{name}: output row count varies across splits: {rowcounts}"
        )
        out["drains"][name] = {"curve": curve, "rows": rowcounts.pop()}

    path = os.path.join(HERE, ".ledger", "streaming_knee.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
