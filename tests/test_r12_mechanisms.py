"""Round-12 mechanism pins: the LSH pair kernel's band-count shape
fallback (the O(bands²) colocated shape reverts to the
groupBy(pair)-count shape above MAX_COLOCATED_BANDS — r11 advice), and
time-ordered ``files=`` staging in stage_events_source (ts-range slices
with increasing mtimes, never repartition — the split-independence
contract the r11 knee measurement surfaced)."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

import backend_etl_spark.operators.dedup as dedup
from backend_etl_spark.streaming import windowed

SF_DIR = "/root/testdata/sf0.001"


def _pairs_set(df):
    return {
        (r["doc_a"], r["doc_b"], r["shared_bands"]) for r in df.collect()
    }


def test_lsh_pair_kernel_shapes_agree(spark, monkeypatch):
    """Colocated and groupBy-count shapes must emit the identical
    candidate-pair relation; the threshold picks physical shape only."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(120)
        .select("doc_id", "text")
    )
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=8)
    colocated = dedup.lsh_candidate_pairs(sigs, "doc_id", num_hashes=8)
    monkeypatch.setattr(dedup, "MAX_COLOCATED_BANDS", 4)
    fallback = dedup.lsh_candidate_pairs(sigs, "doc_id", num_hashes=8)
    assert _pairs_set(colocated) == _pairs_set(fallback)
    # and the fallback really is the aggregate shape, not the predicate
    plan = fallback._jdf.queryExecution().optimizedPlan().toString()
    assert "bv0" not in plan


def test_stage_events_source_files_are_time_ordered(spark, tmp_path):
    """files=N stages sequential ts-range slices: each staged file's max
    ts precedes the next file's min ts (mtime order), so a per-trigger
    cap replays the live tailer's delivery order instead of a
    repartition scramble (r11 advice, streaming knee measurement)."""
    out = str(tmp_path / "src")
    windowed.stage_events_source(spark, SF_DIR, out, files=3)
    parts = sorted(
        glob.glob(os.path.join(out, "part-*.parquet")),
        key=os.path.getmtime,
    )
    assert len(parts) == 3
    spans = []
    for p in parts:
        r = (
            spark.read.parquet(p)
            .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
            .first()
        )
        spans.append((r["lo"], r["hi"]))
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo
    # nothing lost in the slicing
    n = spark.read.parquet(out).count()
    expect = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert n == expect


def test_cold_degraded_run_diverts_like_warm(tmp_path):
    """r11 advice: the never-clobber-a-canonical-record discipline must
    cover cold runs too — a box-degraded cold run diverts to
    *_degraded.json when the incumbent cold record is canonical."""
    import json

    import bench

    (tmp_path / "bench_full_cold.json").write_text(
        json.dumps({"canonical": True})
    )
    out = bench.resolve_full_path(
        str(tmp_path), "bench_full_cold.json", False, True
    )
    assert out.endswith("bench_full_cold_degraded.json")
    # and a canonical cold run still lands in place
    out = bench.resolve_full_path(
        str(tmp_path), "bench_full_cold.json", True, True
    )
    assert out.endswith("bench_full_cold.json")


def test_heavy_subset_names_resolve():
    """The standing sf10 bench subset must name real catalog entries
    (a rename would silently shrink the third decade's coverage)."""
    import bench

    names = bench.resolve_subset("heavy")
    assert len(names) >= 30
    assert len(set(names)) == len(names)
