#!/usr/bin/env python
"""Measured scaling sweep: run representative catalog queries at
sf0.001 / sf0.01 / sf0.1 (a 100x data range) and report per-query
wall time plus the log-log slope between successive scale factors —
direct evidence for the would-it-survive-100x question, instead of
an argued-from-plan-shape answer.

A slope near 1.0 is linear scaling; well below 1 means fixed overhead
still dominates at these sizes; well above ~1.2 sustained across both
decades flags a super-linear shape that deserves a plan audit.

Writes scale_sweep.json next to this file's repo root and prints a
compact table. Usage: python scripts/scale_sweep.py [reps]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from backend_etl_spark.catalog import REGISTRY  # noqa: E402
from backend_etl_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]

# one representative per major plan class
QUERIES = [
    "q1_pricing_summary",           # full-scan aggregate
    "q3_shipping_priority",         # multi-join + top-k
    "window_sessionize_events",     # keyed window
    "dedup_lsh_candidates",         # banded LSH self-join
    "dedup_minhash_signatures",     # explode + groupBy signature build
    "knn_brute_force_cosine",       # broadcast scoring pass
    "pack_sequences_2048",          # sharded prefix sum
    "text_quality",                 # map-heavy expression pass
    "sketch_hll_datasketches_bounded",  # sketch aggregate
    "corpus_pipeline_funnel",       # multi-stage composition
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("backend-etl-spark-scale-sweep")

    # warm the JVM/codegen/Arrow pools so sf0.001 isn't all startup cost
    for w in ("q3_shipping_priority", "text_quality"):
        REGISTRY[w].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        row: dict[str, float] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            best = math.inf
            for _ in range(reps):  # best-of-reps: drop scheduler noise
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            row[sf] = round(best, 3)
        results[name] = row

    out = {"sfs": SFS, "reps": reps, "queries": results, "slopes": {}}
    print(f"{'query':38s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} "
          f"{'slope01':>8s} {'slope12':>8s}")
    for name, row in results.items():
        s01 = math.log10(row["0.01"] / row["0.001"]) if row["0.001"] > 0 else 0.0
        s12 = math.log10(row["0.1"] / row["0.01"]) if row["0.01"] > 0 else 0.0
        out["slopes"][name] = {"0.001->0.01": round(s01, 3),
                               "0.01->0.1": round(s12, 3)}
        print(f"{name:38s} {row['0.001']:8.2f} {row['0.01']:8.2f} "
              f"{row['0.1']:8.2f} {s01:8.2f} {s12:8.2f}")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "scale_sweep.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote scale_sweep.json")


if __name__ == "__main__":
    main()
