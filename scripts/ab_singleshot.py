#!/usr/bin/env python
"""Driver-like SINGLE-SHOT interleaved A/B (r14): the r13 funnel
regression was invisible to warm best-of-N timing (ab_compare.py)
because the cost it added was single-shot analysis/codegen/barrier
time, which best-of-N amortizes away. This harness measures what the
driver's bench actually measures: a fresh process per sample, bench
warmup, then ONE timed run of the entry — alternating before/after
processes so box drift cancels.

Usage:
  python scripts/ab_singleshot.py <ref> <module>[,<module>...] \
      <entry> [pairs] [--pre e1,e2]

``--pre``: entries executed (untimed) after warmup, before the timed
entry — reproduces in-run codegen sharing (e.g. the funnel runs after
the LM entries in the catalog order).

Worker mode (internal): ab_singleshot.py --worker <ref|WORKTREE> ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def worker(ref: str, modules: list[str], entry: str, pre: list[str]) -> None:
    sys.path.insert(0, ROOT)
    from backend_etl_spark.catalog import REGISTRY
    from backend_etl_spark.session import get_spark, release_all_persistent

    if ref != "WORKTREE":
        import importlib.util

        for i, mod in enumerate(modules):
            src = subprocess.run(
                ["git", "-C", ROOT, "show", f"{ref}:{mod}"],
                check=True, capture_output=True, text=True,
            ).stdout
            with tempfile.NamedTemporaryFile(
                "w", suffix=".py", delete=False
            ) as fh:
                fh.write(src)
                path = fh.name
            spec = importlib.util.spec_from_file_location(
                f"__before_mod_{i}", path
            )
            m = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(m)  # @register overwrites REGISTRY

    spark = get_spark("r14-ab-singleshot")
    for warm in ("q3_shipping_priority", "multimodal_binary_meta"):
        REGISTRY[warm].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        release_all_persistent(spark)
    for p in pre:
        REGISTRY[p].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        release_all_persistent(spark)
    t0 = time.perf_counter()
    REGISTRY[entry].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.perf_counter() - t0
    print(f"AB_SINGLESHOT_RESULT {dt:.3f}")


def main() -> None:
    if sys.argv[1] == "--worker":
        ref = sys.argv[2]
        modules = [m for m in sys.argv[3].split(",") if m]
        entry = sys.argv[4]
        pre = [p for p in sys.argv[5].split(",") if p] if len(sys.argv) > 5 else []
        worker(ref, modules, entry, pre)
        return

    ref = sys.argv[1]
    modules = sys.argv[2]
    entry = sys.argv[3]
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 and not sys.argv[4].startswith("--") else 3
    pre = ""
    if "--pre" in sys.argv:
        pre = sys.argv[sys.argv.index("--pre") + 1]

    def sample(which_ref: str) -> float:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             which_ref, modules, entry, pre],
            capture_output=True, text=True, cwd=ROOT,
        )
        for line in out.stdout.splitlines():
            if line.startswith("AB_SINGLESHOT_RESULT"):
                return float(line.split()[1])
        raise SystemExit(
            f"worker failed ({which_ref}):\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}"
        )

    before, after = [], []
    for i in range(pairs):
        # alternate order within each pair so drift direction cancels
        order = [("before", ref), ("after", "WORKTREE")]
        if i % 2:
            order.reverse()
        for tag, r in order:
            dt = sample(r)
            (before if tag == "before" else after).append(dt)
            print(json.dumps({"pair": i, tag: round(dt, 3)}), flush=True)
    rec = {
        "entry": entry,
        "before": [round(x, 3) for x in before],
        "after": [round(x, 3) for x in after],
        "before_min": round(min(before), 3),
        "after_min": round(min(after), 3),
        "before_med": round(sorted(before)[len(before) // 2], 3),
        "after_med": round(sorted(after)[len(after) // 2], 3),
    }
    rec["speedup_med"] = round(rec["before_med"] / rec["after_med"], 3)
    print("SUMMARY " + json.dumps(rec))


if __name__ == "__main__":
    main()
