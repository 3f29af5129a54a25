#!/usr/bin/env python
"""Interleaved A/B timing of catalog entries: WORKING-TREE ("after")
vs a git ref's version ("before") of the changed modules, alternated
run-by-run inside ONE session so box-speed drift (measured 3-4x swings
on this sandbox within an hour) cancels out of the comparison.

Usage:
  python scripts/ab_compare.py <ref> <module>[,<module>...] \
      <entry>[,<entry>...] [rounds]

where <module> is a repo-relative path like
backend_etl_spark/catalog/llmops3.py. The before-version is extracted
with ``git show <ref>:<module>`` and imported under a private module
name; its ``@register`` decorators overwrite the registry, from which
the before-callables are captured, then the after-callables restored.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from backend_etl_spark.catalog import REGISTRY  # noqa: E402
from backend_etl_spark.session import get_spark, release_all_persistent  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ref = sys.argv[1]
    modules = [m.strip() for m in sys.argv[2].split(",") if m.strip()]
    names = [n.strip() for n in sys.argv[3].split(",") if n.strip()]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    after_fns = {n: REGISTRY[n].fn for n in names}
    # snapshot EVERY QuerySpec the before-modules may overwrite (r13
    # ADVICE: restoring only .fn left the ref version's oracle/doc
    # strings live in REGISTRY for the rest of the process)
    full_snapshot = dict(REGISTRY)

    # load the before-version of each changed module; decorators
    # overwrite REGISTRY in place
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
        spec = importlib.util.spec_from_file_location(f"__before_mod_{i}", path)
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
    before_fns = {n: REGISTRY[n].fn for n in names}
    # restore the full after-state (whole QuerySpec objects, every
    # entry the ref modules re-registered — not just names' .fn)
    REGISTRY.clear()
    REGISTRY.update(full_snapshot)

    changed = [n for n in names if before_fns[n] is not after_fns[n]]
    if set(changed) != set(names):
        print(f"WARNING: unchanged entries {set(names) - set(changed)}")

    spark = get_spark("r13-ab")
    for warm in ("q3_shipping_priority", "multimodal_binary_meta"):
        REGISTRY[warm].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(get_spark("r13-ab"), SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = round(time.perf_counter() - t0, 3)
        release_all_persistent(spark)  # bench-identical hygiene (r13)
        return dt

    out = {}
    for n in names:
        b_times, a_times = [], []
        run(before_fns[n])  # one unmeasured warm pass per variant
        run(after_fns[n])
        for _ in range(rounds):
            b_times.append(run(before_fns[n]))
            a_times.append(run(after_fns[n]))
        out[n] = {
            "before_min": min(b_times), "after_min": min(a_times),
            "before": b_times, "after": a_times,
            "speedup_min": round(min(b_times) / max(min(a_times), 1e-9), 2),
        }
        print(json.dumps({n: out[n]}), flush=True)
    print("AB_SUMMARY " + json.dumps(out))


if __name__ == "__main__":
    main()
