#!/usr/bin/env python
"""Per-entry optimization profiler (r13): for each named catalog entry,
capture ``.explain("formatted")`` into plans/r13/<name>_<tag>.txt and
time the entry solo (noop sink, best-of-N after one warm pass) — the
guide §1 "measure first" loop in one command.

Usage:
  python scripts/profile_entries.py <tag> <entry>[,<entry>...] [n_timed]

Timing methodology matches bench.py exactly (build DataFrame + noop
write, perf_counter around both) so numbers are comparable; the session
is the bench session (get_spark on local[$SPARK_GRAFT_CPUS]).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from backend_etl_spark.catalog import REGISTRY  # noqa: E402
from backend_etl_spark.session import get_spark, release_all_persistent  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "plans", "r13"
)


def main() -> None:
    tag = sys.argv[1]
    names = [n.strip() for n in sys.argv[2].split(",") if n.strip()]
    n_timed = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("r13-profile")

    # bench-identical warmup so codegen/session state matches
    for warm in ("q3_shipping_priority", "multimodal_binary_meta"):
        df = REGISTRY[warm].fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r13-profile:{name}")
        # plan capture (un-executed: AdaptiveSparkPlan isFinalPlan=false)
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        runs = []
        for _ in range(n_timed + 1):  # first is the warm pass
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            release_all_persistent(spark)  # bench-identical hygiene (r13)
        out[name] = {
            "warm1": runs[0],
            "best": min(runs[1:]),
            "runs": runs[1:],
            "exchanges": plan.count("Exchange"),
            "python_nodes": sum(
                plan.count(k)
                for k in ("BatchEvalPython", "ArrowEvalPython",
                          "MapInPandas", "MapInArrow", "FlatMapGroupsInPandas")
            ),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("SUMMARY " + json.dumps(out))


if __name__ == "__main__":
    main()
