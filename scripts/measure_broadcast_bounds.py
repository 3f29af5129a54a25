#!/usr/bin/env python
"""Measure the runtime broadcast-side row counts of every entry in the
catalog-wide gate's BOUNDED_BROADCAST_WHITELIST at a given SF — the
evidence behind each whitelisted boundedness argument. Prints one line
per entry: name, per-exchange numOutputRows, max.

Usage: python scripts/measure_broadcast_bounds.py [sf_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from backend_etl_spark.catalog import REGISTRY  # noqa: E402
from backend_etl_spark.plans import quality  # noqa: E402
from backend_etl_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"

sys.path.insert(0, "/root/repo/tests")
from test_plan_quality import BOUNDED_BROADCAST_WHITELIST  # noqa: E402

spark = get_spark("measure-broadcast-bounds")
spark.sparkContext.setLogLevel("ERROR")

for name in sorted(BOUNDED_BROADCAST_WHITELIST):
    t0 = time.perf_counter()
    try:
        counts = quality.broadcast_row_counts(REGISTRY[name].fn(spark, SF_DIR))
        mx = max(counts) if counts else 0
        print(f"{name}: max={mx} counts={counts} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:160]}", flush=True)
