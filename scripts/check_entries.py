#!/usr/bin/env python
"""Oracle-check specific catalog entries at one or more SFs — the
fast per-entry correctness loop for optimization work (full driver_sim
replays all 203 entries; this replays only the ones being touched).

Usage: python scripts/check_entries.py <entry>[,<entry>...] [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from backend_etl_spark.catalog import REGISTRY  # noqa: E402
from backend_etl_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import compare, duck_connection  # noqa: E402


def main() -> None:
    names = [n.strip() for n in sys.argv[1].split(",") if n.strip()]
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")
    spark = get_spark("r13-check")
    failures = 0
    for sf_dir in sf_dirs:
        con = duck_connection(sf_dir)
        for name in names:
            spec = REGISTRY[name]
            if spec.oracle is None:
                print(f"{sf_dir} {name}: NO ORACLE")
                continue
            try:
                compare(spec.fn(spark, sf_dir), con, spec.oracle)
                print(f"{sf_dir} {name}: MATCH")
            except AssertionError as exc:
                failures += 1
                print(f"{sf_dir} {name}: MISMATCH — {str(exc)[:300]}")
    if failures:
        raise SystemExit(f"{failures} mismatch(es)")


if __name__ == "__main__":
    main()
