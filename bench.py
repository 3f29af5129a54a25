#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop write (full plan execution,
no driver collect bottleneck). First query includes JVM/codegen warmup;
a warmup pass of the flagship runs first so steady-state numbers
dominate.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from backend_etl_spark.catalog import REGISTRY  # noqa: E402
from backend_etl_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_region_revenue",
    "join_outer_customer_order_stats",
    "agg_rollup_lineitem",
    "window_top3_orders_per_customer",
    "window_running_revenue",
    "window_sessionize_events",
    "topk_orders_by_price",
    "asof_purchase_last_click",
    "range_join_clicks_before_purchase",
    "range_join_binned_global",
    "events_json_props",
    "text_stats",
    "dedup_minhash_signatures",
    "dedup_lsh_candidates",
    "dedup_simhash",
    "dedup_exact_docs",
    "knn_brute_force_cosine",
    "knn_lsh_bucketed",
    "multimodal_binary_meta",
    "multimodal_frame_sample",
    "q10_returned_items",
    "q12_priority_split",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "skew_salted_agg_events",
    "rollup_multigrain_events",
    "session_window_builtin",
    "agg_quantile_family",
    "sentiment_lexicon",
    "dedup_cluster_components",
    # round 2 additions
    "html_parse_trustpilot",
    "twitter_union_three_shapes",
    "multimodal_decode_ppm",
    "multimodal_decode_wav",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("backend-etl-spark-bench")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    run("q3_shipping_priority")  # warmup: JVM + codegen + parquet footer cache
    run("multimodal_binary_meta")  # warmup: Python/Arrow UDF worker pool

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        times[name] = run(name)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
