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
    # round 3 additions
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q19_disjunctive_pushdown",
    "q21_waiting_orders",
    "dedup_incremental_snapshot",
    "split_leakage_safe",
    "quality_char_entropy",
    # round 4 additions: the round-3 LLM-data tier gets steady-state
    # numbers (verdict item 4 — before this, PQ/ADC/packing cost was
    # known only from one-off BASELINE.md notes)
    "quality_bigram_logprob",
    "emb_pq_codes",
    "knn_pq_adc",
    "knn_ivf_multiprobe",
    "pack_sequences_2048",
    "text_rag_chunks",
    "bpe_train_merges",
    "bpe_encode_tokens",
    "agg_top_bigrams",
    # round 4 additions: composed IVF-PQ, the end-to-end corpus funnel,
    # layout-at-rest sessionize, a direct ingest-projection fixture, and
    # the streaming cross-crawl dedup
    "knn_ivfpq_adc",
    "knn_ivfpq_rerank",
    "knn_ivfpq_residual",
    "dedup_semantic_semdedup",
    "corpus_drift_kl",
    "corpus_pipeline_funnel",
    "bucketed_sessionize_events",
    "instagram_flatten_fixture",
    "streaming_incremental_dedup",
    "timeseries_gap_fill_hourly",
    "graph_pagerank_users",
    # round 4, session 2: portable sketches + trigram backoff LM
    "sketch_count_min_bounded",
    "join_bloom_runtime_filter",
    "quality_trigram_backoff",
    "streaming_sketch_cms_merge",
    "layout_zorder_key",
    "curation_weighted_sample",
    "streaming_topk_trending",
    # round 4, session 2: tranche closing the bench-coverage gap —
    # the remaining LLM-tier + relational-family entries
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine_pairs",
    "decontam_ngram_overlap",
    "pii_scrub_customers",
    "tfidf_top_terms",
    "curation_stratified_sample",
    "curation_token_budget_pack",
    "emb_matryoshka_truncate",
    "emb_quantize_int8",
    "knn_ivf_kmeans",
    "kmeans_assignments",
    "text_repetition_metrics",
    "lang_id_heuristic",
    "doc_fingerprint",
    "agg_cube_orders",
    "window_rank_family",
    "setop_except_all_priorities",
    "subquery_not_in_null_trap",
    "scd2_user_value_history",
    "events_retention_cohorts",
    "events_funnel_conversion",
    "unpivot_reaction_counts",
    "html_parse_feefo",
    "multimodal_fake_embed",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # --cold / SPARK_GRAFT_BENCH_COLD=1: worst-case variant — single
    # executor thread, no warmup passes — so the 2x-vs-baseline gate is
    # also checked without local[32] parallelism hiding per-query cost.
    cold = "--cold" in sys.argv or os.environ.get("SPARK_GRAFT_BENCH_COLD") == "1"
    if cold:
        os.environ["SPARK_GRAFT_CPUS"] = "1"
    spark = get_spark("backend-etl-spark-bench")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    if not cold:
        # warmup: JVM + codegen + parquet footer cache; Arrow worker pool
        for warm in ("q3_shipping_priority", "multimodal_binary_meta"):
            try:
                run(warm)
            except Exception:
                pass

    # One bad query must degrade the bench to "N-1 numbers + 1 error",
    # never zero numbers (round-2 postmortem: a single AnalysisException
    # aborted the whole run and BENCH_r02.json recorded nothing).
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        try:
            times[name] = run(name)
        except Exception as exc:  # noqa: BLE001 - isolate per-query failure
            msg = str(exc).strip().splitlines()
            errors[name] = f"{type(exc).__name__}: {msg[0] if msg else ''}"[:300]

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    out = {
        "metric": "catalog_total_runtime",
        # a partial sum must never masquerade as a full-catalog total:
        # with any error the headline value is nulled and partial=true,
        # so cross-round comparisons can't read N-1 queries as a speedup
        "value": None if errors else round(sum(times.values()), 3),
        "unit": "sec",
        "n_ok": len(times),
        "queries": {
            **times,
            **{name: {"err": err} for name, err in errors.items()},
        },
        "sf": float(sf) if sf else None,
    }
    if cold:
        out["variant"] = "cold-single-thread"
    if errors:
        out["n_errors"] = len(errors)
        out["partial"] = True
        out["value_partial_sum"] = round(sum(times.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
