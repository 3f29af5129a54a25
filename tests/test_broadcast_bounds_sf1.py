"""Measured row-count bounds for every whitelisted broadcast side at
sf1 — the largest local SF (VERDICT r7 item 3: turn each whitelist
entry's prose boundedness argument into a per-entry measured fact).

For each BOUNDED_BROADCAST_WHITELIST entry the test EXECUTES the query
at sf1 and reads every BroadcastExchange's runtime ``numOutputRows``
from the executed plan; the max must sit under the entry's explicit
bound. The bounds are cardinality arguments, not slack: a fixed sketch
geometry bounds at its cell/register count, a closed key domain at the
domain size, a capped LM model at V^2/V^3 of the sf1 vocabulary (31).

This sweep is what caught the r7 whitelist's three false entries: AQE
was broadcasting the CORPUS side (2.7M/2.6M/1.19M rows at sf1) of the
bigram/trigram/tfidf scoring joins while the whitelist argued about
the model side. The LM entries now pin the model broadcast explicitly;
tfidf is merge-hinted and carries no broadcast at all.

Requires the locally generated sf1 tables (scripts/gen_sf.py); skipped
where they are absent so the driver's suite stays self-contained.
"""

from __future__ import annotations

import os

import pytest

from backend_etl_spark.catalog import REGISTRY
from backend_etl_spark.plans import quality

from tests.test_plan_quality import BOUNDED_BROADCAST_WHITELIST

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.localdata/sf1")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF1_DIR}/documents.parquet"),
    reason="sf1 tables not generated (scripts/gen_sf.py)",
)

#: entry -> max rows any of its broadcasts may ship at sf1, with the
#: cardinality argument the bound encodes. Measured values (r8) in
#: BASELINE.md §s.
SF1_BROADCAST_BOUNDS = {
    # fixed sketch geometry: constants of the sketch, not the data
    "sketch_count_min_bounded": 512,        # d*w cells (measured 256)
    "sketch_hll_datasketches_bounded": 4096,  # 2^p registers (measured 5 non-empty)
    "sketch_loglog_distinct_portable": 64,  # m registers
    "sketch_loglog_merge_union": 64,        # m registers per sketch
    # closed key domains
    "curation_temperature_resample": 20,    # per-language totals (10 langs)
    "group_quantiles_production": 16,       # 3 statuses x 4 quantiles = 12
    "timeseries_gap_fill_hourly": 5000,     # event_type x calendar-hour cells
    "timeseries_ewma_anomaly": 5000,        # event_type x calendar-hour cells
    # fixed constants of the algorithm
    "curation_token_budget_pack": 1000,     # quality_buckets shards (measured 417)
    "pack_sequences_2048": 256,             # fixed shard count
    # literal-filter-bounded query/eval sets
    "knn_lsh_bucketed": 20,                 # vec_id < 20 queries
    "knn_lsh_recall_at_5": 100,             # 20 queries x top-5
    "decontam_ngram_overlap": 2000,         # 10 eval docs' distinct 4-grams
    "text_bm25_ranking": 50,                # |Q| query terms
    "rag_hybrid_rrf_fusion": 1000,          # query-term IDF / per-query top-k
    # capped LM model artifacts (sf1 vocab V=31)
    "quality_bigram_logprob": 1000,         # V^2 = 961
    "quality_trigram_backoff": 30000,       # V^3 = 29791
    # control-plane-sized (tenants, not corpus rows)
    "incremental_watermark_scan": 1000,     # measured 200 tenants
}


def test_bounds_cover_whitelist_exactly():
    """Every whitelisted broadcast carries a measured sf1 bound and
    nothing else does — the two lists cannot drift apart silently."""
    assert set(SF1_BROADCAST_BOUNDS) == set(BOUNDED_BROADCAST_WHITELIST)


@pytest.mark.parametrize("name", sorted(SF1_BROADCAST_BOUNDS))
def test_whitelisted_broadcast_under_bound_at_sf1(spark, name):
    counts = quality.broadcast_row_counts(REGISTRY[name].fn(spark, SF1_DIR))
    bound = SF1_BROADCAST_BOUNDS[name]
    assert max(counts, default=0) <= bound, (
        f"{name}: broadcast rows {counts} exceed sf1 bound {bound} — "
        f"the whitelist argument ({BOUNDED_BROADCAST_WHITELIST[name]}) "
        f"no longer holds"
    )
