"""Distributed order-insensitive result hashing (backend_etl_spark/
attest.py, r11 verdict item 2): the collect-free compare must agree
with the collect path on real catalog entries across every supported
type class, must catch a one-cell perturbation (teeth), and must refuse
types it can't normalize identically in both engines."""

from __future__ import annotations

import pytest

from backend_etl_spark.attest import dist_hash_compare
from backend_etl_spark.catalog import REGISTRY
from tests.oracle_utils import duck_connection

SF_DIR = "/root/testdata/sf0.01"

# int (lsh), double (q1), timestamp (time_bucket), string+ratio (text),
# limit-query (topk) — one entry per normalization class
ENTRIES = [
    "dedup_lsh_candidates",
    "q1_pricing_summary",
    "time_bucket_hourly_events",
    "text_quality",
    "topk_orders_by_price",
]


@pytest.fixture(scope="module")
def con():
    return duck_connection(SF_DIR)


@pytest.mark.parametrize("name", ENTRIES)
def test_dist_hash_agrees_with_collect_path(spark, con, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    v = dist_hash_compare(sdf, con, spec.oracle)
    assert v["schema_ok"] and v["count_ok"] and v["vals_ok"], v
    assert v["n_spark"] > 0


def test_dist_hash_has_teeth(spark, con):
    """One perturbed cell in a 440-row result must flip vals_ok."""
    spec = REGISTRY["dedup_lsh_candidates"]
    sdf = spec.fn(spark, SF_DIR)
    mutated = (
        "SELECT doc_a, doc_b, CASE WHEN row_number() OVER "
        "(ORDER BY doc_a, doc_b) = 1 THEN shared_bands + 1 "
        f"ELSE shared_bands END AS shared_bands FROM ({spec.oracle}) q"
    )
    v = dist_hash_compare(sdf, con, mutated)
    assert v["count_ok"] and v["schema_ok"] and not v["vals_ok"]


def test_dist_hash_rejects_unsupported_types(spark, con):
    """Array/struct cells have no cross-engine canonical rendering —
    entries carrying them must keep the collect path, loudly."""
    sdf = spark.sql("SELECT array(1, 2) AS a")
    with pytest.raises(ValueError, match="unsupported column type"):
        dist_hash_compare(sdf, con, "SELECT [1, 2] AS a")


def test_dist_hash_null_and_empty(spark, con):
    """NULL cells normalize identically; an empty result matches an
    empty oracle (both sums NULL)."""
    sdf = spark.sql(
        "SELECT * FROM VALUES (1, CAST(NULL AS STRING)), (2, 'x') t(k, s)"
    )
    v = dist_hash_compare(
        sdf, con,
        "SELECT 1 AS k, CAST(NULL AS VARCHAR) AS s UNION ALL SELECT 2, 'x'",
    )
    assert v["vals_ok"] and v["count_ok"]
    empty = spark.sql("SELECT 1 AS k WHERE 1 = 0")
    v = dist_hash_compare(empty, con, "SELECT 1 AS k WHERE 1 = 0")
    assert v["vals_ok"] and v["count_ok"] and v["n_spark"] == 0
