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


def test_dist_hash_rejects_map_types(spark, con):
    """MAP cells have no deterministic cross-engine ordering — entries
    carrying them must keep the collect path, loudly."""
    sdf = spark.sql("SELECT map(1, 2) AS m")
    with pytest.raises(ValueError, match="unsupported column type"):
        dist_hash_compare(sdf, con, "SELECT MAP([1], [2]) AS m")


# ------------------------------------------------- non-scalar renderings
# r12 verdict item 1: arrays / structs / binary render canonically in
# both engines so non-scalar results can attest collect-free too.

def test_dist_hash_arrays(spark, con):
    """int / float / string arrays, NULL elements, empty and NULL
    arrays — all must agree cross-engine, and NULL vs empty must not
    alias (they produce different verdicts against each other)."""
    sdf = spark.sql(
        "SELECT * FROM VALUES "
        "(1, array(1, 2, 3), array(0.5D, 1.0D), array('a', CAST(NULL AS STRING))), "
        "(2, array(), CAST(NULL AS ARRAY<DOUBLE>), array('x')) "
        "t(k, ai, af, s)"
    )
    sql = (
        "SELECT 1 AS k, [1, 2, 3] AS ai, [0.5, 1.0] AS af, "
        "['a', CAST(NULL AS VARCHAR)] AS s "
        "UNION ALL SELECT 2, [], CAST(NULL AS DOUBLE[]), ['x']"
    )
    v = dist_hash_compare(sdf, con, sql)
    assert v["schema_ok"] and v["count_ok"] and v["vals_ok"], v
    # teeth: NULL array on the oracle side where Spark has empty
    swapped = sql.replace("SELECT 2, [],", "SELECT 2, CAST(NULL AS INTEGER[]),")
    v = dist_hash_compare(sdf, con, swapped)
    assert not v["vals_ok"]


def test_dist_hash_structs(spark, con):
    """Structs render field-ordered; a NULL struct must not alias a
    struct whose every field is NULL."""
    sdf = spark.sql(
        "SELECT * FROM VALUES "
        "(1, named_struct('b', 2, 'a', 'x')), "
        "(2, named_struct('b', CAST(NULL AS INT), 'a', CAST(NULL AS STRING))) "
        "t(k, s)"
    )
    sql = (
        "SELECT 1 AS k, {'b': 2, 'a': 'x'} AS s "
        "UNION ALL SELECT 2, {'b': CAST(NULL AS INTEGER), 'a': CAST(NULL AS VARCHAR)}"
    )
    v = dist_hash_compare(sdf, con, sql)
    assert v["schema_ok"] and v["count_ok"] and v["vals_ok"], v
    # teeth: NULL struct != all-NULL-fields struct
    null_struct = sql.replace(
        "SELECT 2, {'b': CAST(NULL AS INTEGER), 'a': CAST(NULL AS VARCHAR)}",
        "SELECT 2, CAST(NULL AS STRUCT(b INTEGER, a VARCHAR))",
    )
    v = dist_hash_compare(sdf, con, null_struct)
    assert not v["vals_ok"]


def test_dist_hash_binary_and_nested(spark, con):
    """Binary renders as identical uppercase hex in both engines;
    array-of-struct nests (depth-indexed lambda vars compose)."""
    sdf = spark.sql(
        "SELECT 1 AS k, CAST('«z»' AS BINARY) AS b, "
        "array(named_struct('p', 1, 'q', 'a'), "
        "named_struct('p', CAST(NULL AS INT), 'q', 'b')) AS ns"
    )
    sql = (
        "SELECT 1 AS k, encode('«z»') AS b, "
        "[{'p': 1, 'q': 'a'}, {'p': CAST(NULL AS INTEGER), 'q': 'b'}] AS ns"
    )
    v = dist_hash_compare(sdf, con, sql)
    assert v["schema_ok"] and v["count_ok"] and v["vals_ok"], v
    # teeth on a nested field
    v = dist_hash_compare(sdf, con, sql.replace("'q': 'b'", "'q': 'c'"))
    assert not v["vals_ok"]


def test_nonscalar_attestation_queries_match(spark):
    """The three real-table non-scalar relations (signature arrays, raw
    embedding vectors, binary+struct payloads — scripts/attest_nonscalar)
    must dist-hash-match their oracles; they are the sf10 attestation
    surface for r12 verdict item 1."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import attest_nonscalar

    assert attest_nonscalar.run("/root/testdata/sf0.001") == 0


def test_dist_hash_null_string_does_not_alias_null_cell(spark, con):
    """r12 ADVICE: a literal 'NULL' string cell must hash differently
    from a NULL cell (the sentinel is chr(30), not the 4-char string)."""
    sdf = spark.sql("SELECT CAST(NULL AS STRING) AS s")
    v = dist_hash_compare(sdf, con, "SELECT 'NULL' AS s")
    assert v["count_ok"] and not v["vals_ok"]
    v = dist_hash_compare(sdf, con, "SELECT CAST(NULL AS VARCHAR) AS s")
    assert v["vals_ok"]


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
