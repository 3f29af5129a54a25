"""The substituted CC oracles must agree ROW-FOR-ROW with the
recursive-CTE SQL oracles at every SF where the CTE is feasible — that
equivalence is what licenses substituting them at sf1, where DuckDB's
recursive CTE cannot spill and OOMs (BASELINE §s, r7 ledger).

Three forms are pinned against each other: the recursive CTE (the
registered primary oracle), the SQL-ITERATIVE label propagation (r11 —
DuckDB end-to-end, recursion replaced by a bounded materialized loop;
the sf1 ledger path), and the Python union-find (an independent
algorithm, kept as a cross-check).

Since r12 the same parametrized pin also covers the STAGED semdedup
oracle (alt_oracles.dedup_semantic_semdedup_staged): the two-level
k-means CTE DAG materialized phase-by-phase as temp tables so DuckDB
can spill at sf10 instead of OOMing on the unrolled pipeline's live
intermediates (r11 verdict item 3).

Pure DuckDB + Python: no Spark session, so these run in seconds.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/scripts")

import __spark_entry__ as contract
from alt_oracles import ALT_ORACLES, UNION_FIND_ORACLES
from tests.oracle_utils import duck_connection, normalized_rows

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", sorted(ALT_ORACLES))
def test_sql_iter_oracle_matches_recursive_cte(sf_dir, name):
    con = duck_connection(sf_dir)
    rel = con.sql(contract.oracle_sql()[name])
    exp_cols, exp = list(rel.columns), rel.fetchall()
    act_cols, act = ALT_ORACLES[name](con)
    assert sorted(act_cols) == sorted(exp_cols)
    assert len(act) == len(exp)
    assert normalized_rows(act_cols, act) == normalized_rows(exp_cols, exp)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", sorted(UNION_FIND_ORACLES))
def test_union_find_cross_check_matches_sql_iter(sf_dir, name):
    con = duck_connection(sf_dir)
    a_cols, a = ALT_ORACLES[name](con)
    b_cols, b = UNION_FIND_ORACLES[name](con)
    assert sorted(a_cols) == sorted(b_cols)
    assert len(a) == len(b)
    assert normalized_rows(a_cols, a) == normalized_rows(b_cols, b)


def test_alt_oracle_clusters_nontrivial():
    """Guard against a vacuous pass: the sf0.01 corpus has real near-dup
    clusters, so the component labeling must be non-identity (some doc
    labeled by a different doc's id) and keep-best must drop members."""
    con = duck_connection("/root/testdata/sf0.01")
    _, comp = ALT_ORACLES["dedup_cluster_components"](con)
    assert any(doc != cluster for doc, cluster in comp)
    _, kept = ALT_ORACLES["dedup_keep_best_in_cluster"](con)
    assert any(r[3] > 1 for r in kept)  # n_members > 1 somewhere
    assert len(kept) < len(comp)
