"""The alternate (union-find) oracles must agree ROW-FOR-ROW with the
recursive-CTE SQL oracles at every SF where the CTE is feasible — that
equivalence is what licenses substituting them at sf1, where DuckDB's
recursive CTE cannot spill and OOMs (BASELINE §s, r7 ledger).

Pure DuckDB + Python: no Spark session, so these run in seconds.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/scripts")

import __spark_entry__ as contract
from alt_oracles import ALT_ORACLES
from tests.oracle_utils import duck_connection, normalized_rows

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", sorted(ALT_ORACLES))
def test_alt_oracle_matches_recursive_cte(sf_dir, name):
    con = duck_connection(sf_dir)
    rel = con.sql(contract.oracle_sql()[name])
    exp_cols, exp = list(rel.columns), rel.fetchall()
    act_cols, act = ALT_ORACLES[name](con)
    assert sorted(act_cols) == sorted(exp_cols)
    assert len(act) == len(exp)
    assert normalized_rows(act_cols, act) == normalized_rows(exp_cols, exp)


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
