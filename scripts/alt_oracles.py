"""Alternate (non-SQL) oracle implementations for the two catalog
entries whose DuckDB oracle is a RECURSIVE CTE — the one DuckDB
operator class that cannot spill under a memory cap, so at sf1 the
checker (not the engine) OOMs after ~20 min (BASELINE §s, r7 ledger).

The replacement keeps DuckDB for everything it CAN do at any SF — the
minhash/LSH banding CTE that produces the candidate edge list spills
fine — and swaps only the transitive closure for a Python union-find
with path compression + union by size: O(E α(N)) instead of the CTE's
materialized reach set (which is O(N·diameter) rows and must stay in
RAM). At sf1 that is 50k nodes / ~3.8M candidate edges — well under a
second of Python, vs a 44.7 GiB OOM.

Equivalence to the recursive-CTE oracle is asserted by
tests/test_alt_oracles.py at sf0.001 and sf0.01, where both oracles
are feasible and must agree row-for-row.

Used by scripts/driver_sim.py under DRIVER_SIM_ALT_ORACLES=1 (ledger
rows are marked "oracle": "alt"); the driver's own sf0.01 check never
sees this path.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from backend_etl_spark.catalog.llmops import _BANDS_CTE  # noqa: E402

_EDGES_SQL = f"WITH {_BANDS_CTE} SELECT doc_a, doc_b FROM cand"


def _components(con) -> dict[int, int]:
    """doc_id -> cluster_id (= min doc_id in its connected component)
    over the LSH candidate graph, singletons included — the same
    semantics as the recursive reach/min(label) CTE."""
    nodes = [r[0] for r in con.sql("SELECT doc_id FROM documents").fetchall()]
    parent: dict[int, int] = {n: n for n in nodes}
    size: dict[int, int] = {n: 1 for n in nodes}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in con.sql(_EDGES_SQL).fetchall():
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if size[ra] < size[rb]:  # union by size
            ra, rb = rb, ra
        parent[rb] = ra
        size[ra] += size[rb]

    # min doc_id per root, then label every node with its root's min
    root_min: dict[int, int] = {}
    roots = {n: find(n) for n in nodes}
    for n, r in roots.items():
        m = root_min.get(r)
        if m is None or n < m:
            root_min[r] = n
    return {n: root_min[r] for n, r in roots.items()}


def dedup_cluster_components(con) -> tuple[list[str], list[tuple]]:
    comp = _components(con)
    return ["doc_id", "cluster_id"], [(n, c) for n, c in comp.items()]


def dedup_keep_best_in_cluster(con) -> tuple[list[str], list[tuple]]:
    comp = _components(con)
    chars = dict(con.sql("SELECT doc_id, n_chars FROM documents").fetchall())
    by_cluster: dict[int, list[int]] = {}
    for n, c in comp.items():
        by_cluster.setdefault(c, []).append(n)
    rows = []
    for c, members in by_cluster.items():
        # longest doc wins, tie -> smallest doc_id (the window's
        # ORDER BY n_chars DESC, doc_id)
        kept = min(members, key=lambda d: (-chars[d], d))
        rows.append((c, kept, int(chars[kept]), len(members)))
    return ["cluster_id", "kept_doc_id", "kept_n_chars", "n_members"], rows


#: entry name -> callable(duckdb_con) -> (cols, rows)
ALT_ORACLES = {
    "dedup_cluster_components": dedup_cluster_components,
    "dedup_keep_best_in_cluster": dedup_keep_best_in_cluster,
}
