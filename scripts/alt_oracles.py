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

Used by scripts/driver_sim.py under DRIVER_SIM_ALT_ORACLES=1; the
driver's own sf0.01 check never sees this path. Since r11 the default
substitution is the SQL-ITERATIVE form below (DuckDB end-to-end, only
the recursion replaced by a bounded materialized loop; ledger rows
marked "oracle": "sql_iter"); the union-find stays as an independent
algorithmic cross-check (UNION_FIND_ORACLES).
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


# ---------------------------------------------------------------------------
# SQL-iterative label propagation (r10 verdict item 5): the recursive
# CTE's transitive closure is the ONLY piece of the primary oracle that
# can't spill — so replace just the recursion with a bounded loop of
# materialized DuckDB temp tables (one min-label propagation round per
# statement, exactly the engine's own iteration scheme). Every round is
# ordinary hash-join + group-by, which DuckDB spills fine under a
# memory cap, so the sf1 ledger rows for the two CC entries attest via
# DuckDB SQL end-to-end rather than a Python union-find. Equivalence to
# the recursive-CTE oracle AND to the union-find is pinned at
# sf0.001/sf0.01 by tests/test_alt_oracles.py.
# ---------------------------------------------------------------------------

_MAX_LP_ROUNDS = 64  # >> any LSH near-dup cluster diameter observed


def _components_sql_iter(con) -> None:
    """Materialize temp table cc_labels(node, label) = connected
    components of the LSH candidate graph via min-label propagation,
    run to fixpoint (verified: a round with zero label changes)."""
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE cc_edges AS WITH {_BANDS_CTE} "
        "SELECT doc_a AS src, doc_b AS dst FROM cand "
        "UNION ALL SELECT doc_b, doc_a FROM cand"
    )
    con.execute(
        "CREATE OR REPLACE TEMP TABLE cc_labels AS "
        "SELECT doc_id AS node, doc_id AS label FROM documents"
    )
    for _ in range(_MAX_LP_ROUNDS):
        con.execute(
            "CREATE OR REPLACE TEMP TABLE cc_next AS "
            "SELECT node, min(label) AS label FROM ("
            "  SELECT node, label FROM cc_labels"
            "  UNION ALL"
            "  SELECT e.dst AS node, l.label"
            "  FROM cc_labels l JOIN cc_edges e ON e.src = l.node"
            ") GROUP BY node"
        )
        changed = con.sql(
            "SELECT count(*) FROM cc_next n JOIN cc_labels o "
            "ON o.node = n.node WHERE o.label <> n.label"
        ).fetchone()[0]
        con.execute(
            "CREATE OR REPLACE TEMP TABLE cc_labels AS SELECT * FROM cc_next"
        )
        if changed == 0:
            return
    raise RuntimeError(
        f"label propagation did not converge in {_MAX_LP_ROUNDS} rounds"
    )


def dedup_cluster_components_sql_iter(con) -> tuple[list[str], list[tuple]]:
    _components_sql_iter(con)
    rel = con.sql("SELECT node AS doc_id, label AS cluster_id FROM cc_labels")
    return list(rel.columns), rel.fetchall()


def dedup_keep_best_in_cluster_sql_iter(con) -> tuple[list[str], list[tuple]]:
    _components_sql_iter(con)
    rel = con.sql(
        """
        WITH m AS (
          SELECT l.label AS cluster_id, d.doc_id, d.n_chars
          FROM cc_labels l JOIN documents d ON d.doc_id = l.node),
        r AS (
          SELECT m.*,
                 count(*) OVER (PARTITION BY cluster_id) AS n_members,
                 row_number() OVER (
                   PARTITION BY cluster_id
                   ORDER BY n_chars DESC, doc_id) AS rn
          FROM m)
        SELECT cluster_id, doc_id AS kept_doc_id,
               n_chars AS kept_n_chars, n_members
        FROM r WHERE rn = 1
        """
    )
    return list(rel.columns), rel.fetchall()


# ---------------------------------------------------------------------------
# Staged two-level k-means oracle for dedup_semantic_semdedup (r11
# verdict item 3): the primary oracle unrolls coarse fit + per-cell
# fine fit + pair stage into ONE CTE DAG, which DuckDB plans as a
# single pipeline whose working set at sf10 (~40 GB of live
# intermediates) exceeds any sane memory cap — temp-table
# materialization is what lets each phase complete and SPILL before the
# next starts (the same loop-of-temp-tables pattern that retired the
# recursive-CTE carve-out, commit 0b734de). Every expression below is
# copied verbatim from _kmeans_cte/_sem_fine_cte semantics
# (catalog/llmops2.py): literal n/k₁ substituted for the correlated
# count (computed with the same greatest/floor-div/sqrt arithmetic),
# identical 6-dp rounds, identical tie-breaks. Equivalence to the
# primary oracle is pinned at sf0.001/sf0.01 by
# tests/test_alt_oracles.py.
# ---------------------------------------------------------------------------

_SEM_K = 8          # _KM_K
_SEM_ITERS = 3      # _KM_ITERS
_SEM_TARGET = 100


def _sem_dd(left_v: str, right_cv: str) -> str:
    """6-dp-rounded squared L2 between a point and a centroid —
    byte-identical expression to the CTE oracle's."""
    return (
        f"round(list_reduce(list_transform(range(len({left_v})), "
        f"j -> ({left_v}[j+1] - {right_cv}[j+1]) * "
        f"({left_v}[j+1] - {right_cv}[j+1])), (x, y) -> x + y), 6)"
    )


def dedup_semantic_semdedup_staged(con) -> tuple[list[str], list[tuple]]:
    import math

    con.execute(
        "CREATE OR REPLACE TEMP TABLE sem_e AS "
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"
    )
    n = con.sql("SELECT count(*) FROM sem_e").fetchone()[0]
    kt = max(_SEM_K, n // _SEM_TARGET)
    k1 = max(_SEM_K, int(math.floor(math.sqrt(float(kt)))))
    con.execute(
        f"""
        CREATE OR REPLACE TEMP TABLE sem_c AS
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
               v AS cv
        FROM (SELECT vec_id, v,
                     row_number() OVER (ORDER BY vec_id) AS seed_rn
              FROM sem_e WHERE vec_id % greatest({n} // {k1}, 1) = 0)
        WHERE seed_rn <= {k1}
        """
    )
    for i in range(_SEM_ITERS):
        con.execute(
            f"""
            CREATE OR REPLACE TEMP TABLE sem_a AS
            SELECT vec_id, v, cid AS cluster, dd
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                               ORDER BY dd, cid) AS rn
                  FROM (SELECT e.vec_id, e.v, c.cid,
                               {_sem_dd('e.v', 'c.cv')} AS dd
                        FROM sem_e e, sem_c c))
            WHERE rn = 1
            """
        )
        if i < _SEM_ITERS - 1:
            con.execute(
                """
                CREATE OR REPLACE TEMP TABLE sem_c AS
                SELECT cluster AS cid, array_agg(cv_d ORDER BY dim) AS cv
                FROM (SELECT cluster, dim, round(avg(val), 6) AS cv_d
                      FROM (SELECT cluster, unnest(v) AS val,
                                   generate_subscripts(v, 1) AS dim
                            FROM sem_a)
                      GROUP BY cluster, dim)
                GROUP BY cluster
                """
            )
    con.execute(
        "CREATE OR REPLACE TEMP TABLE sem_cellpts AS "
        "SELECT vec_id, v, cluster AS cell FROM sem_a"
    )
    con.execute(
        f"""
        CREATE OR REPLACE TEMP TABLE sem_kf AS
        SELECT cell, count(*) AS cn,
               greatest(count(*) // {_SEM_TARGET}, 1) AS kfk,
               greatest(count(*) //
                        greatest(count(*) // {_SEM_TARGET}, 1), 1) AS stride
        FROM sem_cellpts GROUP BY cell
        """
    )
    con.execute(
        """
        CREATE OR REPLACE TEMP TABLE sem_f AS
        SELECT cell, CAST(rn - 1 AS INT) AS fid, v AS cv
        FROM (SELECT cell, v, kfk,
                     row_number() OVER (PARTITION BY cell
                                        ORDER BY vec_id) AS rn
              FROM (SELECT p.cell, p.vec_id, p.v, k.kfk,
                           row_number() OVER (PARTITION BY p.cell
                                              ORDER BY p.vec_id) - 1 AS rk,
                           k.stride
                    FROM sem_cellpts p JOIN sem_kf k USING (cell))
              WHERE rk % stride = 0)
        WHERE rn <= kfk
        """
    )
    for i in range(_SEM_ITERS):
        con.execute(
            f"""
            CREATE OR REPLACE TEMP TABLE sem_fa AS
            SELECT vec_id, v, cell, fid
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                               ORDER BY dd, fid) AS rn
                  FROM (SELECT p.vec_id, p.v, p.cell, f.fid,
                               {_sem_dd('p.v', 'f.cv')} AS dd
                        FROM sem_cellpts p JOIN sem_f f USING (cell)))
            WHERE rn = 1
            """
        )
        if i < _SEM_ITERS - 1:
            con.execute(
                """
                CREATE OR REPLACE TEMP TABLE sem_f AS
                SELECT cell, fid, array_agg(cv_d ORDER BY dim) AS cv
                FROM (SELECT cell, fid, dim, round(avg(val), 6) AS cv_d
                      FROM (SELECT cell, fid, unnest(v) AS val,
                                   generate_subscripts(v, 1) AS dim
                            FROM sem_fa)
                      GROUP BY cell, fid, dim)
                GROUP BY cell, fid
                """
            )
    con.execute(
        "CREATE OR REPLACE TEMP TABLE semfinal AS "
        "SELECT vec_id, v, CAST(cell AS BIGINT) * 1000000 + fid AS cluster "
        "FROM sem_fa"
    )
    con.execute(
        """
        CREATE OR REPLACE TEMP TABLE sem_drop AS
        SELECT DISTINCT y.vec_id AS vb
        FROM semfinal x JOIN semfinal y
          ON x.cluster = y.cluster AND x.vec_id < y.vec_id
        WHERE round(list_dot_product(x.v, y.v)
                    / (sqrt(list_dot_product(x.v, x.v))
                       * sqrt(list_dot_product(y.v, y.v))), 6) >= 0.3
        """
    )
    rel = con.sql(
        "SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, "
        "vec_id NOT IN (SELECT vb FROM sem_drop) AS kept FROM semfinal"
    )
    return list(rel.columns), rel.fetchall()


#: entry name -> callable(duckdb_con) -> (cols, rows). The DEFAULT
#: substitution is the SQL-iterative form (DuckDB end-to-end); the
#: union-find versions remain as an independent cross-check.
ALT_ORACLES = {
    "dedup_cluster_components": dedup_cluster_components_sql_iter,
    "dedup_keep_best_in_cluster": dedup_keep_best_in_cluster_sql_iter,
    "dedup_semantic_semdedup": dedup_semantic_semdedup_staged,
}

UNION_FIND_ORACLES = {
    "dedup_cluster_components": dedup_cluster_components,
    "dedup_keep_best_in_cluster": dedup_keep_best_in_cluster,
}
