#!/usr/bin/env python
"""Simulate the driver's verify loop end-to-end through the public
contract (__spark_entry__): entry() smoke, then every queries() entry
vs its oracle_sql() on DuckDB at the given sf, with a VANILLA
SparkSession (no engine tuning) — exactly how the driver calls us.

Usage: python scripts/driver_sim.py [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as contract
from tests.oracle_utils import normalized_rows

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# vanilla session: the driver does NOT apply our tuned confs.
# DRIVER_SIM_MEMORY sizes the single local JVM for big local SFs (sf1's
# 6M-row tables don't fit Spark's 1g default local heap) — it changes
# capacity only, never query semantics. DRIVER_SIM_MAX_RESULT likewise
# raises spark.driver.maxResultSize: the harness COLLECTS each result
# to hash it, and a multi-GB result set (sf10 LSH candidate pairs) hits
# the 1g default — a harness capacity limit, not an engine one.
_mem = os.environ.get("DRIVER_SIM_MEMORY")
_b = SparkSession.builder.master("local[8]").appName("driver-sim")
if _mem:
    _b = _b.config("spark.driver.memory", _mem)
_mrs = os.environ.get("DRIVER_SIM_MAX_RESULT")
if _mrs:
    _b = _b.config("spark.driver.maxResultSize", _mrs)
spark = _b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

df = contract.entry(spark)
rows = df.collect()
assert len(rows) > 0, "entry() returned 0 rows"
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")

con = duckdb.connect()
# DRIVER_SIM_DUCKDB_MEM: cap the oracle engine so a CTE that blows past
# box RAM at big local SFs (the sf1 k-gram / recursive-CC class,
# BASELINE §r) fails as a recorded per-entry error instead of OOM-killing
# the host. Unset = DuckDB default (80% of RAM), exactly as the driver.
_dmem = os.environ.get("DRIVER_SIM_DUCKDB_MEM")
if _dmem:
    con.sql(f"SET memory_limit='{_dmem}'")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

qs = contract.queries()
oracles = contract.oracle_sql()

# DRIVER_SIM_ONLY: comma-separated entry names — value-check a curated
# subset (e.g. the sf-sensitive families at a big local SF) instead of
# the full catalog. Default (unset): everything, exactly as the driver.
_only = os.environ.get("DRIVER_SIM_ONLY")
if _only:
    keep = {n.strip() for n in _only.split(",") if n.strip()}
    missing = keep - set(qs)
    assert not missing, f"unknown entries in DRIVER_SIM_ONLY: {missing}"
    qs = {n: fn for n, fn in qs.items() if n in keep}
# DRIVER_SIM_LEDGER: JSONL path — append one record per entry
# ({name, sf_dir, status, rows, secs[, detail]}) so long attestation
# sweeps (BASELINE §r) leave a durable, mergeable audit trail. With a
# ledger active, a per-entry crash is recorded and the sweep continues
# (the driver itself has no ledger and keeps its fail-fast semantics).
_ledger = os.environ.get("DRIVER_SIM_LEDGER")
# Each ledger row records the HEAD commit it was measured at, so resume
# can tell a green row on THIS code from a stale green written before an
# engine change (r8 advice: a stale green could mask a mid-round
# regression).
def _head_commit() -> str:
    try:
        import subprocess

        head = subprocess.run(
            ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        if not head:
            return "unknown"
        # a dirty tree is NOT the committed code: stamp it as such so
        # resume can't skip greens written against uncommitted edits
        # (r9 review — the stale-green case the stamp exists to catch)
        dirty = subprocess.run(
            ["git", "-C", "/root/repo", "status", "--porcelain"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        return f"{head}-dirty" if dirty else head
    except Exception:  # noqa: BLE001 - ledger provenance is best-effort
        return "unknown"


_COMMIT = _head_commit()

# DRIVER_SIM_RESUME=1 (requires a ledger): skip entries whose LATEST
# ledger row for this sf_dir is already a match — long sf1 sweeps
# interrupted mid-run continue where they left off instead of paying
# the finished entries again. Non-match rows (mismatch/error) re-run,
# and so does any green row written at a DIFFERENT commit (or with no
# commit recorded): resume is only valid within one unmodified sweep.
if _ledger and os.environ.get("DRIVER_SIM_RESUME") and os.path.exists(_ledger):
    _done_latest: dict[str, dict] = {}
    with open(_ledger) as _fh:
        for _line in _fh:
            _rec = json.loads(_line)
            if _rec.get("sf_dir") == SF_DIR:
                _done_latest[_rec["name"]] = _rec
    _skip = {
        n for n, r in _done_latest.items()
        if r["status"] in ("match", "rows_only")
        and r.get("commit") == _COMMIT
    }
    _stale = sum(
        1 for n, r in _done_latest.items()
        if r["status"] in ("match", "rows_only") and n not in _skip
    )
    if _skip or _stale:
        print(f"(resume: skipping {len(_skip)} ledger-green entries at "
              f"commit {_COMMIT}; re-running {_stale} stale-commit greens)")
        qs = {n: fn for n, fn in qs.items() if n not in _skip}
# DRIVER_SIM_ALT_ORACLES=1: for the two entries whose SQL oracle is a
# recursive CTE (the one DuckDB operator that cannot spill — OOMs at
# sf1, BASELINE §s), substitute the SQL-ITERATIVE oracle from
# scripts/alt_oracles.py — DuckDB end-to-end, with only the recursion
# replaced by a bounded loop of materialized label-propagation rounds
# (each round spills fine). Equivalence to the recursive-CTE oracle AND
# to the independent union-find is test-pinned at the SFs where all
# three run (tests/test_alt_oracles.py). Default off: the driver's own
# check never sees this path. Ledger rows taking the substituted path
# carry "oracle": "sql_iter".
_alt = {}
if os.environ.get("DRIVER_SIM_ALT_ORACLES"):
    from alt_oracles import ALT_ORACLES as _alt  # noqa: E402 (scripts/)

# DRIVER_SIM_HASH_AGG: comma-separated entry names that compare via the
# DISTRIBUTED order-insensitive hash (backend_etl_spark/attest.py)
# instead of collect-and-normalize — removes the maxResultSize capacity
# limit for multi-GB results (r11 verdict item 2): each engine reduces
# its result to (count, two commutative 60-bit-hash sums) entirely
# engine-side and only the scalars cross the driver. Strictness is
# equal-or-stricter than the collect path (floats via DECIMAL(38,6)
# instead of 12 significant digits); ledger rows carry
# "compare": "dist_hash".
_hash_agg = {
    n.strip()
    for n in (os.environ.get("DRIVER_SIM_HASH_AGG") or "").split(",")
    if n.strip()
}
if _hash_agg:
    from backend_etl_spark.attest import dist_hash_compare  # noqa: E402
    unknown_hash = _hash_agg - set(contract.queries())
    assert not unknown_hash, f"unknown entries in DRIVER_SIM_HASH_AGG: {unknown_hash}"


def _record(rec: dict) -> None:
    if _ledger:
        rec = {**rec, "commit": _COMMIT}
        with open(_ledger, "a") as fh:
            fh.write(json.dumps(rec) + "\n")


ok = bad = rows_only = errs = 0
for name, fn in qs.items():
    t0 = time.perf_counter()
    try:
        sdf = fn(spark, SF_DIR)
        if name not in oracles:
            n = sdf.count()
            print(f"  ~ {name}: rows-only, {n} rows")
            rows_only += 1
            _record({"name": name, "sf_dir": SF_DIR, "status": "rows_only",
                     "rows": n, "secs": round(time.perf_counter() - t0, 2)})
            continue
        alt_used = name in _alt
        hash_used = name in _hash_agg and not alt_used
        if hash_used:
            v = dist_hash_compare(sdf, con, oracles[name])
            schema_ok, count_ok, vals_ok = (
                v["schema_ok"], v["count_ok"], v["vals_ok"],
            )
            n_act, n_exp = v["n_spark"], v["n_oracle"]
        else:
            act_cols, act = list(sdf.columns), [tuple(r) for r in sdf.collect()]
            if alt_used:
                exp_cols, exp = _alt[name](con)
            else:
                rel = con.sql(oracles[name])
                exp_cols, exp = list(rel.columns), rel.fetchall()
            schema_ok = sorted(act_cols) == sorted(exp_cols)
            count_ok = len(act) == len(exp)
            vals_ok = normalized_rows(act_cols, act) == normalized_rows(exp_cols, exp)
            n_act, n_exp = len(act), len(exp)
    except Exception as exc:  # noqa: BLE001 - ledger sweeps keep going
        if not _ledger:
            raise
        errs += 1
        print(f"  x {name}: ERROR {type(exc).__name__}: {str(exc).splitlines()[0][:200]}")
        _record({"name": name, "sf_dir": SF_DIR, "status": "error",
                 "secs": round(time.perf_counter() - t0, 2),
                 "detail": f"{type(exc).__name__}: {str(exc)[:300]}"})
        continue
    secs = round(time.perf_counter() - t0, 2)
    extra = {"oracle": "sql_iter"} if alt_used else {}
    if hash_used:
        extra["compare"] = "dist_hash"
    if schema_ok and count_ok and vals_ok:
        ok += 1
        print(f"  + {name}: MATCH ({n_act} rows)"
              + (" [sql-iter oracle]" if alt_used else "")
              + (" [dist-hash]" if hash_used else ""))
        _record({"name": name, "sf_dir": SF_DIR, "status": "match",
                 "rows": n_act, "secs": secs, **extra})
    else:
        bad += 1
        print(f"  ! {name}: MISMATCH schema={schema_ok} count={count_ok} "
              f"({n_act} vs {n_exp}) values={vals_ok}")
        _record({"name": name, "sf_dir": SF_DIR, "status": "mismatch",
                 "rows": n_act, "secs": secs,
                 "detail": f"schema={schema_ok} count={count_ok} "
                           f"({n_act} vs {n_exp}) values={vals_ok}",
                 **extra})
print(f"\n{ok} match, {bad} mismatch, {rows_only} rows-only, "
      f"{errs} error of {len(qs)}")
# Ledger-mode errors are recorded rather than raised, but they still mean
# the sweep is not green — exit nonzero so callers keying on status agree
# with the ledger.
sys.exit(1 if (bad or errs) else 0)
