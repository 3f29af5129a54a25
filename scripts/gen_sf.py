#!/usr/bin/env python
"""Generate a larger scale factor of the driver's synthetic star schema
(TESTDATA.md) so the scale sweep can measure a real decade above sf0.1.

The driver's own generator is not available, so this reproduces the
OBSERVED shape of /root/testdata/sf0.1: same schemas (column names,
arrow types), same categorical domains (sampled from the real tables,
not guessed), same value ranges/date windows (orders 1995..2001-08,
events Jan-2024 — the EWMA calendar), linearly scaled row counts, and
the same structural quirks that the catalog's operators exercise
(normalized 64-dim embeddings with 10 labels, ~uniform 31-word document
vocab with 10..100-word docs and a handful of exact duplicate texts,
Poisson(4) lineitems per order).

Timing comparisons across SFs stay apples-to-apples; the oracle SQL is
SF-agnostic, so driver_sim can also value-check the catalog here.

Usage: python scripts/gen_sf.py [sf] [outdir] [--skew A] [--tables T1,T2]
       defaults: sf=1 outdir=/root/repo/.localdata/sf1 all tables

``--skew A`` (e.g. 1.2) draws ``events.user_id`` and
``orders.o_custkey`` from a ranked Zipf(A) law over the same key
domains instead of uniform — the hot-PARTITION failure mode a 100 TB
deployment actually hits (one viral tenant owning a double-digit share
of a table), which uniform synthetic data can never exercise (r11
verdict item 6). Row counts, schemas, and every other column are
BIT-identical to the uniform build — the Zipf draw comes from a
spawned child generator while the main stream still consumes the
uniform draw it replaces (r12 ADVICE: the old in-stream rng.choice
shifted every subsequently generated column; the claim is verified
column-for-column at sf0.001 in r14 — only the two skewed key columns
differ between builds) — so salted-vs-unsalted
timings are apples-to-apples; the default outdir gains a ``_skew``
suffix so a skewed build can never shadow the canonical uniform one.

``--tables`` restricts generation to a comma list (r12 verdict item 3:
sf100 is generated ONLY for the tables the flat-slope spot checks
read — documents, embeddings, orders — lineitem's 600M rows excluded).
Key domains are computed, not read, so cross-table references stay
valid; note a subset build consumes the RNG stream differently than a
full build, so only same-``--tables`` builds are bit-comparable.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/testdata/sf0.1"  # observed-shape source (read-only)
REF_SF = 0.1

# sf0.1 row counts (TESTDATA.md); scaled linearly by sf/0.1
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

DAY_US = 86_400_000_000


def _distinct(table: str, col: str) -> list:
    t = pq.read_table(f"{REF}/{table}.parquet", columns=[col])
    return sorted(set(t.column(col).to_pylist()))


def _write(outdir: str, name: str, table: pa.Table) -> None:
    path = f"{outdir}/{name}.parquet"
    # Row-group sizing matters: Spark parallelizes a parquet scan at ROW
    # GROUP granularity, and pyarrow's default (1M rows/group) packs a
    # 500k-row sf10 documents table into ONE group — a serial scan that
    # made every map-heavy docs entry look super-linear (text_quality
    # 1.6→87 s across the sf1→sf10 decade; BASELINE §x). ≥64 groups per
    # table keeps a 32-thread local scan fully parallel — the same
    # reason a real 100 TB corpus is thousands of files, never one.
    rg = max(8192, min(1_048_576, table.num_rows // 64 or 1))
    pq.write_table(table, path, compression="snappy", row_group_size=rg)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _zipf_keys(rng, n_keys: int, n_draws: int, a: float) -> np.ndarray:
    """Ranked-Zipf draw over [0, n_keys): P(key=i) ∝ 1/(i+1)^a. Key 0 is
    the hottest — measured at a=1.2, n_keys=15k: it owns ~21% of all
    rows and the top-5 ~42% (the viral-tenant shape real activity
    tables show)."""
    w = 1.0 / np.power(np.arange(1, n_keys + 1, dtype=np.float64), a)
    return rng.choice(n_keys, n_draws, p=w / w.sum()).astype(np.int64)


def main() -> None:
    argv = sys.argv[1:]
    skew_a = 0.0
    if "--skew" in argv:
        i = argv.index("--skew")
        skew_a = float(argv[i + 1])
        del argv[i : i + 2]
    only: set[str] | None = None
    if "--tables" in argv:
        i = argv.index("--tables")
        only = {t.strip() for t in argv[i + 1].split(",") if t.strip()}
        del argv[i : i + 2]
        known = set(BASE) | {"region", "nation"}
        unknown = only - known
        if unknown:
            raise SystemExit(f"--tables: unknown tables {sorted(unknown)}")
    args = [a for a in argv if not a.startswith("--")]
    sf = float(args[0]) if args else 1.0
    outdir = args[1] if len(args) > 1 else "/root/repo/.localdata/sf1"
    if skew_a and len(args) <= 1:
        outdir += "_skew"
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)
    # skewed key draws come from an independent child stream so every
    # OTHER column stays bit-identical to the uniform build (the main
    # stream still consumes the uniform draw the Zipf one replaces)
    zipf_rng = rng.spawn(1)[0]
    mult = sf / REF_SF
    n = {k: int(v * mult) for k, v in BASE.items()}

    def want(table: str) -> bool:
        return only is None or table in only

    def _keys(n_keys: int, n_draws: int) -> np.ndarray:
        uniform = rng.integers(0, n_keys, n_draws).astype(np.int64)
        if skew_a:
            return _zipf_keys(zipf_rng, n_keys, n_draws, skew_a)
        return uniform

    # fixed dims: copy verbatim (identical at every sf)
    for t in ("region", "nation"):
        if want(t):
            _write(outdir, t, pq.read_table(f"{REF}/{t}.parquet"))

    if want("customer"):
        # --- customer ---------------------------------------------------------
        nc = n["customer"]
        keys = np.arange(nc, dtype=np.int64)
        _write(outdir, "customer", pa.table({
            "c_custkey": keys,
            "c_name": pa.array([f"Customer#{k:09d}" for k in keys]),
            "c_nationkey": rng.integers(0, 25, nc).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, nc), 2),
            "c_mktsegment": pa.array(
                rng.choice(_distinct("customer", "c_mktsegment"), nc)
            ),
        }))

    if want("supplier"):
        # --- supplier ---------------------------------------------------------
        ns = n["supplier"]
        keys = np.arange(ns, dtype=np.int64)
        _write(outdir, "supplier", pa.table({
            "s_suppkey": keys,
            "s_name": pa.array([f"Supplier#{k:09d}" for k in keys]),
            "s_nationkey": rng.integers(0, 25, ns).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, ns), 2),
        }))

    if want("part"):
        # --- part -------------------------------------------------------------
        np_ = n["part"]
        keys = np.arange(np_, dtype=np.int64)
        _write(outdir, "part", pa.table({
            "p_partkey": keys,
            "p_name": pa.array(rng.choice(_distinct("part", "p_name"), np_)),
            "p_brand": pa.array(rng.choice(_distinct("part", "p_brand"), np_)),
            "p_type": pa.array(rng.choice(_distinct("part", "p_type"), np_)),
            "p_size": rng.integers(1, 51, np_).astype(np.int32),
            # observed: 900 + 0.1 * (p_partkey % 1000)
            "p_retailprice": np.round(900.0 + 0.1 * (keys % 1000), 1),
        }))

    if want("orders"):
        # --- orders -----------------------------------------------------------
        no = n["orders"]
        keys = np.arange(no, dtype=np.int64)
        d0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
        d1 = np.datetime64("2001-08-01").astype("datetime64[us]").astype(np.int64)
        odate_us = (
            d0 + rng.integers(0, (d1 - d0) // DAY_US + 1, no) * DAY_US
        )
        _write(outdir, "orders", pa.table({
            "o_orderkey": keys,
            "o_custkey": _keys(n["customer"], no),
            "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], no)),
            "o_totalprice": np.round(rng.uniform(1000, 500000, no), 2),
            "o_orderdate": pa.array(odate_us, type=pa.timestamp("us")),
            "o_orderpriority": pa.array(
                rng.choice(_distinct("orders", "o_orderpriority"), no)
            ),
        }))

    if want("lineitem"):
        # --- lineitem (Poisson(4) lines per order via uniform orderkeys) -----
        nl = n["lineitem"]
        s0 = np.datetime64("1995-01-02").astype("datetime64[us]").astype(np.int64)
        s1 = np.datetime64("2001-11-04").astype("datetime64[us]").astype(np.int64)
        _write(outdir, "lineitem", pa.table({
            "l_orderkey": np.sort(
                rng.integers(0, n["orders"], nl).astype(np.int64)
            ),
            "l_partkey": rng.integers(0, n["part"], nl).astype(np.int64),
            "l_suppkey": rng.integers(0, n["supplier"], nl).astype(np.int64),
            "l_linenumber": rng.integers(1, 8, nl).astype(np.int32),
            "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, nl), 2),
            "l_discount": np.round(rng.integers(0, 11, nl) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, nl) * 0.01, 2),
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], nl)),
            "l_linestatus": pa.array(rng.choice(["F", "O"], nl)),
            "l_shipdate": pa.array(
                s0 + rng.integers(0, (s1 - s0) // DAY_US + 1, nl) * DAY_US,
                type=pa.timestamp("us"),
            ),
        }))

    if want("events"):
        # --- events (Jan 2024 window — keeps the EWMA calendar valid) --------
        ne = n["events"]
        e0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
        e1 = np.datetime64("2024-01-31").astype("datetime64[us]").astype(np.int64)
        n_users = int(1500 * mult)
        kvals = rng.integers(0, 100, ne)
        _write(outdir, "events", pa.table({
            "event_id": np.arange(ne, dtype=np.int64),
            "ts": pa.array(rng.integers(e0, e1, ne), type=pa.timestamp("us")),
            "user_id": _keys(n_users, ne),
            "event_type": pa.array(
                rng.choice(["click", "error", "purchase", "signup", "view"], ne)
            ),
            "value": np.round(rng.uniform(0, 100, ne), 6),
            "props": pa.array([f'{{"k": {k}}}' for k in kvals]),
        }))

    if want("documents"):
        # --- documents (31-word vocab, 10..100 words, ~0.15% exact dups) -----
        nd = n["documents"]
        vocab = np.array(sorted({
            w
            for row in pq.read_table(f"{REF}/documents.parquet", columns=["text"])
            .column("text")
            .to_pylist()[:500]
            for w in row.split(" ")
        }))
        lens = rng.integers(10, 101, nd)
        words = rng.choice(vocab, int(lens.sum()))
        texts, pos = [], 0
        for ln in lens:
            texts.append(" ".join(words[pos : pos + ln]))
            pos += ln
        for i in rng.integers(1, nd, max(nd // 650, 1)):  # exact near-clone pairs
            texts[int(i)] = texts[int(i) - 1]
        langs = rng.choice(
            ["en", "zh", "es", "fr", "de"], nd, p=[0.41, 0.15, 0.15, 0.15, 0.14]
        )
        _write(outdir, "documents", pa.table({
            "doc_id": np.arange(nd, dtype=np.int64),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array([f"src{v}" for v in rng.integers(0, 20, nd)]),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }))

    if want("embeddings"):
        # --- embeddings (L2-normalized 64-dim, 10 weak label clusters) -------
        nv = n["embeddings"]
        labels = rng.integers(0, 10, nv).astype(np.int32)
        centers = rng.normal(0, 0.2, (10, 64))
        vecs = centers[labels] + rng.normal(0, 1.0, (nv, 64))
        vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
            np.float32
        )
        _write(outdir, "embeddings", pa.table({
            "vec_id": np.arange(nv, dtype=np.int64),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), 64
            ).cast(pa.list_(pa.float32())),
            "label": labels,
        }))

    print(
        f"sf{sf} written to {outdir}"
        + (f" (zipf skew a={skew_a} on events.user_id, orders.o_custkey)"
           if skew_a else "")
    )


if __name__ == "__main__":
    main()
