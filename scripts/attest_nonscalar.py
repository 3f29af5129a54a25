#!/usr/bin/env python
"""Collect-free attestation of NON-SCALAR relations (r12 verdict item 1).

Every catalog entry flattens its output to scalar columns — that was a
hard requirement while the distributed hash (backend_etl_spark/attest.py)
rejected arrays/structs/binary, since anything else could only attest by
collecting. With the canonical non-scalar renderings in place this script
attests the three relation shapes the flattening used to hide, over the
REAL tables at any SF — the intermediates a 100 TB pipeline ships
between stages (signature arrays, raw embedding vectors, binary
payloads), exactly the results that outgrow the driver first:

- ``nonscalar_minhash_signature_arrays`` — (doc_id, signature ARRAY<STRING>),
  the pre-flatten form of ``dedup_minhash_signatures``;
- ``nonscalar_embedding_vectors`` — (vec_id, embedding ARRAY<FLOAT>, label),
  the raw 64-dim vectors (floats exercise the round-6 element path);
- ``nonscalar_binary_payloads`` — (doc_id, content BINARY, meta STRUCT),
  UTF-8 payload bytes plus a struct column, the multimodal shape.

Each runs Spark vs the DuckDB oracle through dist_hash_compare — only
(count, two 60-bit hash sums) cross the driver — and appends a ledger
row ({name, sf_dir, status, rows, secs, compare: dist_hash}).

Usage: python scripts/attest_nonscalar.py [sf_dir] [ledger_path]
       defaults: /root/testdata/sf0.01, no ledger (stdout only)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from backend_etl_spark.attest import dist_hash_compare  # noqa: E402
from backend_etl_spark.catalog import REGISTRY  # noqa: E402
from backend_etl_spark.session import get_spark  # noqa: E402


def minhash_signature_arrays(spark, sf_dir):
    flat = REGISTRY["dedup_minhash_signatures"].fn(spark, sf_dir)
    return flat.select(
        "doc_id", F.array("mh0", "mh1", "mh2", "mh3").alias("signature")
    )


def minhash_signature_arrays_sql():
    return (
        "SELECT doc_id, [mh0, mh1, mh2, mh3] AS signature FROM ("
        + REGISTRY["dedup_minhash_signatures"].oracle
        + ") _flat"
    )


def embedding_vectors(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )


def embedding_vectors_sql():
    return "SELECT vec_id, embedding, label FROM embeddings"


def binary_payloads(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.col("text").cast("binary").alias("content"),
        F.struct("lang", "source", "n_chars").alias("meta"),
    )


def binary_payloads_sql():
    return (
        "SELECT doc_id, encode(text) AS content, "
        "{'lang': lang, 'source': source, 'n_chars': n_chars} AS meta "
        "FROM documents"
    )


QUERIES = {
    "nonscalar_minhash_signature_arrays": (
        minhash_signature_arrays, minhash_signature_arrays_sql,
    ),
    "nonscalar_embedding_vectors": (
        embedding_vectors, embedding_vectors_sql,
    ),
    "nonscalar_binary_payloads": (
        binary_payloads, binary_payloads_sql,
    ),
}

TABLES = ("documents", "embeddings")


def run(sf_dir: str, ledger: str | None = None) -> int:
    spark = get_spark("attest-nonscalar")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name, (fn, sql_fn) in QUERIES.items():
        t0 = time.perf_counter()
        v = dist_hash_compare(fn(spark, sf_dir), con, sql_fn())
        secs = round(time.perf_counter() - t0, 2)
        ok = v["schema_ok"] and v["count_ok"] and v["vals_ok"]
        status = "match" if ok else "mismatch"
        print(f"  {'+' if ok else '!'} {name}: {status.upper()} "
              f"({v['n_spark']} rows, {secs}s) [dist-hash]")
        failures += 0 if ok else 1
        if ledger:
            with open(ledger, "a") as fh:
                fh.write(json.dumps({
                    "name": name, "sf_dir": sf_dir, "status": status,
                    "rows": v["n_spark"], "secs": secs,
                    "compare": "dist_hash",
                }) + "\n")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    led = sys.argv[2] if len(sys.argv) > 2 else None
    sys.exit(1 if run(os.path.abspath(sf), led) else 0)
