#!/usr/bin/env python
"""Hash-family width cost curve (VERDICT r1 item 9).

Measures, at the given SF:
- MinHash+LSH candidate generation for 4 / 8 / 16 bands: wall time,
  candidate-pair count, and recall/precision against exact-Jaccard
  truth (pairs with n-gram Jaccard >= 0.7 among the union of all
  configs' candidates — wider bands only ever ADD candidates, so the
  union is the best available ground-truth pool).
- SimHash for 16 / 32 / 63 bits: wall time (63 = max width that fits a
  signed BIGINT fingerprint; production 64+ would split words).

Defaults in the oracle catalog stay at 4 bands / 16 bits — this script
records what widening to production-recall widths costs.

Usage: python scripts/hash_width_bench.py [sf_dir]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from backend_etl_spark.operators import dedup
from backend_etl_spark.session import get_spark
from backend_etl_spark.sources.loader import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
JACCARD_TRUTH = 0.7

spark = get_spark("hash-width-bench")
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

# warmup: spin the session/scan once so config #1 isn't charged for it
docs.count()
dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=2).count()

# (num_hashes, rows_per_band): r=1 = parity default (permissive);
# r>1 = the production S-curve precision knob
CONFIGS = [(4, 1), (8, 1), (16, 1), (16, 2), (16, 4)]
minhash = {}
cands = {}
for nh, r in CONFIGS:
    key = f"h{nh}_r{r}"
    t0 = time.perf_counter()
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=nh)
    pairs = dedup.lsh_candidate_pairs(sigs, "doc_id", num_hashes=nh, rows_per_band=r)
    pairset = {(r_["doc_a"], r_["doc_b"]) for r_ in pairs.collect()}
    dt = time.perf_counter() - t0
    cands[key] = pairset
    minhash[key] = {
        "num_hashes": nh, "rows_per_band": r,
        "sec": round(dt, 3), "candidates": len(pairset),
    }

union_pairs = sorted(set().union(*cands.values()))
union_df = spark.createDataFrame(union_pairs, "doc_a BIGINT, doc_b BIGINT")
jac = dedup.jaccard_pairs(docs, "doc_id", "text", candidates=union_df)
truth = {
    (r["doc_a"], r["doc_b"])
    for r in jac.where(F.col("jaccard") >= JACCARD_TRUTH).collect()
}
for key, pairset in cands.items():
    hit = len(pairset & truth)
    minhash[key]["recall"] = round(hit / len(truth), 4) if truth else None
    minhash[key]["precision"] = round(hit / len(pairset), 4) if pairset else None

simhash = {}
for bits in (16, 32, 63):
    t0 = time.perf_counter()
    n = dedup.simhash(docs, "doc_id", "text", bits=bits).count()
    simhash[bits] = {"sec": round(time.perf_counter() - t0, 3), "rows": n}

out = {
    "sf_dir": SF_DIR,
    "jaccard_truth_threshold": JACCARD_TRUTH,
    "truth_pairs": len(truth),
    "minhash_lsh": minhash,
    "simhash": simhash,
}
print(json.dumps(out))
