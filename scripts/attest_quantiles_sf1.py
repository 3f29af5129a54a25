#!/usr/bin/env python
"""Attest the production (GK-sketch) quantile path's rank contract at
sf1, fully distributed (r10 verdict item 4).

For each (table, group, q) shape the sketch path serves, the returned
value v's achievable rank range in the group is computed IN SPARK —
``count(x < v) + 1 .. count(x <= v)`` via one conditional aggregate per
group after broadcasting the tiny sketch-result frame — and compared to
the GK band ``[(q − ε)·n, (q + ε)·n]`` (ε = 1/accuracy). No group is
ever collected: the check itself uses the same mergeable-aggregate
discipline the production path exists for, so it runs at any SF.

Writes .ledger/quantiles_sf1.json with the per-check rank errors (in
units of ε) and a histogram; exits nonzero if any check violates the
bound. Usage: python scripts/attest_quantiles_sf1.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pyspark.sql.functions as F  # noqa: E402

from backend_etl_spark.operators.quantiles import (  # noqa: E402
    DEFAULT_ACCURACY,
    group_quantiles_production,
)
from backend_etl_spark.session import get_spark, tune  # noqa: E402
from backend_etl_spark.sources.loader import load_table  # noqa: E402

SHAPES = [
    ("orders", "o_orderstatus", "o_totalprice", [0.25, 0.50, 0.90, 0.99]),
    ("lineitem", "l_returnflag", "l_extendedprice", [0.5, 0.9]),
]

EPS = 1.0 / DEFAULT_ACCURACY


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, ".localdata/sf1"
    )
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("quantiles-sf1-attest")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)

    checks = []
    for table, gcol, vcol, qs in SHAPES:
        df = load_table(spark, sf_dir, table)
        prod = group_quantiles_production(df, [gcol], vcol, qs, round_dp=6)
        # melt (group, q, v) — a handful of rows; broadcast into the
        # rank-counting aggregate over the full table
        names = [f"p{round(q * 100):d}" for q in qs]
        qv = prod.select(
            gcol,
            F.stack(
                F.lit(len(qs)),
                *[
                    x
                    for q, nm in zip(qs, names)
                    for x in (F.lit(q), F.col(nm))
                ],
            ).alias("q", "v"),
        )
        ranks = (
            df.select(F.col(gcol).alias("g"), F.col(vcol).alias("x"))
            .join(F.broadcast(qv), F.col("g") == F.col(gcol))
            .groupBy("g", "q", "v")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("x") < F.col("v")).cast("bigint")).alias("lt"),
                F.sum((F.col("x") <= F.col("v")).cast("bigint")).alias("le"),
            )
        )
        for r in ranks.collect():
            import math

            n, lo_rank, hi_rank = r["n"], r["lt"] + 1, r["le"]
            target = r["q"] * n
            # the DOCUMENTED percentile_approx contract (and the sf0.1
            # test's convention): floor((q−ε)·n) ≤ rank ≤ ceil((q+ε)·n)
            # — ranks are integers, so the band edges round outward
            band_lo = math.floor((r["q"] - EPS) * n)
            band_hi = math.ceil((r["q"] + EPS) * n)
            ok = lo_rank <= band_hi and hi_rank >= band_lo
            # signed distance of the achievable-rank RANGE from the
            # target rank, in units of the guarantee ε·n (≤1.0 = within
            # contract; the histogram shows the real margin)
            if hi_rank < target:
                err = (target - hi_rank) / (EPS * n)
            elif lo_rank > target:
                err = (lo_rank - target) / (EPS * n)
            else:
                err = 0.0
            checks.append(
                {
                    "table": table,
                    "group": str(r["g"]),
                    "q": r["q"],
                    "n": int(n),
                    "rank_range": [int(lo_rank), int(hi_rank)],
                    "target_rank": round(target, 1),
                    "rank_err_over_eps": round(err, 4),
                    "ok": bool(ok),
                }
            )

    errs = [c["rank_err_over_eps"] for c in checks]
    hist_edges = [0.0, 0.1, 0.25, 0.5, 0.75, 1.0]
    hist = {
        f"<= {e}": sum(1 for x in errs if x <= e) for e in hist_edges
    }
    bad = [c for c in checks if not c["ok"]]
    out = {
        "sf_dir": sf_dir,
        "accuracy": DEFAULT_ACCURACY,
        "eps": EPS,
        "n_checks": len(checks),
        "n_violations": len(bad),
        "max_rank_err_over_eps": max(errs) if errs else None,
        "histogram_cumulative": hist,
        "checks": checks,
    }
    os.makedirs(os.path.join(HERE, ".ledger"), exist_ok=True)
    path = os.path.join(HERE, ".ledger", "quantiles_sf1.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"{len(checks)} rank checks at {sf_dir}: {len(bad)} violations; "
        f"max |rank err| = {out['max_rank_err_over_eps']}x eps "
        f"(contract: <= 1.0); wrote {path}"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
