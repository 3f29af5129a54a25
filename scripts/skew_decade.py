#!/usr/bin/env python
"""Measure the skew mitigations on REALLY skewed data (r11 verdict
item 6): the salted entries prove the mechanism on a synthetic hot key;
this measures salted vs unsalted plans on Zipf-distributed keys
(scripts/gen_sf.py --skew) at one or more SFs — the hot-PARTITION
failure mode the plan gates can't see.

Per (sf_dir) it times, best-of-``reps`` each:
- agg_direct:   events.groupBy(user_id).agg(count, sum)   (one shuffle
                whose hottest partition carries the hot key whole)
- agg_salted:   operators/skew.salted_count_sum           (two-stage,
                hot key spread over 16 partitions)
- join_direct:  events ⋈ customer on user_id=c_custkey, sort-merge, AQE
                skew-join ON at its DEFAULT thresholds (256 MB) — at
                local SFs the hot partition (~40 MB at sf10) sits far
                under them, so this shows the unmitigated hot-task cost
- join_aqe_scaled: same join with the skew thresholds scaled to the
                local partition sizes (8 MB/4 MB advisory) — the
                mechanism a 100 TB deployment gets at DEFAULT settings,
                where a 20% hot key is hundreds of GB; the executed
                plan is scanned for AQE's ``isSkew=true`` marker and
                recorded as evidence that the split actually engaged
- join_salted:  operators/skew.salted_shuffle_join        (plan-time
                guarantee, shuffle key (key, salt))

plus the hot-key share (operators/skew.top_keys) so the ledger shows
HOW skewed the input actually was. Results append to
.ledger/skew_decade.json keyed by sf-dir basename.

Usage: python scripts/skew_decade.py [sf_dir ...] [--reps N]
       default dirs: .localdata/sf1 .localdata/sf1_skew
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pyspark.sql.functions as F  # noqa: E402

from backend_etl_spark.operators.skew import (  # noqa: E402
    salted_count_sum,
    salted_shuffle_join,
    top_keys,
)
from backend_etl_spark.session import get_spark, tune  # noqa: E402
from backend_etl_spark.sources.loader import load_table  # noqa: E402


def _time(df, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    argv = sys.argv[1:]
    reps = 2
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    dirs = argv or [
        os.path.join(HERE, ".localdata/sf1"),
        os.path.join(HERE, ".localdata/sf1_skew"),
    ]
    missing = [d for d in dirs if not os.path.isdir(d)]
    if missing:
        sys.exit(f"missing sf dir(s): {missing} — run scripts/gen_sf.py")

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "20g")
    spark = get_spark("skew-decade")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)

    out: dict[str, dict] = {}
    for d in dirs:
        tag = os.path.basename(d.rstrip("/"))
        ev = load_table(spark, d, "events").select("user_id", "value")
        cust = load_table(spark, d, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
        hot = [
            {"user_id": r["user_id"], "share": r["share"]}
            for r in top_keys(ev, ["user_id"], k=3).collect()
        ]

        agg_direct = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
        )
        agg_salted = salted_count_sum(ev, ["user_id"], "value")

        # sort-merge join with AQE skew-join as the runtime mitigation:
        # merge hints keep the broadcast path out so the skew machinery
        # is actually exercised
        join_direct = (
            ev.hint("merge")
            .join(cust.hint("merge"), "user_id")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        )
        join_salted = (
            salted_shuffle_join(ev, cust, ["user_id"])
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        )

        rec = {
            "hot_keys": hot,
            "agg_direct_s": _time(agg_direct, reps),
            "agg_salted_s": _time(agg_salted, reps),
            "join_direct_aqe_s": _time(join_direct, reps),
            "join_salted_s": _time(join_salted, reps),
        }
        # AQE skew-split evidence at thresholds matched to local
        # partition sizes (the DEFAULT 256 MB threshold is sized for
        # production partitions; the local hot partition is ~40 MB at
        # sf10, invisible to it). The conf changes ONLY when AQE deems
        # a partition skewed — never the plan semantics.
        conf = spark.conf
        saved = {
            k: conf.get(k)
            for k in (
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            )
        }
        try:
            conf.set(
                "spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes",
                "8m",
            )
            conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
            rec["join_aqe_scaled_s"] = _time(join_direct, reps)
            # evidence must come from an EXECUTED AQE plan: a noop write
            # spawns its own QueryExecution, so collect() on the frame
            # itself (5 result rows) and read ITS final adaptive plan
            join_direct.collect()
            plan = (
                join_direct._jdf.queryExecution().executedPlan().toString()
            )
            rec["aqe_skew_marker"] = "skew=true" in plan.lower()
        finally:
            for k, v in saved.items():
                conf.set(k, v)
        out[tag] = rec
        print(
            f"{tag}: hot share {hot[0]['share']:.3f} | "
            f"agg direct {rec['agg_direct_s']}s salted {rec['agg_salted_s']}s | "
            f"join direct(AQE-default) {rec['join_direct_aqe_s']}s "
            f"AQE-scaled {rec['join_aqe_scaled_s']}s "
            f"salted {rec['join_salted_s']}s | "
            f"aqe_skew_marker={rec['aqe_skew_marker']}"
        )

    os.makedirs(os.path.join(HERE, ".ledger"), exist_ok=True)
    path = os.path.join(HERE, ".ledger", "skew_decade.json")
    prev = {}
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
    prev.update(out)
    with open(path, "w") as fh:
        json.dump(prev, fh, indent=1, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
