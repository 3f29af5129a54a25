#!/usr/bin/env python
"""Adjudicate per-entry sf0.1 -> sf1 scaling slopes for the WHOLE catalog.

The decade sweep (scripts/scale_sweep.py) measures 15 representative
families; this script turns the r7 verdict's "no family super-linear"
sample claim into a 202-entry fact by reading two full-catalog bench
records — bench_full.json (the canonical sf0.1 run) and
bench_full_sf1.json (the same bench.py run with SPARK_GRAFT_SF_DIR
pointed at the locally generated sf1) — and reporting the log10 time
ratio per entry (data is 10x, so slope = log10(t_sf1 / t_sf0.1)).

Interpretation mirrors scale_sweep.py: ~1.0 linear, <1 fixed-overhead
dominated, sustained >1.2 super-linear and plan-audit-worthy. Entries
faster than FLOOR seconds at BOTH scales are reported but not flagged:
sub-second jitter produces meaningless ratios (the bench contention
postmortems, r5/r6).

Writes sf1_slopes.json at the repo root; exits nonzero if any entry
above the floor has slope > the --max-slope bar (default 1.0, the r7
"Next round" item #2 acceptance bar).

Usage: python scripts/sf1_slopes.py [--max-slope 1.0] [--floor 1.0]
"""

from __future__ import annotations

import json
import math
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Entries whose OUTPUT cardinality itself grows super-linearly by
#: query semantics, measured at both scales (the oracle's own result
#: set, not an engine artifact): wall-clock slope > 1.0 is then
#: intrinsic, and the right lens is wall growth vs OUTPUT growth. Each
#: exemption records the measured output rows (sf0.1 -> sf1) so the
#: claim is a fact, not prose. Both entries grow wall-clock far slower
#: than output, i.e. per-output-row cost FALLS a decade up.
OUTPUT_BOUND_EXEMPT = {
    # candidate pairs = Σ bucket² of the LSH bands; the synthetic
    # 31-word vocab makes band collisions ~quadratic in corpus size
    "dedup_ngram_jaccard": {"out_sf0.1": 41_774, "out_sf1": 3_835_729},
    # within-label all-pairs over a FIXED 10-label domain: bucket size
    # grows linearly with the corpus, pairs quadratically
    "dedup_embedding_cosine_pairs": {"out_sf0.1": 86, "out_sf1": 25_506},
}


def output_bound_annotation(
    name: str,
    b: float,
    t: float,
    sb: float,
    st: float,
    prev_per_row_sf1: float | None,
) -> dict:
    """Build the exemption annotation for an OUTPUT_BOUND_EXEMPT entry.

    r9 verdict item 5: the growth-ratio form (wall_growth <= out_growth)
    silently absorbs a DENOMINATOR speedup — when sf0.1 gets faster the
    slope rises but the 92x/297x output-growth headroom still swallows a
    real sf1-side regression. So the annotation now publishes absolute
    per-output-row cost at both SFs (solo-adjudicated wall / output
    rows, in microseconds) and carries ``per_row_drift`` when the sf1
    per-row cost rose >1.3x above the PREVIOUS published record — an
    sf1 regression can no longer hide inside the exemption even while
    ``per_row_ok`` passes.
    """
    ex = OUTPUT_BOUND_EXEMPT[name]
    out_growth = ex["out_sf1"] / ex["out_sf0.1"]
    wall_growth = t / b
    pr0 = sb / ex["out_sf0.1"] * 1e6
    pr1 = st / ex["out_sf1"] * 1e6
    ann = {
        **ex,
        "output_growth": round(out_growth, 1),
        "wall_growth": round(wall_growth, 1),
        # per-output-row cost must not RISE a decade up, or the
        # exemption is hiding a real engine regression
        "per_row_ok": wall_growth <= out_growth,
        "per_row_cost_us_sf0.1": round(pr0, 3),
        "per_row_cost_us_sf1": round(pr1, 3),
    }
    if prev_per_row_sf1 is not None and prev_per_row_sf1 > 0:
        ann["per_row_cost_us_sf1_prev"] = prev_per_row_sf1
        if pr1 > 1.3 * prev_per_row_sf1:
            ann["per_row_drift"] = {
                "prev": prev_per_row_sf1,
                "now": round(pr1, 3),
                "ratio": round(pr1 / prev_per_row_sf1, 2),
            }
    return ann


def roll_per_row_baseline(
    prev_costs: dict[str, float],
    prev_history: dict[str, list[float]],
    this_run_costs: dict[str, float],
    clean: bool,
    force: bool = False,
) -> tuple[dict[str, float], dict[str, list[float]], bool]:
    """Per-row-cost baseline roll, gated like bench_history.json's
    --roll-history (r10 ADVICE medium): only a CLEAN run (no per-row
    drift, no slope flags) — or an explicit --roll-per-row after a
    deliberate adjudication — commits this run's costs. A run that
    confirms drift carries the previous baseline forward unchanged, so
    re-running cannot launder the drifted cost into the baseline; the
    history keeps the last 3 committed readings and the drift check
    judges against their MEDIAN, so one outlier-fast run can't lower
    the bar and manufacture false flags either. Returns
    (costs, history, rolled)."""
    if not (clean or force):
        return dict(prev_costs), prev_history, False
    new_history = {k: list(v) for k, v in prev_history.items()}
    for k, v in this_run_costs.items():
        new_history[k] = (new_history.get(k, []) + [v])[-3:]
    return (this_run_costs or dict(prev_costs)), new_history, True


def _times(path: str) -> tuple[dict[str, float], dict[str, float]]:
    """(in-run times, solo times from the record's contended
    annotations). Published numbers stay in-run — the solo map is
    adjudication evidence for flags only."""
    with open(path) as fh:
        rec = json.load(fh)
    out = {}
    for name, t in rec.get("queries", {}).items():
        if isinstance(t, (int, float)):
            out[name] = float(t)
    solo = {
        name: float(c["solo"])
        for name, c in rec.get("contended", {}).items()
        if isinstance(c, dict) and isinstance(c.get("solo"), (int, float))
    }
    return out, solo


def main() -> None:
    max_slope = 1.0
    floor = 1.0
    argv = sys.argv[1:]
    if "--max-slope" in argv:
        max_slope = float(argv[argv.index("--max-slope") + 1])
    if "--floor" in argv:
        floor = float(argv[argv.index("--floor") + 1])

    base, base_solo = _times(os.path.join(HERE, "bench_full.json"))
    sf1, sf1_solo = _times(os.path.join(HERE, "bench_full_sf1.json"))
    shared = sorted(set(base) & set(sf1))
    missing = sorted(set(base) ^ set(sf1))

    # previous record's published per-row costs — the drift baseline.
    # Read the dedicated field first (survives an exempt entry dropping
    # out of worst10); fall back to worst10 for records written before
    # the field existed. The baseline a run is judged against is the
    # MEDIAN of the last few CLEAN-run readings (per_row_cost_history),
    # so a single outlier run — fast or slow — can neither lower the
    # bar and manufacture false flags nor silently become the new
    # normal (r10 ADVICE medium: the old code rewrote per_row_costs
    # unconditionally, so re-running after a confirmed drift adopted
    # the drifted cost and exited 0).
    prev_per_row: dict[str, float] = {}
    prev_history: dict[str, list[float]] = {}
    try:
        with open(os.path.join(HERE, "sf1_slopes.json")) as fh:
            prev_rec = json.load(fh)
        prev_history = {
            k: [float(x) for x in v]
            for k, v in prev_rec.get("per_row_cost_history", {}).items()
            if isinstance(v, list) and v
        }
        prev_per_row.update(prev_rec.get("per_row_costs", {}))
        if not prev_per_row:
            for w in prev_rec.get("worst10", []):
                ob = w.get("output_bound", {})
                if "per_row_cost_us_sf1" in ob:
                    prev_per_row[w["name"]] = ob["per_row_cost_us_sf1"]
    except Exception:
        pass
    # judge against the history's median where available, else the
    # last committed value (records written before the history field)
    drift_baseline: dict[str, float] = dict(prev_per_row)
    for k, hist in prev_history.items():
        s = sorted(hist)
        drift_baseline[k] = s[len(s) // 2]

    rows = []
    flagged = []
    per_row_drift = []
    for name in shared:
        b, t = base[name], sf1[name]
        slope = math.log10(t / b) if b > 0 else float("inf")
        sub_floor = b < floor and t < floor
        row = {
            "name": name,
            "sf0.1": b,
            "sf1": t,
            "slope": round(slope, 3),
            "sub_floor": sub_floor,
        }
        # solo evidence first — the exemption's per-row costs and any
        # flag adjudication both read the solo-adjudicated numbers
        sb, st = base_solo.get(name, b), sf1_solo.get(name, t)
        if name in OUTPUT_BOUND_EXEMPT:
            row["output_bound"] = output_bound_annotation(
                name, b, t, sb, st, drift_baseline.get(name)
            )
            if "per_row_drift" in row["output_bound"]:
                per_row_drift.append(
                    {"name": name, **row["output_bound"]["per_row_drift"]}
                )
        # a flag must survive the solo evidence: if the record's own
        # contention adjudication re-timed either end solo and the
        # solo-based slope clears the bar, the flag is in-run noise
        # (kept as an annotation, not a flag)
        solo_slope = math.log10(st / sb) if sb > 0 else float("inf")
        if (sb, st) != (b, t):
            row["solo_slope"] = round(solo_slope, 3)
        rows.append(row)
        if slope > max_slope and not sub_floor:
            if row.get("output_bound", {}).get("per_row_ok"):
                continue  # intrinsic output growth, measured above
            if solo_slope <= max_slope and (sb, st) != (b, t):
                # contended in-run, solo evidence clears it — publish
                # the solo slope as effective so slopes/worst10 never
                # show a >bar number next to exit 0
                row["slope_in_run"] = row["slope"]
                row["slope"] = round(solo_slope, 3)
                continue
            flagged.append(row)

    # Final adjudication: a flag only publishes if it survives a fresh
    # SOLO best-of-2 at both scales (the r8 finding: after ~130 sf1
    # entries the bench JVM accumulates enough heap/GC state that a
    # 2.9 s-solo entry reads 18-24 s in-run, and when the PREVIOUS sf1
    # record was equally inflated the >1.3x mover bar never trips).
    # Skippable with --no-retime for a pure file-to-file comparison.
    if flagged and "--no-retime" not in argv:
        import time

        sys.path.insert(0, HERE)
        from backend_etl_spark.catalog import REGISTRY  # noqa: E402
        from backend_etl_spark.session import get_spark  # noqa: E402

        os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
        spark = get_spark("sf1-slopes-retime")
        sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR",
                                 "/root/repo/.localdata/sf1")

        def solo(name: str, sf_dir: str) -> float:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                best = min(best, time.perf_counter() - t0)
            return round(best, 3)

        # same env var bench.py honors — a sweep run with
        # SPARK_GRAFT_SF_DIR pointed at a NON-default sf0.1 copy must
        # retime against the data it benched (r8 advice). Guard (r9
        # review): the documented sf1 workflow EXPORTS this var pointed
        # at the sf1 dir; retiming both legs on sf1 would zero every
        # slope and silently clear real flags, so anything that doesn't
        # look like sf0.1 data falls back to the canonical dir (the one
        # bench_full.json, the baseline being adjudicated, was run on).
        env_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "")
        if env_dir and os.path.basename(env_dir.rstrip("/")) == "sf0.1":
            sf01_dir = env_dir
        else:
            sf01_dir = "/root/testdata/sf0.1"
            if env_dir:
                print(f"(retime: ignoring SPARK_GRAFT_SF_DIR={env_dir} — "
                      f"not an sf0.1 dir; using {sf01_dir})")
        still = []
        for row in flagged:
            rb = solo(row["name"], sf01_dir)
            rt = solo(row["name"], sf1_dir)
            row["retimed"] = {
                "sf0.1": rb,
                "sf1": rt,
                "slope": round(math.log10(rt / rb), 3),
            }
            # the retimed slope is the adjudicated one: publish it as
            # the row's slope (worst10/slopes sort on it) and keep the
            # in-run number as provenance, so the JSON can never show a
            # slope>bar row alongside exit 0 (r8 advice)
            row["slope_in_run"] = row["slope"]
            row["slope"] = row["retimed"]["slope"]
            if row["retimed"]["slope"] > max_slope:
                still.append(row)
        flagged = still

    rows.sort(key=lambda r: r["slope"], reverse=True)
    # Roll the per-row-cost baseline/history forward ONLY on a clean
    # run (no drift, no flags) — the same gate bench_history.json's
    # --roll-history applies (r10 ADVICE medium). A run that CONFIRMS
    # drift carries the previous baseline forward unchanged, so simply
    # re-running cannot launder the drifted cost into the baseline;
    # --roll-per-row forces the roll after a deliberate adjudication.
    this_run_costs = {
        r["name"]: r["output_bound"]["per_row_cost_us_sf1"]
        for r in rows
        if "output_bound" in r
    }
    new_costs, new_history, roll_per_row = roll_per_row_baseline(
        prev_per_row,
        prev_history,
        this_run_costs,
        clean=not per_row_drift and not flagged,
        force="--roll-per-row" in argv,
    )
    out = {
        "n": len(shared),
        "max_slope_bar": max_slope,
        "floor_secs": floor,
        "flagged": flagged,
        "per_row_drift": per_row_drift,
        # durable per-row-cost baseline for the NEXT run's drift check
        # (not worst10-dependent); rolled only on clean runs — see above
        "per_row_costs": new_costs,
        "per_row_costs_rolled": roll_per_row,
        "per_row_cost_history": new_history,
        "missing_in_one": missing,
        "worst10": rows[:10],
        "slopes": {r["name"]: r["slope"] for r in rows},
    }
    with open(os.path.join(HERE, "sf1_slopes.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)

    print(f"{len(shared)} shared entries; bar slope<={max_slope} "
          f"(floor {floor}s at both scales)")
    for r in rows[:15]:
        if r in flagged:
            mark = " FLAG"
        elif "output_bound" in r:
            g = r["output_bound"]
            mark = f" (output-bound: {g['output_growth']}x rows, {g['wall_growth']}x wall)"
        else:
            mark = " (sub-floor)" if r["sub_floor"] else ""
        print(f"  {r['name']:42s} {r['sf0.1']:8.2f} -> {r['sf1']:8.2f} "
              f"slope {r['slope']:+.2f}{mark}")
    if flagged:
        print(f"FLAGGED {len(flagged)} entries above the bar")
    if per_row_drift:
        print(
            f"PER-ROW DRIFT {len(per_row_drift)} exempt entries' sf1 "
            f"per-output-row cost rose >1.3x vs the previous record: "
            + ", ".join(
                f"{d['name']} {d['prev']}->{d['now']}us" for d in per_row_drift
            )
        )
    sys.exit(1 if (flagged or per_row_drift) else 0)


if __name__ == "__main__":
    main()
