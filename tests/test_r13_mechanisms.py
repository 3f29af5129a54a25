"""Round-13 mechanism pins: driver-scratch bench routing, subset-stamp
diversion for cold/big-SF records, per-stream history pruning,
intentional-cost re-baselining, and the empty-subset guard."""

from __future__ import annotations

import json

import pytest

import bench


# ---------------------------------------------------------------- routing

def test_runs_without_canonical_marker_land_in_scratch(tmp_path):
    """r12 verdict item 6: the driver's post-commit run (no marker) must
    never touch a committed record file — every variant diverts to a
    gitignored *_scratch.json sibling."""
    for sf, cold, only, expect in [
        ("0.1", False, "", "bench_full_scratch.json"),
        ("0.1", True, "", "bench_full_cold_scratch.json"),
        ("1", False, "", "bench_full_sf1_scratch.json"),
        ("10", False, "heavy", "bench_full_sf10_scratch.json"),
    ]:
        out = bench.resolve_record_fname(str(tmp_path), sf, cold, only, False)
        assert out == expect, (sf, cold, only, out)


def test_marker_runs_keep_the_committed_record_names(tmp_path):
    assert (
        bench.resolve_record_fname(str(tmp_path), "0.1", False, "", True)
        == "bench_full.json"
    )
    assert (
        bench.resolve_record_fname(str(tmp_path), "0.1", True, "", True)
        == "bench_full_cold.json"
    )
    assert (
        bench.resolve_record_fname(str(tmp_path), "1", False, "", True)
        == "bench_full_sf1.json"
    )


def test_subset_diversion_respects_incumbent_stamp(tmp_path):
    """r12 ADVICE medium: a subset run at cold / non-default SF may only
    land in the variant file when the incumbent record carries the SAME
    subset stamp; a full-catalog incumbent (no stamp) or a different
    subset diverts to *_subset.json."""
    # bootstrap: no incumbent → in place (how bench_full_sf10.json began)
    assert (
        bench.resolve_record_fname(str(tmp_path), "10", False, "heavy", True)
        == "bench_full_sf10.json"
    )
    # matching stamp → in place
    (tmp_path / "bench_full_sf10.json").write_text(
        json.dumps({"subset": "heavy", "canonical": True})
    )
    assert (
        bench.resolve_record_fname(str(tmp_path), "10", False, "heavy", True)
        == "bench_full_sf10.json"
    )
    # different subset → diverted
    assert (
        bench.resolve_record_fname(str(tmp_path), "10", False, "a,b", True)
        == "bench_full_sf10_subset.json"
    )
    # full-catalog incumbent at sf1 must not be clobbered by a subset
    (tmp_path / "bench_full_sf1.json").write_text(
        json.dumps({"canonical": True})
    )
    assert (
        bench.resolve_record_fname(str(tmp_path), "1", False, "heavy", True)
        == "bench_full_sf1_subset.json"
    )
    # cold full-catalog incumbent likewise (the ADVICE's exact case)
    (tmp_path / "bench_full_cold.json").write_text(
        json.dumps({"canonical": True})
    )
    assert (
        bench.resolve_record_fname(str(tmp_path), "0.1", True, "heavy", True)
        == "bench_full_cold_subset.json"
    )
    # warm default-SF subset always diverts (pre-existing rule)
    assert (
        bench.resolve_record_fname(str(tmp_path), "0.1", False, "heavy", True)
        == "bench_full_subset.json"
    )


# ---------------------------------------------------------------- history

def test_prune_history_keeps_last3_per_stream():
    """An sf10 heavy roll must not evict sf0.1 full-catalog records from
    the 3-round-best window (and vice versa)."""
    recs = (
        [{"stamp": f"a{i}", "sf": 0.1, "queries": {}} for i in range(4)]
        + [
            {"stamp": f"b{i}", "sf": 10.0, "subset": "heavy", "queries": {}}
            for i in range(2)
        ]
    )
    kept = bench.prune_history(recs)
    assert [r["stamp"] for r in kept] == ["a1", "a2", "a3", "b0", "b1"]


def test_cost_floors_raise_best3_for_rebaselined_entries():
    """r12 verdict item 7: the two deliberate-cost entries stop flagging
    against their pre-trade best3 — the floor IS the re-baseline."""
    best3 = {
        "group_quantiles_production": 0.235,  # pre-verdict history best
        "dedup_cluster_components": 2.76,  # memory-level-checkpoint best
        "q1_pricing_summary": 1.0,  # untouched entry
    }
    floored = bench.apply_cost_floors(best3)
    assert floored["group_quantiles_production"] == pytest.approx(0.78)
    assert floored["dedup_cluster_components"] == pytest.approx(3.97)
    assert floored["q1_pricing_summary"] == 1.0
    # r12's adjudicated costs no longer trip the 1.3x bar
    for name, now in [
        ("group_quantiles_production", 0.78),
        ("dedup_cluster_components", 3.97),
    ]:
        assert now / floored[name] <= 1.3


def test_empty_subset_spec_fails_loudly():
    with pytest.raises(SystemExit, match="zero entries"):
        bench.resolve_subset(",")


# ------------------------------------------------------------ skew advisor

def test_skew_advisor_replays_the_measured_decade():
    """r12 verdict item 5: the decision rules are code, and the r12
    skew-decade ledger is their fixture — for every measured cell the
    advisor's pick must be the cheapest measured option."""
    from backend_etl_spark.operators.skew import choose_skew_strategy

    ledger = json.load(open(".ledger/skew_decade.json"))
    for cell, rec in ledger.items():
        share = rec["hot_keys"][0]["share"]
        # ALGEBRAIC aggregate: advisor says direct at every measured
        # skew level, and direct was indeed cheapest in every cell
        assert choose_skew_strategy("aggregate", share) == "direct"
        assert rec["agg_direct_s"] <= rec["agg_salted_s"], cell
        # sort-merge join: hot cells route to AQE, uniform to direct —
        # and the measurement agrees (AQE-scaled beat salted wherever
        # the skew marker appeared; salting always cost more)
        pick = choose_skew_strategy("join", share)
        if share >= 0.01:
            assert pick == "aqe", cell
            assert rec["join_aqe_scaled_s"] <= rec["join_salted_s"], cell
        else:
            assert pick == "direct", cell
            assert rec["join_direct_aqe_s"] <= rec["join_salted_s"], cell


def test_skew_advisor_edge_rules():
    from backend_etl_spark.operators.skew import choose_skew_strategy

    # non-combinable aggregate state on a hot key → salt
    assert (
        choose_skew_strategy("aggregate", 0.2, agg_is_algebraic=False)
        == "salted"
    )
    # ...but not on a uniform key
    assert (
        choose_skew_strategy("aggregate", 1e-5, agg_is_algebraic=False)
        == "direct"
    )
    # broadcastable join never needs mitigation
    assert (
        choose_skew_strategy("join", 0.5, join_is_broadcastable=True)
        == "direct"
    )
    # AQE can't rewrite a shuffled-hash join → salt
    assert (
        choose_skew_strategy("join", 0.2, join_strategy="shuffled_hash")
        == "salted"
    )
    # known-pathological key overrides the AQE default
    assert (
        choose_skew_strategy("join", 0.2, known_pathological=True)
        == "salted"
    )
    with pytest.raises(ValueError, match="unknown op"):
        choose_skew_strategy("sort", 0.1)
