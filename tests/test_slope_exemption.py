"""The output-bound slope exemption must stay strict (r9 verdict item 5):
a denominator (sf0.1) speedup widens the wall-growth headroom but must
never let an sf1-side per-row regression hide inside the exemption. No
Spark needed — this pins scripts/sf1_slopes.output_bound_annotation."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "sf1_slopes",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "sf1_slopes.py"),
)
sf1_slopes = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sf1_slopes)

NAME = "dedup_ngram_jaccard"  # out 41_774 -> 3_835_729 (91.8x per decade)


def test_publishes_per_row_cost_columns():
    ann = sf1_slopes.output_bound_annotation(NAME, 2.0, 25.0, 2.0, 25.0, None)
    assert ann["per_row_ok"]  # 12.5x wall vs 91.8x output
    # solo-adjudicated wall / output rows, microseconds
    assert ann["per_row_cost_us_sf0.1"] == round(2.0 / 41_774 * 1e6, 3)
    assert ann["per_row_cost_us_sf1"] == round(25.0 / 3_835_729 * 1e6, 3)
    assert "per_row_drift" not in ann


def test_sf1_regression_flags_even_while_per_row_ok_passes():
    # sf1 wall tripled vs the previous record's per-row cost, but the
    # 91.8x output-growth headroom still passes the growth-ratio check —
    # the drift flag is what catches it
    prev = round(25.0 / 3_835_729 * 1e6, 3)
    ann = sf1_slopes.output_bound_annotation(NAME, 2.0, 75.0, 2.0, 75.0, prev)
    assert ann["per_row_ok"]  # 37.5x wall <= 91.8x output: still "ok"
    assert ann["per_row_drift"]["ratio"] == 3.0


def test_denominator_speedup_alone_does_not_flag():
    # sf0.1 got 2x faster, sf1 unchanged: slope rises, wall_growth rises,
    # but the sf1 per-row cost is flat vs the previous record — no drift
    prev = round(25.0 / 3_835_729 * 1e6, 3)
    ann = sf1_slopes.output_bound_annotation(NAME, 1.0, 25.0, 1.0, 25.0, prev)
    assert ann["wall_growth"] == 25.0
    assert ann["per_row_ok"] and "per_row_drift" not in ann


def test_solo_times_feed_the_per_row_columns():
    # in-run numbers contended (t=100), solo evidence clean (st=25): the
    # per-row columns must read the solo-adjudicated cost
    ann = sf1_slopes.output_bound_annotation(NAME, 2.0, 100.0, 2.0, 25.0, None)
    assert ann["per_row_cost_us_sf1"] == round(25.0 / 3_835_729 * 1e6, 3)
