"""Rank-bound parity for the production (sketch) quantile path vs the
exact entries it replaces at 100 TB (VERDICT r8 item 6 / What's missing
#3): percentile_approx returns an actual data value whose RANK is
guaranteed within n·ε of the target rank (ε = 1/accuracy, the
Greenwald–Khanna bound) — attested on real data at sf0.1 for both
exact-entry shapes (orders per status, lineitem per returnflag). The
bound is on ranks, not values: the exact entries' interpolated
quantiles can sit between data values, so a value-band comparison
would be ill-posed."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from backend_etl_spark.operators.quantiles import (
    DEFAULT_ACCURACY,
    group_quantiles_production,
)
from backend_etl_spark.sources.loader import load_table

EPS = 1.0 / DEFAULT_ACCURACY


def _assert_rank_bounded(df, group_cols, value_col, qs):
    prod = {
        tuple(r[c] for c in group_cols): [r[f"p{round(q * 100):d}"] for q in qs]
        for r in group_quantiles_production(
            df, group_cols, value_col, qs, round_dp=6
        ).collect()
    }
    values = {}
    for r in df.select(*group_cols, value_col).collect():
        values.setdefault(tuple(r[c] for c in group_cols), []).append(
            r[value_col]
        )
    assert set(prod) == set(values) and prod
    for g, vals in prod.items():
        arr = np.sort(np.array(values[g], dtype=np.float64))
        n = len(arr)
        for q, v in zip(qs, prod[g]):
            # GK contract: there is a rank r of v in the group with
            # |r − q·n| ≤ ε·n. v's possible ranks span
            # [count(< v) + 1, count(<= v)] (duplicates).
            lo_rank = int(np.searchsorted(arr, v, side="left")) + 1
            hi_rank = int(np.searchsorted(arr, v, side="right"))
            # documented convention: an acceptable rank lies in
            # [floor((q−ε)·n), ceil((q+ε)·n)]
            band_lo = int(np.floor((q - EPS) * n))
            band_hi = int(np.ceil((q + EPS) * n))
            assert lo_rank <= band_hi and hi_rank >= band_lo, (
                f"group {g}: p{q} sketch value {v} has rank range "
                f"[{lo_rank}, {hi_rank}], acceptable band "
                f"[{band_lo}, {band_hi}] (n={n})"
            )


@pytest.mark.parametrize(
    "table,group_cols,value_col,qs",
    [
        ("orders", ["o_orderstatus"], "o_totalprice", [0.25, 0.50, 0.90, 0.99]),
        ("lineitem", ["l_returnflag"], "l_extendedprice", [0.5, 0.9]),
    ],
)
def test_sketch_quantiles_within_exact_rank_band(
    spark, table, group_cols, value_col, qs
):
    df = load_table(spark, "/root/testdata/sf0.1", table)
    _assert_rank_bounded(df, group_cols, value_col, qs)


def test_sketch_state_never_buffers_group(spark):
    """The production path's physical plan must be a hash aggregate with
    partial aggregation (mergeable sketch), not a buffered sort-agg of
    raw values — the property that makes it survive a 1e11-row group."""
    df = load_table(spark, "/root/testdata/sf0.1", "orders")
    out = group_quantiles_production(
        df, ["o_orderstatus"], "o_totalprice", [0.5, 0.99]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_percentile_approx" in plan, plan[:2000]


def test_rank_verdict_green_and_has_teeth(spark, monkeypatch):
    """The distributed rank-contract verdict (the driver-checked form of
    this entry, r11 verdict item 1): all-zero violations on the real
    sketch, and — the teeth — a broken sketch whose values fall outside
    every rank band must surface as violations, not silently pass."""
    import backend_etl_spark.operators.quantiles as Q

    df = load_table(spark, "/root/testdata/sf0.01", "orders")
    qs = [0.25, 0.50, 0.90, 0.99]
    rows = Q.group_quantiles_rank_verdict(
        df, ["o_orderstatus"], "o_totalprice", qs
    ).collect()
    assert rows
    assert all(
        r["n_checks"] == len(qs) and r["n_violations"] == 0 for r in rows
    )

    real = Q.group_quantiles_production

    def broken(df, gcols, vcol, qs, accuracy=Q.DEFAULT_ACCURACY, round_dp=6):
        good = real(df, gcols, vcol, qs, accuracy, round_dp)
        pcols = good.columns[len(gcols):]
        return good.select(
            *gcols, *[(F.col(c) * 2 + 1e9).alias(c) for c in pcols]
        )

    monkeypatch.setattr(Q, "group_quantiles_production", broken)
    bad = Q.group_quantiles_rank_verdict(
        df, ["o_orderstatus"], "o_totalprice", qs
    ).collect()
    assert all(r["n_violations"] == r["n_checks"] for r in bad)
