"""Grouped quantiles: the exactness/scale trade, made explicit.

The catalog's exact entries (``agg_median_price``, ``agg_quantile_family``,
``agg_approx_quantile_bounded``'s exact column) use Spark's ``percentile``
— an ObjectHashAggregate whose per-group state BUFFERS (and finally
sorts) every value in the group. That is the right tool while
``max group cardinality × 8 B`` fits one executor's aggregation memory:
at sf1 the largest group here is ~6M doubles ≈ 48 MB — fine. It is the
wrong tool at 100 TB, where a single l_returnflag group holds ~1e11
values (~800 GB of buffer): the group cannot be partial-aggregated
(order statistics don't decompose), so one task must materialize it and
dies. The production path at that scale is the Greenwald–Khanna sketch
(``percentile_approx``): O(accuracy · log n) state, mergeable across
partitions (map-side partial agg works), with the published guarantee
that the returned value's RANK is within ``n / accuracy`` of the target
rank — i.e. the result lies between the exact (q − 1/accuracy) and
(q + 1/accuracy) quantiles.

``group_quantiles_production`` is that path, one sketch per group for
ALL requested percentages (the same buffer-once discipline BASELINE §t
measured for the exact family). tests/test_quantiles_production.py pins
the rank bound against the exact aggregate at sf0.1 — the same
attestation pattern as ``agg_approx_quantile_bounded``, extended to the
whole quantile family. Reference parity: the reference engine computes
these percentiles exactly at its (single-node) scale
(analytics/metrics.sql-style rollups); this module is the documented
swap a 1000-executor deployment makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank-error knob: guarantee |rank(returned) − q·n| ≤ n / ACCURACY.
#: 10⁴ matches agg_approx_quantile_bounded's attested setting; sketch
#: state is O(ACCURACY · log n) per group — KBs, not the group itself.
DEFAULT_ACCURACY = 10_000


def group_quantiles_production(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    accuracy: int = DEFAULT_ACCURACY,
    round_dp: int = 2,
) -> DataFrame:
    """Per-group quantiles via ONE Greenwald–Khanna sketch per group —
    the 100 TB form of the exact ``percentile(col, array(...))``
    entries. Output columns are ``p<q*100>`` with '.'→'_' for
    sub-percent targets (p50, p99, p99_5, p12_5) — integer-percent
    lists match ``agg_quantile_family``'s shape so the two are drop-in
    swaps; duplicate names raise.

    Mergeable sketch state ⇒ map-side partial aggregation works and the
    shuffle moves one sketch per (partition, group), never the values;
    no group ever materializes. Error contract: each returned value
    lies between the exact (q − 1/accuracy) and (q + 1/accuracy)
    group quantiles (test-pinned at sf0.1).
    """
    def _name(q: float) -> str:
        # exact decimal of q*100 with '.'→'_' (p25, p99, p99_5, p12_5)
        # — round() would banker's-round 0.125 to p12 and collide
        # 0.995 with 1.0 at p100 (r9 review)
        s = f"{q * 100:.6f}".rstrip("0").rstrip(".")
        return "p" + s.replace(".", "_")

    names = [_name(q) for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantile output names: {names}")
    pcts = ", ".join(str(float(q)) for q in qs)
    agg = df.groupBy(*group_cols).agg(
        F.expr(
            f"percentile_approx({value_col}, array({pcts}), {int(accuracy)})"
        ).alias("_q")
    )
    return agg.select(
        *group_cols,
        *[
            F.round(F.col("_q")[i], round_dp).alias(n)
            for i, n in enumerate(names)
        ],
    )


def group_quantiles_rank_verdict(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    accuracy: int = DEFAULT_ACCURACY,
    round_dp: int = 6,
) -> DataFrame:
    """Run the production sketch AND check its rank contract, fully
    distributed — the deterministic form of the GK attestation
    (scripts/attest_quantiles_sf1.py, r11 verdict item 1).

    GK's returned values are engine-specific data points, so no portable
    SQL reproduces them; what IS determined is the contract itself: each
    returned value's achievable rank range ``[count(<v)+1, count(<=v)]``
    must intersect the band ``[floor((q−ε)·n), ceil((q+ε)·n)]``
    (ε = 1/accuracy). This emits the per-group verdict —
    ``(group, n_rows, n_checks, n_violations)`` — computed with the same
    mergeable-aggregate discipline as the sketch: the tiny sketch-result
    frame is melted to (group, q, v) and broadcast into ONE conditional
    aggregate over the data, so no group is ever collected and the check
    runs at any SF. A broken sketch makes ``n_violations`` nonzero and
    the row hash-MISMATCHES its oracle instead of hiding behind a
    rows-only check.

    ``round_dp`` must not perturb ranks: keep it ≥ the value column's
    decimal precision (default 6 vs the 2-decimal money columns).
    """
    eps = 1.0 / accuracy
    prod = group_quantiles_production(
        df, group_cols, value_col, qs, accuracy, round_dp
    )
    names = prod.columns[len(group_cols):]
    qv = prod.select(
        *group_cols,
        F.stack(
            F.lit(len(qs)),
            *[
                x
                for q, nm in zip(qs, names)
                for x in (F.lit(float(q)), F.col(nm))
            ],
        ).alias("q", "v"),
    )
    data = df.select(
        *[F.col(c).alias(f"_g{i}") for i, c in enumerate(group_cols)],
        F.col(value_col).alias("_x"),
    )
    on = None
    for i, c in enumerate(group_cols):
        eq = F.col(f"_g{i}") == F.col(c)
        on = eq if on is None else on & eq
    ranks = (
        data.join(F.broadcast(qv), on)
        .groupBy(*group_cols, "q", "v")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("_x") < F.col("v")).cast("bigint")).alias("lt"),
            F.sum((F.col("_x") <= F.col("v")).cast("bigint")).alias("le"),
        )
    )
    checked = ranks.select(
        *group_cols,
        F.col("n"),
        (
            ((F.col("lt") + F.lit(1))
             <= F.ceil((F.col("q") + F.lit(eps)) * F.col("n")))
            & (F.col("le")
               >= F.floor((F.col("q") - F.lit(eps)) * F.col("n")))
        ).alias("_ok"),
    )
    return checked.groupBy(*group_cols).agg(
        F.max("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_checks"),
        F.sum((~F.col("_ok")).cast("bigint")).alias("n_violations"),
    )
