"""r14: the fused (single-job, per-cell numpy) grouped k-means fit must
reproduce the distributed lock-step trajectory exactly — seeds, every
update round, empty-cluster dropout, and the final 6-dp rounding."""

import numpy as np
import pytest

from backend_etl_spark.operators import clustering as C


@pytest.fixture(scope="module")
def spark():
    from backend_etl_spark.session import get_spark

    return get_spark("test-r14-fused-fit")


def _frame(spark, n=90, cells=3, dim=4, seed=7):
    rng = np.random.default_rng(seed)
    rows = [
        (
            int(1000 + 7 * i),
            int(i % cells),
            [float(x) for x in rng.normal(0, 1, dim)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, cell int, embedding array<double>"
    )


def test_fused_equals_lockstep_grouped_fit(spark):
    """fused=True must equal the distributed lock-step path bit-for-bit
    on the same tagged frame (same rank_mod seeds, same per-round
    assignment numerics, same HALF_UP-on-shortest-decimal update
    rounding)."""
    df = _frame(spark)
    k_rule = lambda n: max(2, n // 10)  # noqa: E731
    want = C.kmeans_fit_grouped(df, "cell", k_rule, iters=3)
    got = C.kmeans_fit_grouped(df, "cell", k_rule, iters=3, fused=True)
    assert got == want


def test_fused_k1_and_uneven_cells(spark):
    """Degenerate shapes: a k=1 cell (all rows one cluster) and heavily
    uneven cell sizes still match the distributed path."""
    rng = np.random.default_rng(3)
    rows = [
        (int(i), 0 if i < 70 else 1, [float(x) for x in rng.normal(0, 1, 4)])
        for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, cell int, embedding array<double>"
    )
    k_rule = lambda n: max(1, n // 40)  # noqa: E731  (cell0: k=1, cell1: k=1... cell0 n=70 -> 1)
    want = C.kmeans_fit_grouped(df, "cell", k_rule, iters=3)
    got = C.kmeans_fit_grouped(df, "cell", k_rule, iters=3, fused=True)
    assert got == want


def test_round_like_spark_matches_f_round(spark):
    """_round_like_spark must equal F.round(double, 6) on a sweep of
    representative values (positive/negative, near-midpoint decimals)."""
    from pyspark.sql import functions as F

    vals = [
        0.1234565, -0.1234565, 1.0000005, -1.0000005, 0.5e-6, -0.5e-6,
        2.718281828459045, -3.141592653589793, 123.4567894999999,
        0.12345649999999999, 1e-7, -1e-7, 0.0,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = [
        r["y"] for r in df.select(F.round("x", 6).alias("y")).collect()
    ]
    got_py = [C._round_like_spark(v) for v in vals]
    assert got_py == got_spark
