"""As-of (most-recent-match) join, built scale-first.

Spark has no native ASOF JOIN. The naive encoding — inequality join then
row_number to keep the latest — materializes every (left, right) pair
that satisfies ``right.ts <= left.ts`` before pruning, which is O(n·m)
per key and explodes on hot keys at 100 TB.

This implementation uses the union + last(ignorenulls) trick instead:
tag both sides, union them, and for each left row pick up the most
recent right row via a running ``last`` over a window ordered by
(ts, side). Cost: ONE shuffle on (key), ONE sort — the same cost as a
sort-merge join — with no pair blow-up, and AQE can still split skewed
keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_ts] <= left[left_ts]`` and equal ``on`` key.

    Returns all left columns plus ``{prefix}{right_ts}`` and
    ``{prefix}{c}`` for each value column (NULL when no match).
    """
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__r_ts"),
            *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        )
        .withColumn("__side", F.lit(0))
        .withColumn("__ts", F.col("__r_ts"))
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    # right rows (side=0) sort before left rows at equal ts -> `<=` semantics
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"{prefix}{right_ts}"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("__side") == 1).select(
        *lcols, f"{prefix}{right_ts}", *[f"{prefix}{c}" for c in value_cols]
    )
