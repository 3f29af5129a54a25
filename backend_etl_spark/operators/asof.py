"""As-of (nearest-match) join, built scale-first.

Spark has no native ASOF JOIN. The naive encoding — inequality join then
row_number to keep the nearest — materializes every (left, right) pair
that satisfies the inequality before pruning, which is O(n·m) per key
and explodes on hot keys at 100 TB.

This implementation uses the union + running-carry trick instead: tag
both sides, union them, and for each left row pick up the nearest right
row via a running ``last``/``first`` over a window ordered by
(ts, side). Cost: ONE shuffle on (key), ONE sort — the same cost as a
sort-merge join — with no pair blow-up, and AQE can still split skewed
keys.

Directions:
- ``backward`` (default): latest right with ``right.ts <= left.ts``.
- ``forward``: earliest right with ``right.ts >= left.ts``.
``tolerance`` (seconds) nulls out matches farther than the bound —
pandas ``merge_asof`` semantics.
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
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row per `direction`
    with an equal ``on`` key.

    Returns all left columns plus ``{prefix}{right_ts}`` and
    ``{prefix}{c}`` for each value column (NULL when no match, or when
    the match is farther than ``tolerance_s``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    # side ordering puts the right row adjacent to the left row at equal
    # ts ON THE INCLUSIVE SIDE of the frame: backward -> right first
    # (frame ends at current), forward -> left first (frame starts at
    # current)
    l_side, r_side = (1, 0) if direction == "backward" else (0, 1)
    l = left.withColumn("__side", F.lit(l_side)).withColumn("__ts", F.col(left_ts))
    r = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__r_ts"),
            *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        )
        .withColumn("__side", F.lit(r_side))
        .withColumn("__ts", F.col("__r_ts"))
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    base = Window.partitionBy(on).orderBy("__ts", "__side")
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    carried = merged.select(
        "*",
        carry("__r_ts").alias(f"{prefix}{right_ts}"),
        *[carry(f"__r_{c}").alias(f"{prefix}{c}") for c in value_cols],
    )
    out = carried.where(F.col("__side") == l_side).where(F.col("__r_ts").isNull())
    if tolerance_s is not None:
        gap = F.abs(
            F.unix_micros(F.col(f"{prefix}{right_ts}")) - F.unix_micros(F.col(left_ts))
        )
        in_tol = gap <= tolerance_s * 1_000_000
        out = out.select(
            *lcols,
            F.when(in_tol, F.col(f"{prefix}{right_ts}")).alias(f"{prefix}{right_ts}"),
            *[
                F.when(in_tol, F.col(f"{prefix}{c}")).alias(f"{prefix}{c}")
                for c in value_cols
            ],
        )
    else:
        out = out.select(
            *lcols, f"{prefix}{right_ts}", *[f"{prefix}{c}" for c in value_cols]
        )
    return out
