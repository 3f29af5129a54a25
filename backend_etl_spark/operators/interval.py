"""Binned interval join — bounded-band range joins WITHOUT an equality key.

A pure inequality join (``r.ts in (l.ts − band, l.ts]``) has no equi-key
for Spark to hash on, so Catalyst falls back to BroadcastNestedLoop /
cartesian — O(n·m) at 100 TB. When the band is bounded, the standard fix
is time binning: bucket both sides by ``band`` seconds; a right row can
only match left rows in its own bucket or the next one, so replicating
each right row into those TWO buckets turns the inequality join into an
equi-join on the bucket id + an exact band post-filter. Fan-out is
exactly 2×|right| and the join is hash-partitioned, AQE-skew-splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    band_s: int,
    how: str = "left",
) -> DataFrame:
    """Join each left row to right rows with
    ``right_ts in (left_ts − band_s, left_ts]`` using time-bin buckets.
    Returns left columns + right columns (NULL-extended under 'left')."""
    lb = left.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(left_ts)) / band_s)
    )
    rb = right.withColumn(
        "__b0", F.floor(F.unix_timestamp(F.col(right_ts)) / band_s)
    ).withColumn(
        # a right row at bucket b can match left rows in buckets b and b+1
        "__bucket",
        F.explode(F.array(F.col("__b0"), F.col("__b0") + 1)),
    ).drop("__b0")
    band_ok = (
        F.col(right_ts)
        > F.col(left_ts) - F.expr(f"INTERVAL {band_s} SECONDS")
    ) & (F.col(right_ts) <= F.col(left_ts))
    inner = lb.join(rb, ["__bucket"]).where(band_ok).drop("__bucket")
    if how == "inner":
        return inner
    if how != "left":
        raise ValueError(f"how must be inner|left, got {how!r}")
    # left join = in-band matches ∪ null-extended unmatched left rows
    # (left rows must be distinct for the anti-join identity to hold).
    # merge hint: the matched-left set GROWS with the input while its
    # through-join/distinct size estimate stays frozen tiny (the r6
    # derived-side class) — unhinted, the static planner broadcasts it
    unmatched = left.join(
        inner.select(*left.columns).distinct().hint("merge"),
        left.columns,
        "left_anti",
    )
    nulled = unmatched.select(
        "*",
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(c)
            for c in right.columns
        ],
    )
    return inner.unionByName(nulled)
