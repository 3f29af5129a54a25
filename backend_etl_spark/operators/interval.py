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


def binned_interval_count(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    band_s: int,
    key_cols: list[str],
    out_col: str = "n_in_band",
    check_unique: bool = False,
) -> DataFrame:
    """Per-left-row COUNT of right rows in ``(left_ts − band_s, left_ts]``
    — the aggregate-pushdown form of ``binned_interval_join(how='left')``
    + ``groupBy().count()``.

    In-band pairs grow quadratically with event density (both sides 10×
    denser → ~100× pairs per decade), so the pair stream must collapse
    as early as possible. Here the inner bucket join's pairs are
    aggregated per left key immediately — the map-side partial agg
    (combiner) collapses them before any shuffle, so only |left| rows
    move — and the zero-count left rows come back via ONE equi-join on
    the key instead of the generic path's distinct → anti-join → union
    → re-aggregate, which shuffled the full super-linear pair stream
    three times. ``key_cols`` must uniquely identify left rows (the
    count is per left ROW) — under duplicate keys this form silently
    differs from the join+groupBy it replaces: each duplicate left row
    receives the MERGED per-key count and survives as its own output
    row. ``check_unique=True`` enforces the contract with one cheap
    keyed aggregate over ``left`` (debug/test use; leave off on the
    hot path).
    """
    if check_unique:
        dup = (
            left.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                "binned_interval_count: key_cols do not uniquely identify "
                f"left rows (e.g. {dict((c, dup[0][c]) for c in key_cols)} "
                f"appears {dup[0]['__n']} times) — the per-row count "
                "contract is violated"
            )
    inner = binned_interval_join(
        left, right, left_ts, right_ts, band_s, how="inner"
    )
    counts = inner.groupBy(*key_cols).agg(
        F.count(F.col(right_ts)).cast("bigint").alias(out_col)
    )
    # counts is a keyed aggregate over a growing input (the r6
    # derived-side class): its through-agg size estimate stays tiny, so
    # unhinted the static planner would broadcast it — the one-sided
    # merge hint forces SMJ for the whole join; the join key
    # partitioning is reused from the aggregation.
    return left.join(counts.hint("merge"), key_cols, "left").select(
        *left.columns,
        F.coalesce(F.col(out_col), F.lit(0)).cast("bigint").alias(out_col),
    )
