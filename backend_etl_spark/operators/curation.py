"""Training-data curation operators: deterministic sampling and
token-budget packing.

Random sampling is the wrong tool in a reproducible data pipeline —
``rand()`` varies across retries and engines. These operators derive
selection from md5 of the stable document id, so every run (and the
DuckDB oracle) selects the identical subset: the curation equivalent of
the reference's idempotent-ingest discipline.

All UDF-free: hash ordering, windows, running sums — one shuffle per
stratum boundary, linear everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def md5_uniform(col: Column | str) -> Column:
    """Deterministic pseudo-uniform in [0, 1): the first 8 hex digits of
    md5(id) as a fraction. Engine-portable (DuckDB computes the same
    value) and stable across runs/retries — the reproducible substitute
    for rand()."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.substring(F.md5(c.cast("string")), 1, 8)
    return F.conv(h, 16, 10).cast("double") / F.lit(4294967296.0)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen by id hash — the same rows every
    run, on every engine, under any partitioning."""
    return df.where(md5_uniform(id_col) < fraction)


def stratified_sample(
    df: DataFrame, id_col: str, stratum_col: str, k_per_stratum: int
) -> DataFrame:
    """Exactly k rows per stratum (fewer if the stratum is smaller),
    picked by hash order — deterministic stratified sampling (equal
    representation per language/source/bucket, the standard curation
    move against majority-class domination)."""
    w = Window.partitionBy(stratum_col).orderBy(md5_uniform(id_col), F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k_per_stratum)
        .drop("__rn")
    )


def sharded_running_sum(
    df: DataFrame,
    shard_expr: Column,
    order_by: list[Column],
    value_col: str,
    out_col: str,
    ascending_shards: bool = True,
) -> DataFrame:
    """Distributed global running sum WITHOUT a single-partition window —
    the two-pass prefix-sum every scale-out engine uses:

    1. per-shard local prefix sums (window PARTITIONED by the shard, so
       all shards sort/scan in parallel);
    2. a shard-totals aggregate (one row per shard — bounded, tiny) whose
       cumulative predecessor sums become per-shard offsets via a
       triangular broadcast self-join (window-free, so no
       partition-less Window exists anywhere in the plan);
    3. global running sum = local prefix + broadcast shard offset.

    CONTRACT: ``shard_expr`` must be monotone in the leading sort key —
    ordering by (shard, *order_by) must equal ordering by the intended
    global order (e.g. the integer value of the first hex chars of a hash
    ordered by that hash, or a coarse quality bucket ordered by quality).
    Then the result is bit-identical to the global-window formulation,
    but the biggest task touches |corpus| / n_shards rows instead of all
    of them.
    """
    d = df.withColumn("__shard", shard_expr)
    w = (
        Window.partitionBy("__shard")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("__local", F.sum(F.col(value_col)).over(w))
    totals = d.groupBy("__shard").agg(F.sum(F.col(value_col)).alias("__tot"))
    pred = (
        F.col("__s2") < F.col("__s")
        if ascending_shards
        else F.col("__s2") > F.col("__s")
    )
    offsets = (
        totals.select(F.col("__shard").alias("__s"))
        .join(
            F.broadcast(totals.select(F.col("__shard").alias("__s2"), "__tot")),
            pred,
            "left",
        )
        .groupBy("__s")
        .agg(F.coalesce(F.sum("__tot"), F.lit(0)).alias("__off"))
    )
    return (
        local.join(F.broadcast(offsets), F.col("__shard") == F.col("__s"))
        .withColumn(out_col, F.col("__local") + F.col("__off"))
        .drop("__shard", "__local", "__s", "__off")
    )


def token_budget_pack(
    df: DataFrame,
    id_col: str,
    token_col: str,
    quality_col: Column,
    budget: int,
    quality_buckets: int = 1000,
) -> DataFrame:
    """Fill a token budget with the highest-quality documents: order by
    quality (best first, id tie-break), keep rows while the running token
    sum stays within `budget` — the 'select the best N-token training
    mix' operator.

    The running sum is the two-pass sharded prefix sum
    (sharded_running_sum), sharded by a coarse quality bucket
    ``floor(quality * quality_buckets)`` — monotone in the sort key, so
    the output is identical to a global-window formulation while the
    sort/cumsum parallelizes across buckets. Assumes quality is a
    bounded ratio (the usual case: distinct-token ratio, stopword
    fraction, classifier score in [0, 1]); for unbounded metrics pass a
    pre-bucketed df through sharded_running_sum directly.
    """
    packed = sharded_running_sum(
        df,
        shard_expr=F.floor(quality_col * quality_buckets).cast("bigint"),
        order_by=[quality_col.desc(), F.col(id_col)],
        value_col=token_col,
        out_col="__cum",
        ascending_shards=False,
    )
    return packed.where(F.col("__cum") <= budget).drop("__cum")


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    cluster_key: Column,
    weights: tuple[int, int, int] = (80, 10, 10),
) -> DataFrame:
    """Train/val/test assignment that can't leak duplicates across
    splits: the split is a deterministic hash of ``cluster_key`` (NOT of
    the row id), so every member of a duplicate cluster lands in the
    same split. Pass ``content_key(text)`` for exact-dup safety or a
    precomputed ``cluster_id`` from ``cluster_components`` for
    near-dup safety (eval-contamination discipline).

    Map-only (given the key column): no shuffle, no lookup table —
    assignment is recomputable row-locally on any engine, any run.

    The bucket uses the first 8 hex chars of the md5 (2^32 values) so
    ``bucket % 100`` is uniform to within 2^-32 and the realized split
    fractions match the weights. (2 hex chars = 256 values would skew
    buckets 0-55 to 3/256 vs 2/256 — a ~4pp bias against the stated
    80/10/10 contract.)
    """
    assert sum(weights) == 100, "weights must sum to 100"
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("split#"), cluster_key)), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    train_w, val_w, _ = weights
    return df.select(
        F.col(id_col),
        cluster_key.alias("cluster_key"),
        bucket.alias("bucket"),
        F.when(bucket < train_w, "train")
        .when(bucket < train_w + val_w, "val")
        .otherwise("test")
        .alias("split"),
    )


def weighted_sample_keys(
    id_col: Column | str, weight: Column, seed_tag: str = "ws#"
) -> Column:
    """Efraimidis–Spirakis (2006) A-Res key for weighted sampling
    without replacement: rank by ln(u)/w (order-equivalent to u^(1/w)),
    u drawn deterministically from the md5 hash of the id — so the
    sample is reproducible on every engine and under any partitioning,
    like every other sampler here. Rounded to 10 dp so cross-engine
    ln() ulp differences cannot reorder keys (doc-id tie-break handles
    the rounded collisions identically on both sides)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed_tag), c.cast("string"))), 1, 8), 16, 10
    ).cast("double")
    u = (h + 0.5) / 4294967296.0
    return F.round(F.log(u) / F.greatest(weight, F.lit(1)).cast("double"), 10)


def weighted_sample(
    df: DataFrame, id_col: str, weight: Column, k: int
) -> DataFrame:
    """Top-k rows by A-Res key: inclusion probability proportional to
    weight, without replacement — the 'sample high-quality docs more
    often' curation move. orderBy+limit compiles to TakeOrdered
    (per-partition heaps + a k-row driver merge), never a global sort."""
    return (
        df.withColumn("sample_key", weighted_sample_keys(id_col, weight))
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(k)
    )


def bestfit_pack_shards(
    df: DataFrame,
    shard_col: str,
    size_col: str,
    capacity: int,
) -> DataFrame:
    """Best-Fit-Decreasing bin packing, sharded: within each shard,
    items are sorted by size descending and each is placed into the
    open bin with the LEAST remaining space that still fits (new bin
    otherwise). Returns one summary row per shard with the bin count
    and the Dósa (2007) FFD guarantee — BFD shares it — checked in
    exact integer arithmetic: 9·bins ≤ 11·LB + 6, where LB =
    max(⌈Σsize / capacity⌉, #{items with 2·size > capacity}) ≤ OPT
    (big items pairwise cannot share a bin). Because the check runs
    against a computable lower bound rather than OPT itself, True
    soundly implies the Dósa bound vs OPT holds; adversarial inputs
    where OPT exceeds both LB terms could flag False without BFD
    actually violating its guarantee — the attested statement is the
    (stronger, data-dependent) LB inequality.

    This is the one curation operator whose inner loop is genuinely
    imperative (bin residual state mutates per item), so it is the
    catalog's showcase of the escape hatch tier: an Arrow-batched
    applyInPandas over the shard key — the shard is the unit of
    parallelism, the driver never sees item rows. The greedy
    running-sum packers (token_budget_pack / pack_sequences) stay pure
    DataFrame; this one trades a Python stage for ~perfect bin fill.

    At 100 TB: shards = O(cores) hash groups, each packs its slice
    independently (Σ per-shard bins ≤ Σ(11/9·OPT_s + 1) — the global
    fill loss vs unsharded BFD is bounded by one bin per shard).
    Zero-size items consume no capacity and open no bin.
    """
    import bisect

    import pandas as pd

    out_schema = (
        f"{shard_col} bigint, n_docs bigint, total_tokens bigint, "
        "lb_bins bigint, bins_used bigint, within_ffd_bound boolean, "
        "capacity_respected boolean"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        sizes = sorted(
            (int(s) for s in pdf[size_col] if int(s) > 0), reverse=True
        )
        residuals: list[int] = []  # sorted ascending
        for s in sizes:
            i = bisect.bisect_left(residuals, s)
            if i < len(residuals):  # tightest bin that fits (best fit)
                r = residuals.pop(i) - s
            else:  # nothing fits -> open a bin
                r = capacity - s
            bisect.insort(residuals, r)
        total = int(pdf[size_col].sum())
        n_big = sum(1 for s in sizes if 2 * s > capacity)
        lb = max(-(-total // capacity), n_big)  # ceil(sum/cap) vs big-item count
        bins_used = len(residuals)
        return pd.DataFrame(
            {
                shard_col: [int(pdf[shard_col].iloc[0])],
                "n_docs": [len(pdf)],
                "total_tokens": [total],
                "lb_bins": [lb],
                "bins_used": [bins_used],
                "within_ffd_bound": [9 * bins_used <= 11 * lb + 6],
                "capacity_respected": [all(0 <= r <= capacity for r in residuals)],
            }
        )

    return df.groupBy(shard_col).applyInPandas(_pack, out_schema)
