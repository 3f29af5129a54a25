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


def token_budget_pack(
    df: DataFrame,
    id_col: str,
    token_col: str,
    quality_col: Column,
    budget: int,
) -> DataFrame:
    """Fill a token budget with the highest-quality documents: order by
    quality (best first, id tie-break), keep rows while the running token
    sum stays within `budget`. The 'select the best N-token training
    mix' operator — one global sort + running-sum window.

    At 100 TB the global window is the cost center; shard the budget per
    partition key first (e.g. per language) and pack each shard, or use
    an approximate quality threshold from a quantile sketch.
    """
    w = (
        Window.orderBy(quality_col.desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__cum", F.sum(F.col(token_col)).over(w))
        .where(F.col("__cum") <= budget)
        .drop("__cum")
    )


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
    """
    assert sum(weights) == 100, "weights must sum to 100"
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("split#"), cluster_key)), 1, 2), 16, 10)
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
