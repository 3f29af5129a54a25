"""Skew-mitigation operators: salted aggregation and salted join.

At 100 TB a handful of hot keys (one viral post's mentions, one tenant
with 100× the volume) can pin a whole stage on one task. Two standard
answers, both expressed declaratively so Catalyst/AQE still optimize
around them:

- AQE skew-join splitting is ON by default in our session
  (``spark.sql.adaptive.skewJoin.enabled``, session.py) — that handles
  sort-merge joins whose *partitions* skew.
- These operators handle the cases AQE can't: a skewed ``groupBy`` (hot
  grouping key) and a broadcast-side-too-big skewed join, via explicit
  salting — spread each hot key over ``n_salts`` shuffle partitions,
  then fold the partials.

Salting an aggregation is exact for algebraic aggregates (sum/count/
min/max): stage 1 aggregates (key, salt), stage 2 merges partials per
key. The second shuffle moves only |keys| × n_salts rows — negligible
next to the unsalted hot-partition cost.

MEASURED decision rules (r12, real Zipf(1.2) data where one user owns
~20% of events — .ledger/skew_decade.json, BASELINE §y):

- A hot key costs an ALGEBRAIC aggregate nothing: map-side partial
  aggregation combines it inside every input split before the shuffle,
  so the direct groupBy matched uniform-data speed (0.40 vs 0.81 s at
  sf10) and salting only added its second shuffle (0.68 s). Reach for
  salted_count_sum's two-stage shape when the aggregate's partial
  state CANNOT combine (collect_list, exact percentile buffers) — for
  sum/count/min/max the engine already did it.
- A hot JOIN key is the real cost (1.7× uniform at sf10_skew), and
  AQE's skew split recovers uniform performance (1.81 → 1.00 s,
  SortMergeJoin(skew=true) in the executed plan) once the skew
  threshold is proportionate to partition sizes — which it IS at
  100 TB under defaults (a 20% hot key = hundreds of GB vs the 256 MB
  threshold; locally the hot partition is ~40 MB and needs the
  threshold scaled to be seen).
- Plan-time salting is insurance priced at its replication cost
  (~1.3–2 s fixed at local SFs, where it loses to AQE): use it when
  the key is KNOWN pathological and the hot task alone dwarfs that
  fixed cost, or the join is shuffled-hash where AQE's split can't
  apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16

#: The measured divide between "uniform enough" and "hot" (r12 skew
#: decade, .ledger/skew_decade.json): uniform Zipf-less builds put the
#: heaviest key at ~1e-5 of rows; the Zipf(1.2) viral-tenant build puts
#: it at ~0.20. Nothing in between occurred, and below ~1% of a table
#: no single key can dominate a default-sized shuffle partition at any
#: realistic partition count.
HOT_SHARE_THRESHOLD = 0.01


def choose_skew_strategy(
    op: str,
    hot_share: float,
    *,
    agg_is_algebraic: bool = True,
    join_is_broadcastable: bool = False,
    join_strategy: str = "sort_merge",
    known_pathological: bool = False,
) -> str:
    """The r12-measured decision rules as code (r12 verdict item 5) —
    returns ``direct`` / ``aqe`` / ``salted`` for an ``op`` of
    ``aggregate`` or ``join`` whose heaviest key owns ``hot_share`` of
    the rows. The thresholds are the .ledger/skew_decade.json
    measurements (replayed through this function by
    tests/test_r13_mechanisms.py), not guesses:

    - AGGREGATE, algebraic state (sum/count/min/max/avg) → ``direct``
      regardless of skew: map-side partial aggregation combines the hot
      key inside every input split before the shuffle (measured: direct
      0.40 s vs salted 0.68 s on the 19.5%-hot sf10 build — salting
      only added its second shuffle).
    - AGGREGATE, non-combinable state (collect_list, exact percentile
      buffers) on a hot key → ``salted``: nothing combines map-side, so
      the hot key's full row set lands on one task unless spread.
    - JOIN, small side broadcastable → ``direct``: a broadcast join
      never shuffles the fact side on the key, so key skew is moot.
    - JOIN, sort-merge, hot key → ``aqe``: the runtime skew split
      recovers uniform speed (1.81 → 1.00 s with ``skew=true`` in the
      executed plan) at zero plan cost; at 100 TB the default 256 MB
      threshold sees a 20% key without tuning. ``known_pathological``
      overrides to ``salted`` — the plan-time guarantee for a key you
      already know pins a task (AQE's split activates only when runtime
      stats cross ITS thresholds; insurance is priced at the
      replication cost, measured ~1.3–2 s at local SFs).
    - JOIN, shuffled-hash, hot key → ``salted``: AQE's skew split
      cannot rewrite a shuffled-hash join, so explicit (key, salt)
      spreading is the only mitigation.
    - Anything below HOT_SHARE_THRESHOLD → ``direct``: salting is pure
      cost on uniform keys (measured 2.9 vs 1.1 s at uniform sf10).
    """
    if op == "aggregate":
        if agg_is_algebraic or hot_share < HOT_SHARE_THRESHOLD:
            return "direct"
        return "salted"
    if op == "join":
        if join_is_broadcastable:
            return "direct"
        if hot_share < HOT_SHARE_THRESHOLD:
            return "direct"
        if known_pathological or join_strategy == "shuffled_hash":
            return "salted"
        return "aqe"
    raise ValueError(f"choose_skew_strategy: unknown op {op!r}")


def with_salt(df: DataFrame, n_salts: int = DEFAULT_SALTS, col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts) — hash of the whole row
    rather than rand() so re-runs (and retried tasks) are stable."""
    return df.withColumn(
        col_name, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_count_sum(
    df: DataFrame,
    key_cols: list[str],
    sum_col: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """groupBy(key).agg(count, sum) in two salted stages.

    Equivalent to the direct aggregation (property-tested), but the
    first shuffle key is (key, salt) so a hot key spreads over n_salts
    tasks. Output: key_cols, n BIGINT, total DOUBLE.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_pn"), F.sum(sum_col).alias("_ps")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_pn").cast("bigint").alias("n"), F.sum("_ps").alias("total")
    )


def salted_broadcast_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the large side, explode the small side
    across all salt values, join on (key, salt).

    The small side is replicated n_salts× and broadcast — so each hot
    key's rows land on n_salts different tasks instead of one. Use when
    the small side fits in memory ×n_salts; otherwise fall back to AQE
    skew-join on a sort-merge plan.
    """
    salted_large = with_salt(large, n_salts)
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_large.join(F.broadcast(exploded_small), [*on, "_salt"], how)
    return joined.drop("_salt")


def salted_shuffle_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof SHUFFLE equi-join — the mitigation for the case where
    the small side is too big to broadcast (so ``salted_broadcast_join``
    doesn't apply) and the plan is a sort-merge/shuffled-hash join whose
    hot key would pin one task: salt the large side, replicate the small
    side across all salt values, and shuffle on (key, salt) — each hot
    key's rows spread over ``n_salts`` partitions by construction,
    before AQE even looks at runtime sizes. Exactly equal to the plain
    join (the salt is dropped after the join; replication adds no
    matches because each large row carries exactly one salt value).

    Complements AQE skew-join splitting (on by default, session.py):
    AQE fixes skewed partitions it can SEE at runtime; explicit salting
    is the plan-time guarantee for keys you know are pathological
    (one viral post = 10% of the fact table)."""
    salted_large = with_salt(large, n_salts)
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_large.join(
        exploded_small.hint("shuffle_hash"), [*on, "_salt"], how
    )
    return joined.drop("_salt")


def top_keys(df: DataFrame, key_cols: list[str], k: int = 10) -> DataFrame:
    """Hot-key diagnostic: the k heaviest keys and their row share —
    what you run before deciding to salt."""
    total = df.count()
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.orderBy(F.col("n").desc(), *key_cols)
        .limit(k)
        .withColumn("share", F.round(F.col("n") / F.lit(total), 6))
    )


def skew_ratio(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """max(key count) / avg(key count), as a 1-row DataFrame."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    return counts.agg((F.max("n") / F.avg("n")).alias("skew_ratio"))
