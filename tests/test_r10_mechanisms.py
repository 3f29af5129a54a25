"""Pins for the round-10 overhead cuts: the BPE trainer's
one-action-per-merge loop (the named term behind the r9
bpe_train_merges drift was the 3 driver actions per iteration) and the
streaming dedup drain's never-recompute-the-corpus-index contract."""

from __future__ import annotations

from contextlib import contextmanager

import pyspark.sql.functions as F


@contextmanager
def _no_aqe(spark):
    """AQE splits one action into one job per query stage, which would
    make the job count measure shuffle topology instead of driver
    round-trips — pin it off for the counting probe."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def _job_count(spark, fn) -> int:
    """Number of Spark jobs fn() triggers, via a dedicated job group."""
    sc = spark.sparkContext
    group = "jobcount-probe"
    sc.setJobGroup(group, "job count probe")
    try:
        before = set(sc.statusTracker().getJobIdsForGroup(group))
        fn()
        after = set(sc.statusTracker().getJobIdsForGroup(group))
    finally:
        sc.setJobGroup(None, None)
    return len(after - before)


def test_bpe_runs_one_action_per_merge_plus_bookends(spark):
    """n_merges=3 must cost exactly 5 driver actions: 1 initial
    word-table checkpoint + 3 combined pair+vocab aggregates + 1
    trailing vocab job for the final merge. The pre-r10 shape was 10
    (best-pair collect + eager checkpoint + vocab count-distinct per
    iteration) and its fixed overhead compounded across rounds under
    the per-round mover bar."""
    from backend_etl_spark.operators.textops import bpe_train_merges

    texts = ["abab abab cab", "b a b a b a", "aa bb aa bb aab"] * 4
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id BIGINT, text STRING"
    )
    merges = []
    with _no_aqe(spark):
        n_jobs = _job_count(
            spark,
            lambda: merges.extend(
                bpe_train_merges(df, n_merges=3, min_pair_count=1)
            ),
        )
    assert len(merges) == 3
    assert n_jobs == 5, f"expected 5 jobs (1 ckpt + 3 fused + 1 vocab), got {n_jobs}"


def test_incremental_probe_reads_checkpointed_bands_not_minhash(spark):
    """The drain's corpus index is checkpointed ONCE, already melted:
    a probe plan must scan the materialized checkpoint (ExistingRDD)
    and contribute ZERO corpus-side shingle explodes — only the batch
    side's minhash runs per micro-batch."""
    from backend_etl_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"some text body number {i} with shared words") for i in range(60)],
        "doc_id BIGINT, text STRING",
    )
    sigs = dedup.minhash_signatures(docs, "doc_id", "text")
    corpus_bands = (
        dedup.signature_bands(sigs, "doc_id")
        .select(F.col("doc_id").alias("corpus_doc_id"), "band_id", "band_value")
        .localCheckpoint(eager=True)
    )
    batch = spark.createDataFrame(
        [(100 + i, f"some text body number {i} with shared words") for i in range(5)],
        "doc_id BIGINT, text STRING",
    )
    bsig = dedup.minhash_signatures(batch, "doc_id", "text")

    probed = dedup.incremental_lsh_matches(
        bsig, None, "doc_id", corpus_bands=corpus_bands
    )
    recompute = dedup.incremental_lsh_matches(bsig, sigs, "doc_id")

    plan_probed = probed._jdf.queryExecution().executedPlan().toString()
    plan_recompute = recompute._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan_probed
    # the batch side's shingle explode appears in both plans (twice: the
    # hits branch and the all-batch-docs left side); the live-corpus
    # plan carries exactly one MORE — the corpus minhash the checkpoint
    # removes from every micro-batch
    n_probed = plan_probed.count("Generate explode")
    n_recompute = plan_recompute.count("Generate explode")
    assert n_probed == n_recompute - 1, (plan_probed, plan_recompute)

    # and the result is still correct: every batch doc matches its twin
    rows = {r["batch_doc_id"]: r for r in probed.collect()}
    assert len(rows) == 5 and all(not r["is_novel"] for r in rows.values())
