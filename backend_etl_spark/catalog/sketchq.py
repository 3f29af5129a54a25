"""Sketch-based approximate operators: Count-Min heavy-hitter counts
and Bloom-filter runtime join pruning.

Completes the sketch family (HLL++ `agg_approx_count_distinct` /
`agg_approx_error_bounded`, quantile `agg_approx_quantile_bounded`)
with the two classic mergeable sketches PySpark 4 does not expose to
Python — built as DataFrame aggregations in operators/sketch.py on the
engine-portable md5 hash family, so the DuckDB oracle replays the
Count-Min sketch bit-for-bit (full value attestation, not a rows-only
carve-out), and the Bloom-pruned join is attested against the plain
join it must be semantically identical to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_etl_spark.catalog.registry import register
from backend_etl_spark.operators import sketch
from backend_etl_spark.session import tune
from backend_etl_spark.sources.loader import load_table

_CMS_D = 4
_CMS_W = 64  # deliberately narrow so collisions are visible at test SFs

_CMS_ORACLE = f"""
    WITH k AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
    tot AS (SELECT count(*) AS n_total FROM events),
    h AS (SELECT k, t.r,
                 ('0x' || substr(md5('cms' || t.r || '#' || k), 1, 8))::BIGINT
                   % {_CMS_W} AS c
          FROM k, range({_CMS_D}) t(r)),
    sk AS (SELECT r, c, count(*) AS cnt FROM h GROUP BY r, c),
    ex AS (SELECT k, count(*) AS exact_n FROM k GROUP BY k
           ORDER BY exact_n DESC, CAST(k AS BIGINT) LIMIT 10),
    probes AS (SELECT ex.k, t.r,
                      ('0x' || substr(md5('cms' || t.r || '#' || ex.k),
                                      1, 8))::BIGINT % {_CMS_W} AS c
               FROM ex, range({_CMS_D}) t(r)),
    est AS (SELECT p.k, min(coalesce(sk.cnt, 0)) AS cms_est
            FROM probes p
            LEFT JOIN sk ON sk.r = p.r AND sk.c = p.c
            GROUP BY p.k)
    SELECT CAST(ex.k AS BIGINT) AS user_id,
           CAST(ex.exact_n AS BIGINT) AS exact_n,
           CAST(est.cms_est AS BIGINT) AS cms_est,
           est.cms_est <= ex.exact_n
             + CAST(ceil(2.718281828459045 * tot.n_total / {_CMS_W}.0) AS BIGINT)
             AS within_eps
    FROM ex JOIN est ON est.k = ex.k CROSS JOIN tot
"""


def _cms_heavy_hitters(ev: DataFrame, sk: DataFrame) -> DataFrame:
    """Top-10 exact heavy hitters of events.user_id annotated with their
    CMS estimate from ``sk`` and the published est ≤ exact + ⌈(e/w)·N⌉
    bound as a per-key boolean — shared by the batch-built and the
    streaming-merged sketch entries (both must hash-match _CMS_ORACLE)."""
    ex = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("user_id"))
        .limit(10)
        .select(F.col("user_id").cast("string").alias("k"), "exact_n")
    )
    est = sketch.cms_estimate(sk, ex.select("k"), "k", _CMS_D, _CMS_W)
    tot = ev.agg(F.count(F.lit(1)).alias("n_total"))
    bound = F.ceil(F.lit(2.718281828459045) * F.col("n_total") / float(_CMS_W))
    return (
        ex.join(est, "k")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("bigint").alias("user_id"),
            "exact_n",
            "cms_est",
            (F.col("cms_est") <= F.col("exact_n") + bound).alias("within_eps"),
        )
    )


@register("sketch_count_min_bounded", oracle=_CMS_ORACLE)
def sketch_count_min_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (d=4, w=64) over events.user_id, point-queried
    for the 10 heaviest hitters, with the published error bound
    est ≤ exact + ⌈(e/w)·N⌉ (Cormode & Muthukrishnan 2005) emitted as a
    per-key boolean.

    The DuckDB oracle rebuilds the identical sketch from the identical
    md5 hashes, so the estimates themselves are hash-attested — unlike
    HLL++, whose engine-specific sketch needs the bounded-error
    companion pattern. w=64 < |keys| forces real collisions at every
    test SF: cms_est genuinely overcounts and the bound still holds.

    Scale shape: sketch build is one explode + one bounded groupBy
    (map-side partial counters merge in the shuffle — ≤ d·w rows move
    per input partition); heavy-hitter estimation is a broadcast join
    against the ≤ d·w-row sketch. Nothing driver-side.
    """
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    key = F.col("user_id").cast("string")
    sk = sketch.cms_build(ev.select(key.alias("k")), F.col("k"), _CMS_D, _CMS_W)
    return _cms_heavy_hitters(ev, sk)


@register("streaming_sketch_cms_merge", oracle=_CMS_ORACLE)
def streaming_sketch_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch property, run as a real incremental
    pipeline: events arrive as a multi-batch availableNow file stream,
    each micro-batch builds its own partial CMS counter relation inside
    foreachBatch, and the partials are merged by summing cells — counts
    are additive, so merged counters are IDENTICAL to the one-shot batch
    sketch and this entry shares sketch_count_min_bounded's oracle.

    Restart safety: each batch's partials land at a batch_id-keyed path
    with overwrite, so checkpoint replay of a batch rewrites the same
    cells instead of double-counting (the per-batch-idempotent sink
    discipline). At-least-once *source* redelivery, by contrast, must be
    deduped upstream (W5 / dropDuplicatesWithinWatermark) — a counting
    sketch counts deliveries, by design.

    Scale shape: per batch ≤ d·w counter rows are written; the merge
    reads ≤ n_batches·d·w rows — never the event stream again. This is
    how a 100 TB/day feed keeps a live heavy-hitter table: tiny partial
    sketches ride each micro-batch, the serving side folds them.
    """
    from backend_etl_spark.sources.loader import scratch_dir

    tune(spark)
    # fresh per-invocation dir (a reused checkpoint would skip re-written
    # source files), but under the per-process staging root so bench/test
    # loops don't leak a directory per run (reclaimed at process exit)
    base = scratch_dir("cms-stream")
    src, sink, ckpt = f"{base}/src", f"{base}/cells", f"{base}/ckpt"
    ev = load_table(spark, sf_dir, "events")
    ev.select(F.col("user_id").cast("string").alias("k")).repartition(4).write.mode(
        "overwrite"
    ).parquet(src)

    def _partial(batch: DataFrame, batch_id: int) -> None:
        cells = sketch.cms_build(batch, F.col("k"), _CMS_D, _CMS_W)
        cells.write.mode("overwrite").parquet(f"{sink}/batch={batch_id}")

    (
        spark.readStream.schema("k STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(_partial)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    merged = (
        spark.read.parquet(sink)
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return _cms_heavy_hitters(ev, merged)


_CMS_TOPK_ORACLE = f"""
    WITH k AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
    tot AS (SELECT count(*) AS n_total FROM events),
    h AS (SELECT k, t.r,
                 ('0x' || substr(md5('cms' || t.r || '#' || k), 1, 8))::BIGINT
                   % {_CMS_W} AS c
          FROM k, range({_CMS_D}) t(r)),
    sk AS (SELECT r, c, count(*) AS cnt FROM h GROUP BY r, c),
    cand AS (SELECT DISTINCT k FROM k),
    probes AS (SELECT cand.k, t.r,
                      ('0x' || substr(md5('cms' || t.r || '#' || cand.k),
                                      1, 8))::BIGINT % {_CMS_W} AS c
               FROM cand, range({_CMS_D}) t(r)),
    est AS (SELECT p.k, min(coalesce(sk.cnt, 0)) AS cms_est
            FROM probes p
            LEFT JOIN sk ON sk.r = p.r AND sk.c = p.c
            GROUP BY p.k),
    top AS (SELECT k, cms_est FROM est
            ORDER BY cms_est DESC, CAST(k AS BIGINT) LIMIT 10),
    ex AS (SELECT k, count(*) AS exact_n FROM k GROUP BY k)
    SELECT CAST(top.k AS BIGINT) AS user_id,
           CAST(ex.exact_n AS BIGINT) AS exact_n,
           CAST(top.cms_est AS BIGINT) AS cms_est,
           top.cms_est <= ex.exact_n
             + CAST(ceil(2.718281828459045 * tot.n_total / {_CMS_W}.0) AS BIGINT)
             AS within_eps
    FROM top JOIN ex ON ex.k = top.k CROSS JOIN tot
"""


@register("streaming_sketch_topk_fused", oracle=_CMS_TOPK_ORACLE)
def streaming_sketch_topk_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-backed leaderboard END TO END (r4 verdict item 9): unlike
    streaming_sketch_cms_merge — whose top-k candidates come from the
    exact counts — here each micro-batch writes BOTH its partial CMS
    cells AND its distinct-key dictionary inside foreachBatch, and the
    leaderboard is the top-10 candidates ranked BY THEIR CMS ESTIMATE
    from the merged sketch. The exact counts appear only as the
    attestation companion (exact_n + the Cormode-Muthukrishnan
    est ≤ exact + ⌈(e/w)·N⌉ bound per key) — ranking never touches them.

    Both per-batch artifacts are batch_id-keyed overwrites (checkpoint
    replay rewrites, never double-counts) and both are batch-split
    invariant once unioned: summed cells = the one-shot sketch,
    unioned dictionaries = the distinct key set — so the DuckDB oracle
    replays the fused result exactly with no reference to batching.

    Scale shape: per batch ≤ d·w cells + the batch's distinct keys move;
    serving folds cells and estimates only dictionary keys — the raw
    stream is never re-read. w=64 < |keys| forces real collisions, so
    the estimate-ranked top-10 genuinely differs from exact ranking
    when collisions promote a key — exactly what the bound column is
    attesting."""
    from backend_etl_spark.sources.loader import scratch_dir

    tune(spark)
    base = scratch_dir("cms-topk")
    src, cells_p, cand_p, ckpt = (
        f"{base}/src",
        f"{base}/cells",
        f"{base}/cand",
        f"{base}/ckpt",
    )
    ev = load_table(spark, sf_dir, "events")
    ev.select(F.col("user_id").cast("string").alias("k")).repartition(4).write.mode(
        "overwrite"
    ).parquet(src)

    def _partial(batch: DataFrame, batch_id: int) -> None:
        sketch.cms_build(batch, F.col("k"), _CMS_D, _CMS_W).write.mode(
            "overwrite"
        ).parquet(f"{cells_p}/batch={batch_id}")
        batch.select("k").distinct().write.mode("overwrite").parquet(
            f"{cand_p}/batch={batch_id}"
        )

    (
        spark.readStream.schema("k STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(_partial)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    merged = spark.read.parquet(cells_p).groupBy("r", "c").agg(
        F.sum("cnt").alias("cnt")
    )
    cands = spark.read.parquet(cand_p).select("k").distinct()
    top = (
        sketch.cms_estimate(merged, cands, "k", _CMS_D, _CMS_W)
        .orderBy(F.col("cms_est").desc(), F.col("k").cast("bigint"))
        .limit(10)
    )
    ex = ev.groupBy(F.col("user_id").cast("string").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_n")
    )
    tot = ev.agg(F.count(F.lit(1)).alias("n_total"))
    bound = F.ceil(F.lit(2.718281828459045) * F.col("n_total") / float(_CMS_W))
    return (
        top.join(ex, "k")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("bigint").alias("user_id"),
            "exact_n",
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") <= F.col("exact_n") + bound).alias("within_eps"),
        )
    )


_BLOOM_M = 1 << 17
_BLOOM_K = 3

_BLOOM_ORACLE = """
    SELECT l.l_returnflag, l.l_linestatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag, l.l_linestatus
"""


@register("join_bloom_runtime_filter", oracle=_BLOOM_ORACLE)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled runtime bloom-filter join pruning — the PySpark-
    accessible version of Spark's row-level runtime filtering: build a
    128 Ki-bit / 3-hash Bloom bitmask over the selective build side
    (urgent 1997+ orders, ~14% of orders), broadcast it as ONE array
    literal, and drop ~86% of lineitem probe rows with two O(1) bit ops
    per hash BEFORE they reach the join — at 100 TB that is the
    difference between shuffling the whole fact table and shuffling the
    matching slice. No false negatives (Bloom 1970), so the result is
    provably identical to the plain join the oracle runs; false
    positives are removed by the (broadcast) join itself.
    """
    tune(spark)
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    )
    build = orders.select("o_orderkey").distinct()
    bits = sketch.bloom_build(build, F.col("o_orderkey"), _BLOOM_M, _BLOOM_K)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"
    )
    pruned = li.crossJoin(F.broadcast(bits)).where(
        sketch.bloom_might_contain(
            F.col("bits"), F.col("l_orderkey"), _BLOOM_M, _BLOOM_K
        )
    )
    return (
        pruned.join(F.broadcast(build), pruned.l_orderkey == build.o_orderkey)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )
