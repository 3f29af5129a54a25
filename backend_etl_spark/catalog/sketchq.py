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
from backend_etl_spark.streaming import drain_conf

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
    # 2 staged files at 1 file/trigger = 2 real micro-batches: the merge
    # property (summed partials == one-shot sketch) is exercised with
    # half the per-batch fixed cost (the r7 ivfpq A/B: per-batch
    # machinery dominates tiny partial builds)
    ev.select(F.col("user_id").cast("string").alias("k")).repartition(2).write.mode(
        "overwrite"
    ).parquet(src)

    def _partial(batch: DataFrame, batch_id: int) -> None:
        cells = sketch.cms_build(batch, F.col("k"), _CMS_D, _CMS_W)
        cells.write.mode("overwrite").parquet(f"{sink}/batch={batch_id}")

    # n=None: foreachBatch partial builds use no state store — the
    # partition count is per-batch compute parallelism; inherit the
    # tuned width (streaming/__init__ docstring, r6 postmortem)
    with drain_conf(spark, n=None):
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
    # 2 staged files at 1 file/trigger = 2 real micro-batches: the merge
    # property (summed partials == one-shot sketch) is exercised with
    # half the per-batch fixed cost (the r7 ivfpq A/B: per-batch
    # machinery dominates tiny partial builds)
    ev.select(F.col("user_id").cast("string").alias("k")).repartition(2).write.mode(
        "overwrite"
    ).parquet(src)

    def _partial(batch: DataFrame, batch_id: int) -> None:
        sketch.cms_build(batch, F.col("k"), _CMS_D, _CMS_W).write.mode(
            "overwrite"
        ).parquet(f"{cells_p}/batch={batch_id}")
        batch.select("k").distinct().write.mode("overwrite").parquet(
            f"{cand_p}/batch={batch_id}"
        )

    # n=None: foreachBatch partial builds use no state store — the
    # partition count is per-batch compute parallelism; inherit the
    # tuned width (streaming/__init__ docstring, r6 postmortem)
    with drain_conf(spark, n=None):
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
    positives are removed by the exactness join itself — which carries
    a merge hint, because the build side is a corpus-FRACTION (14% of
    orderkeys), not a dimension: the bloom bits are the broadcastable
    summary of the key set precisely because the key set itself is not.
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
        pruned.join(build.hint("merge"), pruned.l_orderkey == build.o_orderkey)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# LogLog distinct-count sketch (engine-portable)
# ---------------------------------------------------------------------------

_FM_M = 64

#: shared oracle CTE: the LogLog register relation for an arbitrary key
#: relation `{src}` (one VARCHAR column k), replayed from the identical
#: md5 hash family Spark uses in operators/sketch.py::fm_registers
_FM_REG_CTE = """
    {p}h AS (SELECT ('0x' || substr(md5('fm0#' || k), 1, 8))::BIGINT % {m} AS reg,
                    ('0x' || substr(md5('fm0#' || k), 9, 8))::BIGINT AS h2
             FROM {src}),
    {p}rr AS (SELECT reg,
                     max(CASE WHEN h2 = 0 THEN 33
                              ELSE CAST(log2(h2 & (-h2)) AS INT) + 1 END) AS r
              FROM {p}h GROUP BY reg),
    {p}dense AS (SELECT t.reg, coalesce({p}rr.r, 0) AS r
                 FROM range({m}) t(reg) LEFT JOIN {p}rr USING (reg))"""


def _fm_reg_cte(p: str, src: str) -> str:
    return _FM_REG_CTE.format(p=p, src=src, m=_FM_M)


_FM_EST = (
    f"round({sketch.LL_ALPHA} * {_FM_M} * pow(2.0, CAST({{sum}} AS DOUBLE)"
    f" / {_FM_M}.0), 4)"
)

_FM_ORACLE = f"""
    WITH k AS (SELECT CAST(event_id AS VARCHAR) AS k FROM events),
    {_fm_reg_cte("", "k")},
    s AS (SELECT CAST(sum(r) AS BIGINT) AS sum_rho,
                 CAST(count(*) FILTER (r = 0) AS BIGINT) AS n_empty
          FROM dense),
    ex AS (SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS exact_distinct
           FROM events)
    SELECT ex.exact_distinct, s.sum_rho, s.n_empty,
           {_FM_EST.format(sum="s.sum_rho")} AS fm_est,
           abs({_FM_EST.format(sum="s.sum_rho")} - ex.exact_distinct)
             <= 0.35 * ex.exact_distinct AS within_bound
    FROM s CROSS JOIN ex
"""


@register("sketch_loglog_distinct_portable", oracle=_FM_ORACLE)
def sketch_loglog_distinct_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogLog distinct-count sketch (Durand & Flajolet 2003; m=64
    max-rho registers with stochastic averaging, the FM observable)
    over events.event_id, with the estimate E = alpha_m * m *
    2^(sum R / m) and the |est-exact| <= 0.35*exact check (~2.2x the
    published 1.30/sqrt(m) standard error) emitted per run.

    Unlike HLL++ (`agg_approx_count_distinct`, engine-opaque sketch →
    rows-only attestation), this sketch is built on the portable md5
    hash family, so the DuckDB oracle replays every register bit-for-bit
    and the ESTIMATE ITSELF is hash-attested — closing the one
    attestation carve-out class in the sketch family.

    Scale shape: one map-only hash select + one groupBy on <= m register
    ids with map-side max merge (<= m rows per input partition reach the
    shuffle); the estimate folds a broadcast-sized 64-row spine.
    Nothing driver-side. Flajolet & Martin 1985 via PAPERS.md.
    """
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    regs = sketch.fm_registers(
        ev.select(F.col("event_id").cast("string").alias("k")), F.col("k"), _FM_M
    )
    est = sketch.fm_estimate(regs, _FM_M)
    ex = ev.agg(F.count_distinct("event_id").cast("bigint").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(ex)).select(
        "exact_distinct",
        "sum_rho",
        "n_empty",
        "fm_est",
        (
            F.abs(F.col("fm_est") - F.col("exact_distinct"))
            <= 0.35 * F.col("exact_distinct")
        ).alias("within_bound"),
    )


_FM_UNION_ORACLE = f"""
    WITH ka AS (SELECT CAST(event_id AS VARCHAR) AS k FROM events
                WHERE event_id % 3 IN (0, 1)),
    kb AS (SELECT CAST(event_id AS VARCHAR) AS k FROM events
           WHERE event_id % 3 IN (1, 2)),
    ku AS (SELECT k FROM ka UNION ALL SELECT k FROM kb),
    {_fm_reg_cte("a_", "ka")},
    {_fm_reg_cte("b_", "kb")},
    {_fm_reg_cte("u_", "ku")},
    merged AS (SELECT a.reg, greatest(a.r, b.r) AS r
               FROM a_dense a JOIN b_dense b USING (reg)),
    s AS (SELECT CAST(sum(m.r) AS BIGINT) AS sum_rho_merged,
                 CAST((SELECT sum(r) FROM u_dense) AS BIGINT) AS sum_rho_direct
          FROM merged m),
    ex AS (SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS exact_union
           FROM events)
    SELECT s.sum_rho_merged, s.sum_rho_direct,
           s.sum_rho_merged = s.sum_rho_direct AS merge_lossless,
           {_FM_EST.format(sum="s.sum_rho_merged")} AS est_union,
           ex.exact_union
    FROM s CROSS JOIN ex
"""


@register("sketch_loglog_merge_union", oracle=_FM_UNION_ORACLE)
def sketch_loglog_merge_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-union distributivity, attested: two OVERLAPPING feeds
    (event_id % 3 in (0,1) vs (1,2)) each build their own LogLog
    register relation; max-merging the two register vectors must equal
    the sketch built directly on the concatenated feeds
    (merge_lossless), and the merged sketch prices distinct-of-union
    WITHOUT re-reading either feed — the question exact counting cannot
    answer from per-feed distinct counts at all (overlap unknown).

    This is the property that lets per-day / per-partition sketches
    roll up to any grain at 100 TB: each partition ships m integers,
    the fold is an m-row max — never a re-scan. Same portable md5
    family as sketch_loglog_distinct_portable, so every register and both
    estimates hash-attest against the DuckDB replay.

    Scale shape: two bounded groupBys (map-side max), one m-row join
    for the merge — all broadcast-sized after the register fold."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    key = F.col("event_id").cast("string").alias("k")
    feed_a = ev.where(F.col("event_id") % 3 < 2).select(key)
    feed_b = ev.where(F.col("event_id") % 3 >= 1).select(key)

    def dense(df: DataFrame, tag: str) -> DataFrame:
        regs = sketch.fm_registers(df, F.col("k"), _FM_M)
        spine = spark.range(_FM_M).select(F.col("id").alias("reg"))
        return spine.join(regs, "reg", "left").select(
            "reg", F.coalesce(F.col("r"), F.lit(0)).alias(f"r_{tag}")
        )

    merged = (
        dense(feed_a, "a")
        .join(dense(feed_b, "b"), "reg")
        .select(F.greatest("r_a", "r_b").alias("r"))
        .agg(F.sum("r").cast("bigint").alias("sum_rho_merged"))
    )
    direct = (
        dense(feed_a.unionAll(feed_b), "u")
        .agg(F.sum("r_u").cast("bigint").alias("sum_rho_direct"))
    )
    ex = ev.agg(F.count_distinct("event_id").cast("bigint").alias("exact_union"))
    est = F.round(
        F.lit(sketch.LL_ALPHA * _FM_M)
        * F.pow(F.lit(2.0), F.col("sum_rho_merged") / float(_FM_M)),
        4,
    )
    return (
        merged.crossJoin(F.broadcast(direct))
        .crossJoin(F.broadcast(ex))
        .select(
            "sum_rho_merged",
            "sum_rho_direct",
            (F.col("sum_rho_merged") == F.col("sum_rho_direct")).alias(
                "merge_lossless"
            ),
            est.alias("est_union"),
            "exact_union",
        )
    )
