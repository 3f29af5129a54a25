"""Unit tests for the Count-Min / Bloom sketch operators and the
catalog entries built on them, beyond the oracle-parity gate: the
published sketch guarantees themselves (CMS never undercounts, Bloom
never false-negatives) and the pruning behaviour the bloom join exists
for."""

from pyspark.sql import functions as F

from backend_etl_spark.catalog.registry import REGISTRY
from backend_etl_spark.operators import sketch


def _keys_df(spark, values):
    return spark.createDataFrame([(v,) for v in values], ["k"])


class TestCountMin:
    def test_never_undercounts(self, spark):
        # heavy skew + narrow width forces collisions; CMS may only
        # overcount (Cormode & Muthukrishnan 2005, Thm 1)
        vals = [f"k{i % 7}" for i in range(200)] + ["hot"] * 300
        df = _keys_df(spark, vals)
        sk = sketch.cms_build(df, F.col("k"), depth=3, width=8)
        distinct = df.distinct()
        est = sketch.cms_estimate(sk, distinct, "k", depth=3, width=8)
        exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
        joined = est.join(exact, "k").collect()
        assert len(joined) == 8
        for r in joined:
            assert r["cms_est"] >= r["exact"], r

    def test_non_member_key_estimates_zero(self, spark):
        # with width >> keys, a never-inserted key's cells are all empty
        # counters (absent from the sparse relation == 0) — the estimate
        # must be 0, not inflated or missing
        df = _keys_df(spark, ["a", "b", "c"])
        sk = sketch.cms_build(df, F.col("k"), depth=4, width=4096)
        est = sketch.cms_estimate(
            sk, _keys_df(spark, ["never-seen"]), "k", depth=4, width=4096
        ).collect()
        assert len(est) == 1
        assert est[0]["cms_est"] == 0

    def test_sketch_is_bounded(self, spark):
        df = _keys_df(spark, [f"k{i}" for i in range(500)])
        sk = sketch.cms_build(df, F.col("k"), depth=4, width=16)
        assert sk.count() <= 4 * 16

    def test_catalog_entry_bound_holds(self, spark, sf_dir):
        rows = REGISTRY["sketch_count_min_bounded"].fn(spark, sf_dir).collect()
        assert len(rows) == 10
        for r in rows:
            assert r["cms_est"] >= r["exact_n"]
            assert r["within_eps"] is True


class TestBloom:
    M, K = 1 << 12, 3

    def test_no_false_negatives(self, spark):
        members = [f"m{i}" for i in range(300)]
        build = _keys_df(spark, members)
        bits = sketch.bloom_build(build, F.col("k"), self.M, self.K)
        probe = build.crossJoin(F.broadcast(bits)).where(
            sketch.bloom_might_contain(F.col("bits"), F.col("k"), self.M, self.K)
        )
        assert probe.count() == 300

    def test_filters_most_non_members(self, spark):
        build = _keys_df(spark, [f"m{i}" for i in range(100)])
        others = _keys_df(spark, [f"x{i}" for i in range(1000)])
        bits = sketch.bloom_build(build, F.col("k"), self.M, self.K)
        fp = others.crossJoin(F.broadcast(bits)).where(
            sketch.bloom_might_contain(F.col("bits"), F.col("k"), self.M, self.K)
        )
        # theoretical fpr at k=3, n=100, m=4096 is ~0.04%; allow slack
        assert fp.count() <= 20

    def test_dense_bitmask_shape(self, spark):
        bits = sketch.bloom_build(
            _keys_df(spark, ["a", "b"]), F.col("k"), self.M, self.K
        ).collect()[0]["bits"]
        assert len(bits) == self.M // 64

    def test_join_entry_prunes_probe_side(self, spark, sf_dir):
        """The point of the entry: the bloom filter must drop most of
        lineitem before the join (no false negatives ⇒ same answer,
        attested separately by the oracle)."""
        from backend_etl_spark.catalog.sketchq import (
            _BLOOM_K,
            _BLOOM_M,
        )
        from backend_etl_spark.sources.loader import load_table

        orders = load_table(spark, sf_dir, "orders").where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        )
        build = orders.select("o_orderkey").distinct()
        bits = sketch.bloom_build(
            build, F.col("o_orderkey").cast("string"), _BLOOM_M, _BLOOM_K
        )
        li = load_table(spark, sf_dir, "lineitem")
        total = li.count()
        kept = (
            li.crossJoin(F.broadcast(bits))
            .where(
                sketch.bloom_might_contain(
                    F.col("bits"),
                    F.col("l_orderkey").cast("string"),
                    _BLOOM_M,
                    _BLOOM_K,
                )
            )
            .count()
        )
        # build side selects ~14% of orders; pruned probe must be well
        # under half the fact table for the pre-shuffle filter to pay off
        assert kept < total * 0.5, (kept, total)


class TestStreamingCmsMerge:
    def test_replay_is_noop_and_merge_equals_batch(self, spark, sf_dir):
        """Re-draining the same checkpoint must not double-count any
        counter cell, and the merged partial sketches must equal the
        one-shot batch sketch cell-for-cell (counts are additive)."""
        import tempfile

        from backend_etl_spark.catalog.sketchq import _CMS_D, _CMS_W
        from backend_etl_spark.sources.loader import load_table

        base = tempfile.mkdtemp(prefix="cms-replay-")
        src, sink, ckpt = f"{base}/src", f"{base}/cells", f"{base}/ckpt"
        ev = load_table(spark, sf_dir, "events")
        keys = ev.select(F.col("user_id").cast("string").alias("k"))
        keys.repartition(3).write.parquet(src)

        def drain():
            def _partial(batch, batch_id):
                sketch.cms_build(batch, F.col("k"), _CMS_D, _CMS_W).write.mode(
                    "overwrite"
                ).parquet(f"{sink}/batch={batch_id}")

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

        def merged():
            return {
                (r["r"], r["c"]): r["cnt"]
                for r in spark.read.parquet(sink)
                .groupBy("r", "c")
                .agg(F.sum("cnt").alias("cnt"))
                .collect()
            }

        drain()
        first = merged()
        drain()  # same checkpoint, no new files: must be a no-op
        assert merged() == first
        batch_sketch = {
            (r["r"], r["c"]): r["cnt"]
            for r in sketch.cms_build(keys, F.col("k"), _CMS_D, _CMS_W).collect()
        }
        assert first == batch_sketch


class TestTrigramBackoff:
    def test_scores_and_heldout_docs(self, spark, sf_dir):
        rows = REGISTRY["quality_trigram_backoff"].fn(spark, sf_dir).collect()
        assert rows
        # stupid-backoff scores are ≤ 1 ⇒ log2 ≤ 0
        assert all(r["avg_log2s"] <= 0 for r in rows)
        assert all(r["pseudo_perplexity"] >= 1 for r in rows)
        # held-out docs (doc_id % 10 == 0) are scored too — they are the
        # rows that exercise the backoff chain
        assert any(r["doc_id"] % 10 == 0 for r in rows)


class TestLogLog:
    M = 64

    def test_register_relation_bounded_and_merge_is_max(self, spark):
        # mergeability: max-merged per-shard registers == whole-input
        # registers, for ANY split (here an arbitrary 2-way one)
        df = _keys_df(spark, [f"k{i}" for i in range(400)])
        a = df.where(F.length("k") <= 2)  # k0..k9
        b = df.subtract(a)
        whole = sketch.fm_registers(df, F.col("k"), self.M)
        sa = sketch.fm_registers(a, F.col("k"), self.M)
        sb = sketch.fm_registers(b, F.col("k"), self.M)
        merged = (
            sa.withColumnRenamed("r", "ra")
            .join(sb.withColumnRenamed("r", "rb"), "reg", "full")
            .select(
                "reg",
                F.greatest(
                    F.coalesce("ra", F.lit(0)), F.coalesce("rb", F.lit(0))
                ).alias("r"),
            )
        )
        assert whole.count() <= self.M
        assert merged.subtract(whole).count() == 0
        assert whole.subtract(merged).count() == 0

    def test_estimate_tracks_cardinality(self, spark):
        # LogLog sigma ~ 1.30/sqrt(64) ~ 16%; assert a generous 3-sigma
        # corridor at two cardinalities an order apart
        for n in (1000, 8000):
            df = _keys_df(spark, [f"key-{i}" for i in range(n)])
            regs = sketch.fm_registers(df, F.col("k"), self.M)
            est = sketch.fm_estimate(regs, self.M).collect()[0]["fm_est"]
            assert abs(est - n) <= 0.5 * n, (n, est)

    def test_duplicates_do_not_move_estimate(self, spark):
        # distinct-count property: max-rho registers are insensitive to
        # multiplicity, so 50x-duplicated input yields the SAME sketch
        base = [f"key-{i}" for i in range(500)]
        once = sketch.fm_registers(_keys_df(spark, base), F.col("k"), self.M)
        many = sketch.fm_registers(
            _keys_df(spark, base * 50), F.col("k"), self.M
        )
        assert once.subtract(many).count() == 0
        assert many.subtract(once).count() == 0

    def test_catalog_entries_green(self, spark, sf_dir):
        row = (
            REGISTRY["sketch_loglog_distinct_portable"].fn(spark, sf_dir).collect()
        )[0]
        assert row["within_bound"] is True
        assert row["n_empty"] >= 0
        u = REGISTRY["sketch_loglog_merge_union"].fn(spark, sf_dir).collect()[0]
        assert u["merge_lossless"] is True
        assert u["sum_rho_merged"] == u["sum_rho_direct"]
        assert abs(u["est_union"] - u["exact_union"]) <= 0.35 * u["exact_union"]
