#!/usr/bin/env python
"""Phase-level timing of dedup_semantic_semdedup in a COLD process
(r14, guide §1): where do the seconds go — count, coarse fit (per
Lloyd job), cells checkpoint, fine fit (seed window + phase jobs),
final assign+pair query?"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from backend_etl_spark.catalog import REGISTRY  # noqa: E402
from backend_etl_spark.catalog.llmops2 import _KM_ITERS, _KM_K, _SEM_TARGET  # noqa: E402
from backend_etl_spark.operators import clustering, dedup, similarity  # noqa: E402
from backend_etl_spark.session import get_spark, release_all_persistent  # noqa: E402
from backend_etl_spark.sources.loader import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

marks: list[tuple[str, float]] = []
_t = [time.perf_counter()]


def mark(label: str) -> None:
    now = time.perf_counter()
    marks.append((label, now - _t[0]))
    _t[0] = now
    print(f"{label}: {marks[-1][1]:.3f}s", flush=True)


def main() -> None:
    spark = get_spark("r14-semdedup-phases")
    mark("session")
    if "--warm" in sys.argv:
        for warm in ("q3_shipping_priority", "multimodal_binary_meta"):
            REGISTRY[warm].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            release_all_persistent(spark)
        mark("warmup")

    emb_raw = load_table(spark, SF_DIR, "embeddings")
    par = spark.sparkContext.defaultParallelism
    emb = emb_raw.repartition(par)
    n_emb = emb_raw.count()
    mark("count")
    kt = max(_KM_K, n_emb // _SEM_TARGET)
    k1 = max(_KM_K, int(math.floor(math.sqrt(float(kt)))))

    # coarse fit, phase by phase (inline copy of kmeans_fit's loop)
    cents = clustering.seed_centroids(emb_raw, k1, n=n_emb)
    mark("coarse_seed")
    for i in range(_KM_ITERS - 1):
        assigned = clustering.assign_clusters(emb_raw, cents)
        rows = (
            assigned.select(
                "cluster",
                F.posexplode(
                    clustering._as_double(F.col("embedding"))
                ).alias("dim", "val"),
            )
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("val"), clustering.CENT_DP).alias("cv"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["cv"]
        dim = len(next(iter(cents.values())))
        cents = {
            cid: [dims[d] for d in range(dim)]
            for cid, dims in by_cluster.items()
        }
        mark(f"coarse_update_{i}")
    coarse = cents

    cells = clustering.assign_clusters(emb, coarse).select(
        "vec_id", "embedding", F.col("cluster").alias("cell")
    ).localCheckpoint(eager=False)
    mark("cells_checkpoint")

    fine = clustering.kmeans_fit_grouped(
        cells,
        "cell",
        lambda cn: max(1, cn // _SEM_TARGET),
        iters=_KM_ITERS,
        memo_df=emb,
        memo_tag=f"sem_fine_k1={k1}",
        fused=True,
    )
    mark("fine_fit")

    e2 = clustering.assign_clusters_multi(
        cells, fine, tag_col="cell", out_col="fid"
    ).select(
        "vec_id",
        (
            F.col("cell").cast("bigint") * F.lit(1_000_000)
            + F.col("fid").cast("bigint")
        ).alias("cluster"),
        similarity.to_double("embedding").alias("v"),
    )
    drop = dedup.intra_cluster_cosine_drops(e2, threshold=0.3).withColumn(
        "__dropped", F.lit(True)
    )
    out = e2.join(drop, "vec_id", "left").select(
        "vec_id",
        F.col("cluster").cast("bigint").alias("cluster"),
        F.coalesce(~F.col("__dropped"), F.lit(True)).alias("kept"),
    )
    out.write.format("noop").mode("overwrite").save()
    mark("final_query")
    total = sum(d for _, d in marks)
    print(f"TOTAL {total:.3f}s  (n={n_emb}, k1={k1}, kt={kt})")


if __name__ == "__main__":
    main()
