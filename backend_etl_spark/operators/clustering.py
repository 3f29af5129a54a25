"""DataFrame-native Lloyd's k-means over an ``array<float>`` embedding
column — the centroid builder for a real IVF (inverted-file) ANN index:
fit k centroids, assign every vector to its nearest list, then restrict
each query to its probe list(s).

Execution model (the standard scale-out Lloyd's):
- the k×dim centroid table lives on the DRIVER (tiny — 8×64 doubles
  here; even k=65536, dim=1024 is ~0.5 GB, broadcastable),
- each iteration is ONE distributed pass: broadcast centroids as a
  literal expression, per-row argmin (map-only), then a
  posexplode → groupBy(cluster, dim) partial-aggregated avg — a single
  shuffle of k×dim rows, independent of corpus size,
- centroid averages are rounded to 6 dp each iteration so the whole
  trajectory is engine-reproducible (the DuckDB oracle unrolls the same
  iterations in SQL and lands on bit-identical centroids).

Determinism: seeds are strided picks over vec_id, argmin ties break on
cluster id, folds run in array order. No UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIST_DP = 6  # round distances before argmin: absorbs summation noise
CENT_DP = 6  # round centroid coords after each update: engine parity


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda v: v.cast("double"))


def _dist2(v: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid — ordered fold, exactly
    reproducible as list_reduce in the oracle."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def nearest_centroid(
    vec: Column, centroids: dict[int, list[float]]
) -> Column:
    """The argmin-over-literal-centroids STRUCT (fields ``d``, ``cid``)
    assign_clusters is built on, exposed as a bare expression so a
    multi-quantizer encode (coarse + N PQ subspaces) can compute every
    assignment in ONE map-only select — a per-subspace
    assign-then-join-on-vec_id would shuffle the full corpus once per
    subspace at scale."""
    v = _as_double(vec)
    return F.array_min(
        F.array(
            *[
                F.struct(
                    F.round(_dist2(v, cent), DIST_DP).alias("d"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cent in sorted(centroids.items())
            ]
        )
    )


def assign_clusters(
    df: DataFrame,
    centroids: dict[int, list[float]],
    emb_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: adds ``cluster`` and ``dist2``.

    Map-only — the argmin over k centroids is an array_min over a
    literal struct array (dist rounded, tie-break on cluster id), so the
    stage broadcasts nothing at runtime and shuffles nothing.
    """
    best = nearest_centroid(F.col(emb_col), centroids)
    return df.withColumn("cluster", best["cid"]).withColumn("dist2", best["d"])


def seed_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", emb_col: str = "embedding"
) -> dict[int, list[float]]:
    """Deterministic strided seeds: the first k vectors whose id is a
    multiple of floor(n/k), in id order. One count + one k-row collect."""
    n = df.count()
    stride = max(n // k, 1)
    rows = (
        df.where((F.col(id_col) % stride) == 0)
        .orderBy(id_col)
        .limit(k)
        .select(_as_double(F.col(emb_col)).alias("v"))
        .collect()
    )
    # seeds stay unrounded: float32 → double widening is exact, so both
    # engines start from bit-identical centroids without a rounding step
    return {i: [float(x) for x in r["v"]] for i, r in enumerate(rows)}


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> dict[int, list[float]]:
    """Lloyd's iterations; returns the final centroid table. ``iters``
    assignment passes, ``iters - 1`` centroid updates (the last
    assignment is the caller's to materialize via assign_clusters).

    Each update shuffles exactly k×dim (cluster, dim) partial averages —
    corpus-size-independent. Clusters that lose all members drop out
    (standard Lloyd's degeneracy; deterministic on both engines).
    """
    cents = seed_centroids(df, k, id_col, emb_col)
    for _ in range(iters - 1):
        assigned = assign_clusters(df, cents, emb_col)
        rows = (
            assigned.select(
                "cluster", F.posexplode(_as_double(F.col(emb_col))).alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("val"), CENT_DP).alias("cv"))
            .collect()
        )
        new_cents: dict[int, list[float]] = {}
        dim = len(next(iter(cents.values())))
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["cv"]
        for cid, dims in by_cluster.items():
            new_cents[cid] = [dims[d] for d in range(dim)]
        cents = new_cents
    return cents


def probe_clusters(
    df: DataFrame,
    centroids: dict[int, list[float]],
    nprobe: int = 2,
    emb_col: str = "embedding",
) -> DataFrame:
    """Multi-probe assignment: adds ``probes`` — the ``nprobe`` nearest
    centroid ids in distance order (ties on cluster id). Same map-only
    literal-centroid argsort as assign_clusters; exploding ``probes``
    yields the (row, probe_cluster) relation an IVF search joins on.
    nprobe is THE recall/cost knob at scale: probe cost grows linearly,
    recall approaches exact as nprobe → k."""
    v = _as_double(F.col(emb_col))
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.round(_dist2(v, cent), DIST_DP).alias("d"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cent in sorted(centroids.items())
            ]
        )
    )
    probes = F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cid"])
    return df.withColumn("probes", probes)
