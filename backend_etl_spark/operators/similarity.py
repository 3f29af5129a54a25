"""Similarity search over embedding columns (ARRAY<FLOAT>).

Two strategies:
- ``brute_force_topk``: exact cosine top-k of a small query set against
  the full corpus. The query side is broadcast (it is small by
  construction), so the big side streams through a map-only stage — no
  shuffle of the corpus — followed by a per-query top-k window on k·|Q|
  rows. This is the correctness baseline and is also the right plan
  whenever |Q| is small, even at 100 TB corpus scale.
- ``ivf_topk``: cluster-pruned (IVF-style) variant — candidates are
  restricted to the query's own partition (here: the ``label`` column as
  the cluster assignment; in production the assignment comes from a
  coarse quantizer). The candidate join becomes an equi-join on the
  cluster id: shuffle-partitioned, prunable, and linear in bucket size.

Vector math is pure Catalyst (`zip_with` + `aggregate` fold in DOUBLE),
so it stays in the JVM and matches the DuckDB oracle bit-for-bit modulo
summation order — results are rounded to 6 dp to absorb that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def to_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in DOUBLE (left-to-right, like the oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query over the whole corpus.

    Output: (query_id, neighbor_id, cosine_sim, rank), self-matches
    excluded, deterministic tie-break on neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), to_double(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_double(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def range_search(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ALL neighbors within a cosine-similarity radius — the range-query
    counterpart of top-k (FAISS range_search): every (query, neighbor)
    pair with cosine_sim >= threshold, self-matches excluded. Unlike
    top-k there is no per-query window at all: one broadcast of the
    query set, one map-only filtered pass over the corpus — the cheapest
    possible exact-ANN plan shape, and the right primitive for
    duplicate-radius audits ("everything suspiciously close to X")."""
    q = queries.select(
        F.col(id_col).alias("query_id"), to_double(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_double(vec_col).alias("c_vec")
    )
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Cluster-pruned approximate top-k: only candidates in the query's
    own cluster are scored. Equi-join on the cluster id — shuffles on a
    bounded key instead of broadcasting, which is the scale path when the
    query set itself is large."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(cluster_col).alias("cluster"),
        to_double(vec_col).alias("q_vec"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cluster_col).alias("cluster"),
        to_double(vec_col).alias("c_vec"),
    )
    scored = (
        c.join(q, "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def lsh_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
) -> DataFrame:
    """Random-hyperplane LSH signature per vector, computed relationally.

    Hyperplane j's component for dimension i is ±1 from the parity of
    md5(f"{i}#{j}") — deterministic, engine-portable (the DuckDB oracle
    reproduces every bit), and requiring no stored hyperplane matrix.
    Plan shape: posexplode(vec) × n_bits → two groupBys — linear in
    n·dim·n_bits with map-side partial aggregation; no UDF, no driver
    state. Projections are rounded to 6 dp before the sign test so
    summation-order differences can't flip a boundary bit.

    Output: (id, lsh_sig BIGINT) — cosine-similar vectors collide with
    high probability; the signature is the ANN bucket key.

    The input is hash-partitioned once on the id (``spread``): both
    groupBys and the caller's signature-attach join then satisfy their
    clustering from that single partitioning — the ×dim×n_bits explode
    never reshuffles.
    """
    from backend_etl_spark.operators.partitioning import spread

    base = spread(df.select(F.col(id_col), to_double(vec_col).alias("_v")), id_col)
    comp = base.select(F.col(id_col), F.posexplode(F.col("_v")).alias("i", "x"))
    bits = comp.select(
        id_col,
        "i",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("j"),
    )
    sgn = (
        F.ascii(F.substring(F.md5(F.concat_ws("#", F.col("i"), F.col("j"))), 1, 1)) % 2
    ) * 2 - 1
    proj = bits.groupBy(id_col, "j").agg(F.sum(F.col("x") * sgn).alias("p"))
    bit_val = F.when(
        F.round(F.col("p"), 6) >= 0,
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"),
    ).otherwise(F.lit(0).cast("long"))
    return proj.groupBy(id_col).agg(F.sum(bit_val).cast("bigint").alias("lsh_sig"))


def lsh_bucket_topk(
    corpus: DataFrame,
    query_pred,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    k: int = 5,
) -> DataFrame:
    """LSH-bucketed approximate top-k: signatures become the cluster
    assignment and the search reduces to the IVF equi-join plan — only
    same-bucket candidates are scored. ``query_pred`` selects the query
    rows out of the corpus (signatures are computed once; the attach
    join duplicates the signature subtree in the static plan, but the
    exchanges are canonically identical and AQE's ReuseExchange executes
    them once)."""
    base = corpus.select(F.col(id_col), F.col(vec_col))
    sigs = lsh_signatures(base, id_col, vec_col, n_bits)
    # merge hint: sigs has one row per CORPUS vector but its through-agg
    # size estimate is frozen tiny, so the static planner would
    # auto-broadcast a corpus-sized relation (the r6 derived-side class)
    with_sig = base.join(sigs.hint("merge"), id_col)
    return ivf_topk(
        with_sig,
        with_sig.where(query_pred),
        id_col=id_col,
        vec_col=vec_col,
        cluster_col="lsh_sig",
        k=k,
    )
