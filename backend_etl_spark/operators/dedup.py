"""Deduplication operators for large-scale text corpora.

Exact dedup, MinHash+LSH near-dup, SimHash, and n-gram Jaccard — the
training-data-pipeline operators layered on top of the reference's
natural-key dedup idea (``ON CONFLICT DO NOTHING``,
utils/db_helpers.py:92-301), generalized from key-equality to
content-similarity.

Scale design:
- Everything is expressed as explode → hash → groupBy/join: linear
  shuffles on bounded-width keys; no crossJoin anywhere.
- Hashes are md5-derived so they are deterministic, engine-portable
  (DuckDB computes the identical values for the oracle), and uniformly
  distributed — no skew on the shuffle keys beyond natural content skew.
- LSH banding turns the O(n²) candidate-pair problem into a self-join on
  (band_id, band_value) buckets; at 100 TB the bucket join is the only
  quadratic term and is bounded by bucket size (tune bands/rows per
  band for the recall/cost point you need).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_etl_spark.functions.scalars import normalize_text, tokens

DEFAULT_NUM_HASHES = 4
DEFAULT_SHINGLE = 3


def content_key(col) -> F.Column:
    """md5 of normalized text — the exact-dedup key."""
    return F.md5(normalize_text(col))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact near-identical dedup: one representative (min id) per
    normalized-content hash, with the duplicate count.

    Equivalent to the reference's insert-if-absent on a natural key, but
    content-addressed. Single hash-aggregate — one shuffle on the md5
    key, map-side partial aggregation applies.
    """
    return (
        df.select(F.col(id_col), content_key(F.col(text_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def shingles(text_col, n: int = DEFAULT_SHINGLE) -> F.Column:
    """n-token shingles of a text column -> ARRAY<STRING> (empty if < n tokens).

    Pure Column expression: sequence + transform + slice, no UDF.
    """
    toks = tokens(text_col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = DEFAULT_SHINGLE) -> DataFrame:
    """Distinct (id, shingle) pairs — the exploded shingle relation."""
    return (
        df.select(F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Per-doc MinHash signature: for hash i, min over shingles of
    md5('<i>#' || shingle). One explode + one groupBy — linear, one shuffle.

    md5-as-hash-family keeps the signature portable across engines (the
    DuckDB oracle reproduces it exactly) and deterministic across runs.
    """
    sh = doc_shingles(df, id_col, text_col, n)
    aggs = [
        F.min(F.md5(F.concat_ws("#", F.lit(str(i)), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, id_col: str, num_hashes: int = DEFAULT_NUM_HASHES) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 MinHash band (1 row per band).

    Melt signatures to (band_id, band_value), self-join on the band
    bucket. The join key (band_id, band_value) is high-cardinality and
    uniform (md5), so the shuffle is balanced; bucket sizes bound the
    pair fan-out.
    """
    melt_expr = ", ".join(f"'{i}', mh{i}" for i in range(num_hashes))
    bands = signatures.select(
        F.col(id_col),
        F.expr(f"stack({num_hashes}, {melt_expr}) as (band_id, band_value)"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_value") == F.col("b.band_value"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_bands"))
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    candidates: DataFrame | None = None,
    n: int = DEFAULT_SHINGLE,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    |A∩B| via a three-way join (pair → a-shingles → b-shingles on equal
    shingle); |A∪B| = |A|+|B|−|A∩B| from per-doc shingle counts. Only
    candidate pairs (LSH-bucketed) ever materialize — never all pairs.
    """
    if candidates is None:
        sigs = minhash_signatures(df, id_col, text_col, num_hashes, n)
        candidates = lsh_candidate_pairs(sigs, id_col, num_hashes)
    sh = doc_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    sh_a = sh.select(F.col(id_col).alias("doc_a"), F.col("shingle"))
    sh_b = sh.select(F.col(id_col).alias("doc_b"), F.col("shingle"))
    inter = (
        candidates.select("doc_a", "doc_b")
        .join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    size_a = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    size_b = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(size_a, "doc_a")
        .join(size_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4
            ).alias("jaccard"),
        )
    )


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash per doc from distinct tokens.

    bit_j(token) = parity of the first hex char of md5(token || '#' || j);
    simhash bit j = majority vote over tokens. Explode tokens × 16 bit
    positions → two groupBys. Engine-portable (md5-based) and UDF-free.
    """
    tok = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .distinct()
    )
    bits = tok.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit_pos"),
        F.col("tok"),
    ).select(
        F.col(id_col),
        "bit_pos",
        (
            (F.ascii(F.substring(F.md5(F.concat_ws("#", F.col("tok"), F.col("bit_pos"))), 1, 1)) % 2)
            * 2
            - 1
        ).alias("contrib"),
    )
    votes = bits.groupBy(id_col, "bit_pos").agg(F.sum("contrib").alias("v"))
    bit_weight = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit_pos AS INT))")
    return votes.groupBy(id_col).agg(
        F.sum(F.when(F.col("v") >= 0, bit_weight).otherwise(F.lit(0).cast("long")))
        .cast("long")
        .alias("simhash16")
    )
