"""Nested-data operator catalog (SURVEY §2.4 N1-N6, §2.8 U2-U3): array
aggregation, struct construction, element access, filtered first-match,
and the unified-mentions unionByName — the reference's dict-walking
flattening re-expressed as first-class ARRAY/STRUCT column operators.

The reference only ever *consumes* nested JSON (Apify/Reddit payloads);
here the nested values are built from the flat tables (collect_list of
structs, deterministic ordering) and then torn down again with the same
operators the ingest path uses — exercising both directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_etl_spark.catalog.registry import register
from backend_etl_spark.operators import similarity
from backend_etl_spark.session import tune
from backend_etl_spark.sources.loader import load_table


@register(
    "array_agg_event_types",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types_csv,
           CAST(len(list_distinct(list(event_type))) AS BIGINT)             AS n_types,
           CAST(list_contains(list(event_type), 'purchase') AS INT)         AS has_purchase
    FROM events GROUP BY user_id
    """,
)
def array_agg_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-user distinct event-type set (sorted for
    determinism), membership test (array_contains, the N3/N4 filtered-
    match primitive)."""
    tune(spark)
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types_csv"),
            F.size(F.collect_set("event_type")).cast("bigint").alias("n_types"),
            F.array_contains(F.collect_list("event_type"), "purchase")
            .cast("int")
            .alias("has_purchase"),
        )
    )


@register(
    "nested_struct_first_match",
    oracle="""
    WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value FROM events),
    arrs AS (
      SELECT user_id,
             list(struct_pack(ts := ts, event_id := event_id, value := value)
                  ORDER BY ts, event_id) AS arr
      FROM ev GROUP BY user_id)
    SELECT user_id,
           arr[1].ts                                          AS first_ts,
           arr[1].event_id                                     AS first_event_id,
           arr[2].event_id                                     AS second_event_id,
           list_filter(arr, x -> x.value > 190.0)[1].event_id  AS first_high_event_id
    FROM arrs
    """,
)
def nested_struct_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build ARRAY<STRUCT> per user (deterministically ordered), then the
    N2/N3/N5 access patterns: first element, nth element, filtered
    first-match — NULL-safe out-of-bounds (try_element_at), exactly the
    `(media or [{}])[0]` / first-video-variant idiom of the reference
    (twitter_scraper.py:84,89-94)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    arrs = ev.groupBy("user_id").agg(arr.alias("arr"))
    first = F.try_element_at("arr", F.lit(1))
    second = F.try_element_at("arr", F.lit(2))
    high = F.try_element_at(F.filter("arr", lambda x: x["value"] > 190.0), F.lit(1))
    return arrs.select(
        "user_id",
        first.getField("ts").alias("first_ts"),
        first.getField("event_id").alias("first_event_id"),
        second.getField("event_id").alias("second_event_id"),
        high.getField("event_id").alias("first_high_event_id"),
    )


@register(
    "explode_tokens_top20",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS token
      FROM documents)
    SELECT token, count(*) AS n
    FROM tok GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def explode_tokens_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (N1) + aggregate + deterministic top-k: corpus-wide token
    frequencies — the flatten-then-count shape of the reference's
    nested-array unwrapping at analytical scale."""
    tune(spark)
    from backend_etl_spark.functions.scalars import tokens

    return (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "union_by_name_mentions",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
                FROM events)
    SELECT event_id AS mention_id, 'purchase' AS platform, user_id AS tenant_id,
           value AS amount, CAST(NULL AS TIMESTAMP) AS clicked_at
    FROM ev WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, 'click', user_id, CAST(NULL AS DOUBLE), ts
    FROM ev WHERE event_type = 'click'
    """,
)
def union_by_name_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unified-mentions view (U3): heterogeneous per-platform
    schemas conformed via unionByName(allowMissingColumns=True) with a
    platform discriminator — the Spark idiom replacing the reference's
    8-way table split."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("mention_id"),
        F.lit("purchase").alias("platform"),
        F.col("user_id").alias("tenant_id"),
        F.col("value").alias("amount"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("mention_id"),
        F.lit("click").alias("platform"),
        F.col("user_id").alias("tenant_id"),
        F.col("ts").alias("clicked_at"),
    )
    return purchases.unionByName(clicks, allowMissingColumns=True)


@register(
    "dedup_embedding_cosine_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    p AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_dot_product(a.v, b.v) /
                   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
               AS cosine_sim
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, cosine_sim FROM p WHERE cosine_sim >= 0.4
    """,
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection, cluster-bucketed: pairs are
    generated only within the label bucket (never an all-pairs
    crossJoin), kept when rounded cosine ≥ 0.4. The per-bucket pair
    matrix runs as ONE applyInPandas pass with exact-fold numpy
    numerics (operators/dedup.intra_bucket_cosine_pairs) — a self-join
    evaluating the cosine fold interpreted per pair is quadratic
    wall-clock once fixed-cardinality buckets grow with the corpus."""
    tune(spark)
    from backend_etl_spark.operators import dedup

    par = spark.sparkContext.defaultParallelism
    emb = load_table(spark, sf_dir, "embeddings").repartition(par)
    e = emb.select("vec_id", "label", similarity.to_double("embedding").alias("v"))
    return dedup.intra_bucket_cosine_pairs(e, threshold=0.4)


@register(
    "map_ops_event_attrs",
    oracle="""
    WITH kv AS (
      SELECT 'type' AS attr, event_type AS val FROM events
      UNION ALL
      SELECT 'bucket', CAST(user_id % 5 AS VARCHAR) FROM events
    )
    SELECT attr, val, count(*) AS n
    FROM kv GROUP BY attr, val
    """,
)
def map_ops_event_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed attribute column built in-plan (create_map), exploded to
    (key, value) rows and aggregated — the MapType surface (the engine's
    answer to the reference's transient dict payloads when keys are
    dynamic rather than a fixed struct)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("bucket"), (F.col("user_id") % 5).cast("string"),
    )
    return (
        ev.select(F.explode(m).alias("attr", "val"))
        .groupBy("attr", "val")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "array_setops_token_halves",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')[1:CAST(floor(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) / 2) AS INT)]) AS first_half,
             list_distinct(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')[CAST(floor(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) / 2) AS INT) + 1:]) AS second_half
      FROM documents)
    SELECT doc_id,
           CAST(len(first_half) AS BIGINT)  AS n_first,
           CAST(len(second_half) AS BIGINT) AS n_second,
           CAST(len(list_intersect(first_half, second_half)) AS BIGINT) AS n_inter,
           CAST(len(list_distinct(list_concat(first_half, second_half))) AS BIGINT)
                                            AS n_union,
           round(len(list_intersect(first_half, second_half)) * 1.0
                 / len(list_distinct(list_concat(first_half, second_half))), 6)
                                            AS halves_jaccard
    FROM t
    """,
)
def array_setops_token_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations (intersect / union / distinct) — vocabulary
    overlap between each document's halves, a self-repetition signal for
    quality filtering. All Catalyst array functions, no explode."""
    tune(spark)
    from backend_etl_spark.functions.scalars import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    half = F.floor(F.size(toks) / 2).cast("int")
    first = F.array_distinct(F.slice(toks, 1, half))
    second = F.array_distinct(F.slice(toks, half + 1, F.size(toks) - half))
    inter = F.array_intersect(first, second)
    uni = F.array_distinct(F.concat(first, second))
    return docs.select(
        "doc_id",
        F.size(first).cast("bigint").alias("n_first"),
        F.size(second).cast("bigint").alias("n_second"),
        F.size(inter).cast("bigint").alias("n_inter"),
        F.size(uni).cast("bigint").alias("n_union"),
        F.round(F.size(inter) / F.size(uni), 6).alias("halves_jaccard"),
    )
