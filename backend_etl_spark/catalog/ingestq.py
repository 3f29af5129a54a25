"""Ingest-surface catalog entries: HTML-parse extraction (D4/S8/S9) and
multi-shape feed unions.

The HTML entries prove the full scrape path end-to-end WITHOUT leaving
the engine: each query renders deterministic review pages from the
``documents`` table with pure Column expressions (the fixture), fans
them out through the ``mapInPandas`` HTML extractor (the operator under
test), re-types the raw strings with the F1/F2/F8 Column parsers, and
must reproduce exactly the relation the DuckDB oracle builds directly
from ``documents`` — a round-trip proof that extraction loses nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_etl_spark.catalog.registry import register
from backend_etl_spark.functions.scalars import (
    parse_long_date,
    parse_purchase_date,
    rating_from_alt,
)
from backend_etl_spark.operators.htmlparse import (
    FEEFO_REVIEW_FIELDS,
    TRUSTPILOT_REVIEW_FIELDS,
    extract_feefo,
    extract_reviews,
    extract_trustpilot,
)
from backend_etl_spark.ingest import projections as P
from backend_etl_spark.operators.partitioning import spread
from backend_etl_spark.session import tune
from backend_etl_spark.sources.loader import load_table

_PAGE_MOD = 25  # ~20 reviews per rendered page at sf0.01


def _docid_date() -> F.Column:
    """Deterministic per-doc review date: 2024-01-01 + (doc_id % 365)."""
    return F.date_add(
        F.to_date(F.lit("2024-01-01")), (F.col("doc_id") % 365).cast("int")
    )


def _s(col) -> F.Column:
    return col.cast("string")


def _trustpilot_pages(docs: DataFrame) -> DataFrame:
    """Render Trustpilot-shaped pages (trustpilot_scraper.py:49-91 card
    markup) from documents. Includes a decoy card per page carrying only
    ONE of the two required class tokens — the extractor must skip it."""
    doc_id = F.col("doc_id")
    card = F.concat(
        F.lit(
            '<div class="styles_cardWrapper__g8amG styles_show__Z8n7u">'
            '<div class="styles_consumerDetailsWrapper__4eZod">'
            '<span class="typography_heading-xs__osRhC">user_'
        ),
        _s(doc_id),
        F.lit(
            '</span></div><div class="star-rating_starRating__sdbkn">'
            '<img alt="Rated '
        ),
        _s(doc_id % 5 + 1),
        F.lit(
            ' out of 5 stars"></div>'
            '<h2 class="typography_heading-xs__osRhC">Review '
        ),
        _s(doc_id),
        F.lit('</h2><p class="typography_body-l__v5JLj">'),
        F.col("text"),
        F.lit(
            '</p><p class="typography_body-m__k2UI7">Experienced '
            '<span class="typography_body-m__k2UI7">'
        ),
        F.date_format(_docid_date(), "d MMMM yyyy"),
        F.lit("</span></p></div>"),
    )
    pages = (
        docs.select((doc_id % _PAGE_MOD).alias("page_id"), card.alias("card"))
        .groupBy("page_id")
        .agg(F.concat_ws("", F.collect_list("card")).alias("cards"))
    )
    return pages.select(
        "page_id",
        F.concat(F.lit("co_"), _s(F.col("page_id") % 3)).alias("company_name"),
        F.concat(F.lit("co_"), _s(F.col("page_id") % 3), F.lit(".example.com")).alias(
            "company_web"
        ),
        F.concat(
            F.lit(
                '<html><body><nav class="nav_bar__x1">menu</nav>'
                '<div class="styles_cardWrapper__g8amG">'
                '<p class="typography_body-l__v5JLj">hidden decoy card</p></div>'
            ),
            F.col("cards"),
            F.lit("</body></html>"),
        ).alias("html"),
    )


@register(
    "html_parse_trustpilot",
    oracle="""
    SELECT 'co_' || CAST((doc_id % 25) % 3 AS VARCHAR)                    AS company_name,
           'co_' || CAST((doc_id % 25) % 3 AS VARCHAR) || '.example.com'  AS company_web,
           'user_' || CAST(doc_id AS VARCHAR)                             AS author_name,
           CAST(doc_id % 5 + 1 AS INT)                                    AS rating,
           'Review ' || CAST(doc_id AS VARCHAR)                           AS review_title,
           text                                                           AS review_body,
           DATE '2024-01-01' + CAST(doc_id % 365 AS INT)                  AS review_date
    FROM documents
    """,
)
def html_parse_trustpilot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw HTML pages → review records (D4/S8): render pages from
    documents, extract with the mapInPandas DOM walker, re-type with the
    F8 rating and F1 date Column parsers. Oracle = the same relation
    built directly — extraction must be lossless."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    pages = spread(_trustpilot_pages(docs), "page_id")
    reviews = extract_reviews(
        pages,
        extract_trustpilot,
        TRUSTPILOT_REVIEW_FIELDS,
        carry_cols=("company_name", "company_web"),
    )
    return reviews.select(
        "company_name",
        "company_web",
        "author_name",
        rating_from_alt("rating_alt").alias("rating"),
        "review_title",
        "review_body",
        parse_long_date("review_date_raw").alias("review_date"),
    )


def _feefo_pages(docs: DataFrame) -> DataFrame:
    """Render Feefo-shaped pages (feefo_scraper.py:36-71 data-aqa-id
    markup). Every third doc gets a product-review wrapper — the
    extractor must keep product and service comments apart."""
    doc_id = F.col("doc_id")
    card = F.concat(
        F.lit(
            '<div data-aqa-id="feedback-container">'
            '<div data-aqa-id="customer-name">cust_'
        ),
        _s(doc_id),
        F.lit('</div><div data-aqa-id="customer-purchased-date">Date of purchase: '),
        F.date_format(_docid_date(), "dd/MM/yyyy"),
        F.lit('</div><div data-aqa-id="customer-comment-container">'),
        F.col("text"),
        F.lit("</div>"),
        F.when(
            doc_id % 3 == 0,
            F.concat(
                F.lit(
                    '<div data-aqa-id="feedback-product-container">'
                    '<div data-aqa-id="customer-comment-container">Product ok '
                ),
                _s(doc_id),
                F.lit("</div></div>"),
            ),
        ).otherwise(F.lit("")),
        F.lit('<div data-aqa-id="customer-location">City '),
        _s(doc_id % 50),
        F.lit("</div></div>"),
    )
    pages = (
        docs.select((doc_id % _PAGE_MOD).alias("page_id"), card.alias("card"))
        .groupBy("page_id")
        .agg(F.concat_ws("", F.collect_list("card")).alias("cards"))
    )
    return pages.select(
        "page_id",
        F.concat(F.lit("Acme "), _s(F.col("page_id") % 3)).alias("company_name"),
        F.concat(F.lit("slug-"), _s(F.col("page_id") % 3)).alias("feefo_slug"),
        F.concat(
            F.lit("<html><body><div data-aqa-id=\"page-header\">reviews</div>"),
            F.col("cards"),
            F.lit("</body></html>"),
        ).alias("html"),
    )


@register(
    "html_parse_feefo",
    oracle="""
    SELECT 'Acme ' || CAST((doc_id % 25) % 3 AS VARCHAR)        AS company_name,
           'slug-' || CAST((doc_id % 25) % 3 AS VARCHAR)        AS feefo_slug,
           'cust_' || CAST(doc_id AS VARCHAR)                   AS customer_name,
           DATE '2024-01-01' + CAST(doc_id % 365 AS INT)        AS review_date,
           text                                                 AS service_review,
           CASE WHEN doc_id % 3 = 0
                THEN 'Product ok ' || CAST(doc_id AS VARCHAR) END AS product_review,
           'City ' || CAST(doc_id % 50 AS VARCHAR)              AS customer_location
    FROM documents
    """,
)
def html_parse_feefo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw HTML pages → Feefo review records (D4/S9), with the optional
    product-review wrapper and the F2 prefixed-date parse."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    pages = spread(_feefo_pages(docs), "page_id")
    reviews = extract_reviews(
        pages,
        extract_feefo,
        FEEFO_REVIEW_FIELDS,
        carry_cols=("company_name", "feefo_slug"),
    )
    return reviews.select(
        "company_name",
        "feefo_slug",
        "customer_name",
        parse_purchase_date("review_date_raw").alias("review_date"),
        "service_review",
        "product_review",
        "customer_location",
    )


# ---------------------------------------------------------------------------
# S1/S2/S3: three Twitter record shapes → one conformed twitter_mentions
# ---------------------------------------------------------------------------


def _twitter_three_raw(events: DataFrame):
    """Deterministic fixture builder: the events table rendered as the
    three Twitter payload shapes the reference maintains (S1 Apify
    search, S2 Apify author-timeline, S3 snscrape), with overlapping
    tweet_id ranges (event_id % 4 buckets 0,1 / 1,2 / 2,3) so the union
    really exercises conflicting-source dedup, plus per-shape guard
    triggers (S1: NULL createdAt at %19; S2: empty text at %17, NULL id
    at %23; S3: NULL counts at %5/%7)."""
    eid, uid = F.col("event_id"), F.col("user_id")
    sid = eid.cast("string")
    iso = F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss")
    reply = F.when(eid % 7 == 0, F.lit(None)).otherwise(eid % 7).cast("int")

    s1 = events.where((eid % 4).isin(0, 1)).select(
        sid.alias("id"),
        F.concat(F.lit("https://x.com/"), sid).alias("url"),
        F.concat(F.lit("tweet "), sid).alias("text"),
        F.when(
            eid % 19 == 0, F.lit(None)
        ).otherwise(
            F.date_format(F.col("ts"), "EEE MMM dd HH:mm:ss '+0000' yyyy")
        ).alias("createdAt"),
        (eid % 11).cast("int").alias("retweetCount"),
        reply.alias("replyCount"),
        (eid % 13).cast("int").alias("likeCount"),
        (eid % 101).cast("int").alias("viewCount"),
        F.struct(F.concat(F.lit("u"), uid.cast("string")).alias("name")).alias("author"),
        F.lit(None).cast("array<struct<expanded_url:string>>").alias("media"),
        F.lit(None)
        .cast(
            "struct<media:array<struct<type:string,"
            "videoInfo:struct<variants:array<struct<url:string>>>>>>"
        )
        .alias("extendedEntities"),
    )
    s2 = events.where((eid % 4).isin(1, 2)).select(
        F.when(eid % 23 == 0, F.lit(None)).otherwise(sid).alias("id"),
        F.when(eid % 17 == 0, F.lit("")).otherwise(
            F.concat(F.lit("tweet "), sid)
        ).alias("text"),
        iso.alias("createdAt"),
        reply.alias("replyCount"),
        F.concat(F.lit("req_u"), uid.cast("string")).alias("requested_handle"),
    )
    s3 = events.where((eid % 4).isin(2, 3)).select(
        eid.alias("id"),
        F.concat(F.lit("tweet "), sid).alias("content"),
        iso.alias("date"),
        F.struct(F.concat(F.lit("u"), uid.cast("string")).alias("username")).alias("user"),
        reply.alias("replyCount"),
        F.when(eid % 5 == 0, F.lit(None)).otherwise(eid % 13).cast("int").alias("likeCount"),
    )
    return s1, s2, s3


@register(
    "twitter_union_three_shapes",
    oracle="""
    WITH base AS (
      SELECT event_id, user_id,
             date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts2
      FROM events),
    s1 AS (
      SELECT CAST(event_id AS VARCHAR)                       AS tweet_id,
             'apify_search'                                  AS source,
             1                                               AS rnk,
             'https://x.com/' || CAST(event_id AS VARCHAR)   AS twitter_url,
             'tweet ' || CAST(event_id AS VARCHAR)           AS text,
             'u' || CAST(user_id AS VARCHAR)                 AS author_handle,
             ts2                                             AS created_at,
             CAST(CASE WHEN event_id % 7 = 0 THEN 0
                       ELSE event_id % 7 END AS INT)         AS reply_count,
             CAST(event_id % 11 AS INT)                      AS retweet_count,
             CAST(event_id % 13 AS INT)                      AS like_count,
             CAST(event_id % 101 AS INT)                     AS view_count
      FROM base WHERE event_id % 4 IN (0, 1) AND event_id % 19 <> 0),
    s2 AS (
      SELECT CAST(event_id AS VARCHAR), 'apify_author', 2,
             CAST(NULL AS VARCHAR),
             'tweet ' || CAST(event_id AS VARCHAR),
             'req_u' || CAST(user_id AS VARCHAR),
             ts2,
             CAST(CASE WHEN event_id % 7 = 0 THEN 0
                       ELSE event_id % 7 END AS INT),
             CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT)
      FROM base WHERE event_id % 4 IN (1, 2)
        AND event_id % 17 <> 0 AND event_id % 23 <> 0),
    s3 AS (
      SELECT CAST(event_id AS VARCHAR), 'snscrape', 3,
             CAST(NULL AS VARCHAR),
             'tweet ' || CAST(event_id AS VARCHAR),
             'u' || CAST(user_id AS VARCHAR),
             ts2,
             CAST(CASE WHEN event_id % 7 = 0 THEN 0
                       ELSE event_id % 7 END AS INT),
             CAST(NULL AS INT),
             CAST(CASE WHEN event_id % 5 = 0 THEN 0
                       ELSE event_id % 13 END AS INT),
             CAST(NULL AS INT)
      FROM base WHERE event_id % 4 IN (2, 3)),
    u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3),
    d AS (SELECT *, row_number() OVER (PARTITION BY tweet_id ORDER BY rnk) AS rn FROM u)
    SELECT tweet_id, source, 'Acme' AS company_name, twitter_url, text,
           author_handle, created_at, reply_count, retweet_count,
           like_count, view_count
    FROM d WHERE rn = 1
    """,
)
def twitter_union_three_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three Twitter record shapes → one conformed twitter_mentions
    relation with first-writer-wins dedup (S1+S2+S3 → U1).

    The reference runs three scrapers writing the same table with
    ON CONFLICT (tweet_id) DO NOTHING — whichever lands first wins.
    Wall-clock order isn't reproducible, so the engine makes the winner
    deterministic: source-priority row_number over tweet_id (one
    shuffle; at 100 TB this is the same single exchange a groupBy-first
    would cost, and AQE handles any hot tweet_id)."""
    from pyspark.sql.window import Window

    tune(spark)
    events = load_table(spark, sf_dir, "events")
    s1_raw, s2_raw, s3_raw = _twitter_three_raw(events)
    company = F.lit("Acme")
    fetched = F.lit("2025-01-01 00:00:00").cast("timestamp")
    conformed = (
        P.project_twitter(s1_raw, company, fetched)
        .withColumn("source", F.lit("apify_search"))
        .withColumn("rnk", F.lit(1))
        .unionByName(
            P.project_twitter2(s2_raw, company, fetched)
            .withColumn("source", F.lit("apify_author"))
            .withColumn("rnk", F.lit(2))
        )
        .unionByName(
            P.project_twitter3(s3_raw, company, fetched)
            .withColumn("source", F.lit("snscrape"))
            .withColumn("rnk", F.lit(3))
        )
    )
    w = Window.partitionBy("tweet_id").orderBy("rnk")
    return (
        conformed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "tweet_id", "source", "company_name", "twitter_url", "text",
            "author_handle", "created_at", "reply_count", "retweet_count",
            "like_count", "view_count",
        )
    )
