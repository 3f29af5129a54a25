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
