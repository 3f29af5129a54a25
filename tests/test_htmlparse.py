"""HTML-parse ingest operator (D4/S8/S9): mini-DOM semantics, the two
extractors on literal fixture pages (including malformed markup and
decoys), and the mapInPandas flatMap shape."""

from backend_etl_spark.operators.htmlparse import (
    FEEFO_REVIEW_FIELDS,
    TRUSTPILOT_REVIEW_FIELDS,
    extract_feefo,
    extract_reviews,
    extract_trustpilot,
    parse_html,
)

TP_CARD = """
<div class="styles_cardWrapper__g8amG styles_show__Z8n7u">
  <div class="styles_consumerDetailsWrapper__4eZod">
    <span class="typography_heading-xs__osRhC">Alice</span>
  </div>
  <div class="star-rating_starRating__sdbkn">
    <img alt="Rated 4 out of 5 stars">
  </div>
  <h2 class="typography_heading-xs__osRhC">Great product</h2>
  <p class="typography_body-l__v5JLj">It works &amp; ships fast.</p>
  <p class="typography_body-m__k2UI7">Experienced
    <span class="typography_body-m__k2UI7">23 January 2025</span>
  </p>
</div>
"""


def test_find_all_class_token_subset():
    root = parse_html(
        '<div class="a b c">x</div><div class="a">y</div><div class="b a">z</div>'
    )
    assert [n.get_text() for n in root.find_all("div", {"class": "a b"})] == ["x", "z"]
    assert len(root.find_all("div", {"class": "a"})) == 3


def test_trustpilot_full_card():
    recs = extract_trustpilot(f"<html><body>{TP_CARD}</body></html>")
    assert len(recs) == 1
    r = recs[0]
    assert r["author_name"] == "Alice"
    assert r["rating_alt"] == "Rated 4 out of 5 stars"
    assert r["review_title"] == "Great product"
    assert r["review_body"] == "It works & ships fast."  # entity decoded
    assert r["review_date_raw"] == "23 January 2025"


def test_trustpilot_decoy_and_missing_fields():
    html = """
    <div class="styles_cardWrapper__g8amG"><p class="typography_body-l__v5JLj">decoy</p></div>
    <div class="styles_cardWrapper__g8amG styles_show__Z8n7u">
      <p class="typography_body-l__v5JLj">body only</p>
    </div>
    """
    recs = extract_trustpilot(html)
    assert len(recs) == 1  # single-token decoy skipped (bs4 class semantics)
    assert recs[0]["review_body"] == "body only"
    assert recs[0]["author_name"] is None
    assert recs[0]["rating_alt"] is None
    assert recs[0]["review_date_raw"] is None


def test_trustpilot_malformed_markup_tolerated():
    # unclosed <p>, stray </span>, uppercase tag, void img without slash
    html = (
        '<DIV class="styles_cardWrapper__g8amG styles_show__Z8n7u">'
        "</span>"
        '<div class="star-rating_starRating__sdbkn"><img alt="Rated 2 out of 5 stars"></div>'
        '<p class="typography_body-l__v5JLj">no closing tag'
        "</div>"
    )
    recs = extract_trustpilot(html)
    assert len(recs) == 1
    assert recs[0]["rating_alt"] == "Rated 2 out of 5 stars"
    assert recs[0]["review_body"] == "no closing tag"


def test_trustpilot_empty_page():
    assert extract_trustpilot("<html><body><p>no reviews</p></body></html>") == []
    assert extract_trustpilot("") == []


def test_feefo_product_vs_service_comment():
    html = """
    <div data-aqa-id="feedback-container">
      <div data-aqa-id="customer-name">Bob</div>
      <div data-aqa-id="customer-purchased-date">Date of purchase: 05/03/2025</div>
      <div data-aqa-id="customer-comment-container">service was fine</div>
      <div data-aqa-id="feedback-product-container">
        <div data-aqa-id="customer-comment-container">product broke</div>
      </div>
      <div data-aqa-id="customer-location">Leeds</div>
    </div>
    <div data-aqa-id="feedback-container">
      <div data-aqa-id="customer-comment-container">only service</div>
    </div>
    """
    recs = extract_feefo(html)
    assert len(recs) == 2
    assert recs[0]["customer_name"] == "Bob"
    assert recs[0]["review_date_raw"] == "Date of purchase: 05/03/2025"
    assert recs[0]["service_review"] == "service was fine"
    assert recs[0]["product_review"] == "product broke"
    assert recs[0]["customer_location"] == "Leeds"
    assert recs[1]["service_review"] == "only service"
    assert recs[1]["product_review"] is None
    assert recs[1]["customer_name"] is None


def test_extract_reviews_flatmap_with_carry(spark):
    pages = spark.createDataFrame(
        [
            ("Acme", f"<html>{TP_CARD}{TP_CARD}</html>"),
            ("Globex", "<html><p>empty</p></html>"),
            ("Initech", TP_CARD),
        ],
        "company_name STRING, html STRING",
    )
    out = extract_reviews(
        pages, extract_trustpilot, TRUSTPILOT_REVIEW_FIELDS,
        carry_cols=("company_name",),
    )
    rows = out.collect()
    assert len(rows) == 3  # 2 + 0 + 1: page → N records flatMap
    by_company = {}
    for r in rows:
        by_company.setdefault(r["company_name"], []).append(r)
    assert len(by_company["Acme"]) == 2
    assert "Globex" not in by_company
    assert by_company["Initech"][0]["author_name"] == "Alice"


def test_extract_reviews_feefo_schema(spark):
    pages = spark.createDataFrame(
        [("s1", '<div data-aqa-id="feedback-container">'
                '<div data-aqa-id="customer-name">Zoe</div></div>')],
        "slug STRING, html STRING",
    )
    out = extract_reviews(
        pages, extract_feefo, FEEFO_REVIEW_FIELDS, carry_cols=("slug",)
    )
    assert out.columns == [
        "slug", "customer_name", "review_date_raw", "service_review",
        "product_review", "customer_location",
    ]
    r = out.collect()[0]
    assert r["customer_name"] == "Zoe" and r["slug"] == "s1"
