"""HTML page → review records: the reference's scrape-extraction as a
distributed flatMap (SURVEY §2 D4 / S8 / S9).

The reference fetches review pages and walks them with BeautifulSoup —
one HTML page in, N review rows out
(reference: scrapers/trustpilot_scraper.py:49-91 card extraction,
scrapers/feefo_scraper.py:36-71 feedback-container extraction). Here the
same extraction runs inside ``mapInPandas``: pages arrive as rows of an
HTML string column, each Arrow batch fans out to review records on the
executors, and no shuffle is involved — the operator scales linearly
with page count and parallelizes per partition.

The DOM walk uses only the stdlib ``html.parser`` (bs4 is not in the
container): a minimal node tree with BeautifulSoup-compatible matching
for the two selector shapes the reference uses —
``find_all(tag, {"class": "a b"})`` (token-subset match) and
``find_all(tag, {"data-aqa-id": "x"})`` (exact attribute match).

Parsing discipline (Spark-first): the extractor emits raw strings
(rating alt-text, date text); typing happens downstream with the
existing Column parsers (``rating_from_alt`` F8, ``parse_long_date`` F1,
``parse_purchase_date`` F2) so the hot path stays declarative and the
Python stage does only what Catalyst cannot — walk malformed HTML.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

# elements that never take an end tag (HTML5 void elements)
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Node | str] = []

    # -- BeautifulSoup-compatible surface (the subset the reference uses) --

    def get_text(self, strip: bool = False) -> str:
        parts: list[str] = []
        self._collect_text(parts)
        if strip:
            return "".join(p.strip() for p in parts if p.strip())
        return "".join(parts)

    def _collect_text(self, parts: list[str]) -> None:
        for ch in self.children:
            if isinstance(ch, str):
                parts.append(ch)
            else:
                ch._collect_text(parts)

    def has_attr(self, name: str) -> bool:
        return name in self.attrs

    def __getitem__(self, name: str) -> str:
        return self.attrs[name]

    def _matches(self, tag: str, attrs: dict[str, str] | None) -> bool:
        if self.tag != tag:
            return False
        for k, v in (attrs or {}).items():
            mine = self.attrs.get(k)
            if mine is None:
                return False
            if k == "class":
                # bs4 class semantics: every requested token present
                if not set(v.split()) <= set(mine.split()):
                    return False
            elif mine != v:
                return False
        return True

    def find_all(self, tag: str, attrs: dict[str, str] | None = None) -> list["_Node"]:
        out: list[_Node] = []
        for ch in self.children:
            if isinstance(ch, _Node):
                if ch._matches(tag, attrs):
                    out.append(ch)
                out += ch.find_all(tag, attrs)
        return out

    def find(self, tag: str, attrs: dict[str, str] | None = None) -> "_Node | None":
        hits = self.find_all(tag, attrs)
        return hits[0] if hits else None


class _TreeBuilder(HTMLParser):
    """Parse HTML into a _Node tree, tolerating the real-world mess the
    reference's pages have: unclosed tags, stray end tags, void elements
    without slashes. convert_charrefs decodes entities into text."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]", {})
        self._stack = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        node = _Node(tag, {k: (v or "") for k, v in attrs})
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._stack[-1].children.append(_Node(tag, {k: (v or "") for k, v in attrs}))

    def handle_endtag(self, tag: str) -> None:
        # close the nearest matching open tag; ignore strays
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self._stack[-1].children.append(data)


def parse_html(html: str) -> _Node:
    builder = _TreeBuilder()
    builder.feed(html or "")
    return builder.root


# ---------------------------------------------------------------------------
# per-page extractors (pure functions: html -> list of records)
# ---------------------------------------------------------------------------


def extract_trustpilot(html: str) -> list[dict]:
    """Review cards from a Trustpilot-shaped page
    (trustpilot_scraper.py:49-91: cardWrapper+show cards; consumer
    name span, star-rating img alt, h2 title, body-l paragraph,
    body-m date span). Emits raw strings; typing is downstream."""
    soup = parse_html(html)
    out = []
    for card in soup.find_all(
        "div", {"class": "styles_cardWrapper__g8amG styles_show__Z8n7u"}
    ):
        rec = {
            "author_name": None,
            "rating_alt": None,
            "review_title": None,
            "review_body": None,
            "review_date_raw": None,
        }
        name_el = card.find("div", {"class": "styles_consumerDetailsWrapper__4eZod"})
        if name_el:
            sp = name_el.find("span", {"class": "typography_heading-xs__osRhC"})
            if sp:
                rec["author_name"] = sp.get_text(strip=True)
        rating_el = card.find("div", {"class": "star-rating_starRating__sdbkn"})
        if rating_el:
            img = rating_el.find("img")
            if img and img.has_attr("alt"):
                rec["rating_alt"] = img["alt"]
        title = card.find("h2", {"class": "typography_heading-xs__osRhC"})
        if title:
            rec["review_title"] = title.get_text(strip=True)
        body = card.find("p", {"class": "typography_body-l__v5JLj"})
        if body:
            rec["review_body"] = body.get_text(strip=True)
        date_p = card.find("p", {"class": "typography_body-m__k2UI7"})
        if date_p:
            sp = date_p.find("span", {"class": "typography_body-m__k2UI7"})
            if sp:
                rec["review_date_raw"] = sp.get_text(strip=True)
        out.append(rec)
    return out


TRUSTPILOT_REVIEW_FIELDS = (
    "author_name STRING, rating_alt STRING, review_title STRING, "
    "review_body STRING, review_date_raw STRING"
)


def extract_feefo(html: str) -> list[dict]:
    """Feedback blocks from a Feefo-shaped page
    (feefo_scraper.py:36-71: data-aqa-id selectors; the product review
    lives under its own wrapper, service review at block level)."""
    soup = parse_html(html)
    out = []
    for block in soup.find_all("div", {"data-aqa-id": "feedback-container"}):
        rec = {
            "customer_name": None,
            "review_date_raw": None,
            "service_review": None,
            "product_review": None,
            "customer_location": None,
        }
        el = block.find("div", {"data-aqa-id": "customer-name"})
        rec["customer_name"] = el.get_text(strip=True) if el else None
        el = block.find("div", {"data-aqa-id": "customer-purchased-date"})
        rec["review_date_raw"] = el.get_text(strip=True) if el else None
        wrapper = block.find("div", {"data-aqa-id": "feedback-product-container"})
        if wrapper:
            el = wrapper.find("div", {"data-aqa-id": "customer-comment-container"})
            rec["product_review"] = el.get_text(strip=True) if el else None
        # service review: the block-level comment container that is NOT
        # inside the product wrapper (reference walks block first)
        product_comments = set()
        if wrapper:
            product_comments = {
                id(n)
                for n in wrapper.find_all(
                    "div", {"data-aqa-id": "customer-comment-container"}
                )
            }
        for el in block.find_all("div", {"data-aqa-id": "customer-comment-container"}):
            if id(el) not in product_comments:
                rec["service_review"] = el.get_text(strip=True)
                break
        el = block.find("div", {"data-aqa-id": "customer-location"})
        rec["customer_location"] = el.get_text(strip=True) if el else None
        out.append(rec)
    return out


FEEFO_REVIEW_FIELDS = (
    "customer_name STRING, review_date_raw STRING, service_review STRING, "
    "product_review STRING, customer_location STRING"
)


# ---------------------------------------------------------------------------
# the distributed operator: pages DataFrame -> reviews DataFrame
# ---------------------------------------------------------------------------


def extract_reviews(
    pages: DataFrame,
    extractor: Callable[[str], list[dict]],
    review_fields_ddl: str,
    html_col: str = "html",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """FlatMap HTML pages into review records with ``mapInPandas``:
    1 page row in, N review rows out, Arrow-batched, shuffle-free.

    ``carry_cols`` are page-level columns stamped onto every extracted
    record (the reference passes company_name/company_web into each
    insert) — kept by name so the page identity survives the fan-out.
    """
    carry_ddl = ", ".join(
        f"{c} {pages.schema[c].dataType.simpleString()}" for c in carry_cols
    )
    out_ddl = f"{carry_ddl}, {review_fields_ddl}" if carry_ddl else review_fields_ddl
    field_names = [f.split()[0] for f in review_fields_ddl.split(", ")]

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, page in pdf.iterrows():
                carried = {c: page[c] for c in carry_cols}
                for rec in extractor(page[html_col]):
                    rows.append({**carried, **rec})
            yield pd.DataFrame(
                rows, columns=[*carry_cols, *field_names], dtype=object
            )

    return pages.mapInPandas(gen, schema=out_ddl)
