"""Search-query templating (SURVEY §2.5 F11).

The reference embeds its time window and target handle in a provider
query string rather than structured parameters:

- Twitter/Apify (scrapers/twitter_scraper.py:27, 57-59):
  ``@{user} OR #{user} since:{since} until:{until}`` with timestamps
  formatted ``%Y-%m-%d_%H:%M:%S_UTC``.
- Reddit (scrapers/reddit_scraper.py:66): two queries per tenant —
  ``url:{domain}`` (posts linking the domain) and ``{domain}`` (posts
  mentioning it).

Here the template is materialized both ways: ``twitter_search_query``
renders it (what a remote connector would POST), and
``parse_search_query`` recovers the structured window from the string so
the connector can push since/until down to the page scan — the engine
treats the query string as a serialization of pushdown predicates, not
as an opaque blob.
"""

from __future__ import annotations

import datetime as dt
import re

#: the reference's Apify timestamp format (twitter_scraper.py:57-59)
APIFY_TS_FMT = "%Y-%m-%d_%H:%M:%S_UTC"


def _fmt(t: dt.datetime) -> str:
    return t.strftime(APIFY_TS_FMT)


def _parse_ts(s: str) -> dt.datetime:
    return dt.datetime.strptime(s, APIFY_TS_FMT)


def twitter_search_query(
    username: str, since: dt.datetime, until: dt.datetime
) -> str:
    """Render the mention-or-hashtag window query exactly as the
    reference builds it (twitter_scraper.py:27)."""
    return f"@{username} OR #{username} since:{_fmt(since)} until:{_fmt(until)}"


_QUERY_RE = re.compile(
    r"^@(?P<mention>\S+) OR #(?P<hashtag>\S+)"
    r" since:(?P<since>\S+) until:(?P<until>\S+)$"
)


def parse_search_query(query: str) -> dict:
    """Invert ``twitter_search_query``: recover the handle and the
    [since, until) window as datetimes. Raises ValueError on a string
    that doesn't match the template (fail loud, not silent full scan)."""
    m = _QUERY_RE.match(query.strip())
    if not m:
        raise ValueError(f"unrecognized search query template: {query!r}")
    if m["mention"] != m["hashtag"]:
        raise ValueError(f"mention/hashtag mismatch in query: {query!r}")
    return {
        "username": m["mention"],
        "since": _parse_ts(m["since"]),
        "until": _parse_ts(m["until"]),
    }


def reddit_queries(domain: str) -> list[str]:
    """The reference's two-query Reddit fan-out per tenant
    (reddit_scraper.py:66): link-to-domain and mention-of-domain."""
    return [f"url:{domain}", domain]
