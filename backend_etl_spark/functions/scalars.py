"""Scalar Column helpers — the reference's parsing surface as Catalyst expressions.

Covers SURVEY §2.5 F1–F13: the four timestamp encodings the reference
normalizes at ingest, the two day-precision date formats, the star-rating
alt-text parse, and text normalization. All are pure Column expressions
(JVM-side, whole-stage-codegen'd) — no Python UDFs in this module.

Parity notes (for the DuckDB oracle):
- Spark's CORRECTED time parser rejects day-of-week letters (``EEE``) in
  *parse* patterns, so ctime-style strings are parsed by stripping the
  weekday prefix first — the oracle SQL does the same strip, keeping both
  engines on identical inputs.
- Epoch conversions use ``timestamp_seconds``/``timestamp_millis`` which
  are timezone-agnostic instants; the session runs in UTC (session.py)
  so collected values match DuckDB's ``make_timestamp``/``epoch_ms``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_long_date(col: Column | str) -> Column:
    """'23 January 2025' -> DATE  (reference: utils/date_utils.py:5-13, F1).

    Returns NULL on malformed input, matching the reference's
    try/except → None behavior (Spark 4 is ANSI by default, so the
    non-`try_` parsers would throw).
    """
    return F.try_to_timestamp(col if not isinstance(col, str) else F.col(col),
                              F.lit("d MMMM yyyy")).cast("date")


def parse_purchase_date(col: Column | str) -> Column:
    """"Date of purchase: 05/03/2025" -> DATE  (feefo_scraper.py:51-57, F2)."""
    stripped = F.regexp_replace(col, "^Date of purchase: ", "")
    return F.try_to_timestamp(stripped, F.lit("dd/MM/yyyy")).cast("date")


def parse_ctime_utc(col: Column | str) -> Column:
    """'Mon Nov 13 22:13:20 2023' (ctime, weekday-prefixed) -> TIMESTAMP.

    Reference parses Twitter's ``%a %b %d %H:%M:%S %z %Y`` then converts
    to UTC (twitter_scraper.py:69-70, F3). Spark's CORRECTED parser
    forbids 'E' in parse patterns, so strip the 4-char weekday prefix.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.substring(c, 5, 100)
    return F.coalesce(
        # with RFC-822 offset ('+0000'): parsed as an instant, rendered UTC
        F.try_to_timestamp(stripped, F.lit("MMM dd HH:mm:ss Z yyyy")),
        # without offset (already-UTC strings)
        F.try_to_timestamp(stripped, F.lit("MMM dd HH:mm:ss yyyy")),
    )


def epoch_seconds_ts(col: Column | str) -> Column:
    """epoch seconds -> UTC TIMESTAMP  (reddit_scraper.py:84-88, F4)."""
    return F.timestamp_seconds(col)


def epoch_millis_ts(col: Column | str) -> Column:
    """epoch milliseconds -> UTC TIMESTAMP  (linkedin_scraper.py:74-80, F5)."""
    return F.timestamp_millis(col)


def rating_from_alt(col: Column | str) -> Column:
    """'Rated 4 out of 5 stars' -> 4  (trustpilot_scraper.py:74-79, F8)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ").getItem(1).cast("int")


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace, trim — the canonical text key used
    by exact/near dedup (the reference's planned preprocessors/clean.py)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization -> ARRAY<STRING> (empty-safe).

    ``split`` on an empty/whitespace-only string yields ``[""]`` — one
    empty token — which would make token_count('') == 1 and leak an
    empty token into simhash votes, stopword ratios, and quality-score
    denominators. Filter it so empty text tokenizes to an empty array.
    The DuckDB oracles mirror this with ``list_filter(..., t -> t <> '')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != F.lit(""))
