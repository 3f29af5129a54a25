"""Ingest-surface catalog entries, tier 2: direct driver-attestable
fixtures for the four async-actor projections (S4 Instagram, S6
Facebook, S7 LinkedIn, S5 Google Maps).

Round-3 verdict item 10: these projections were only transitively
attested (their operators feed the twitter/html union entries). Each
entry here renders raw actor-shaped payloads from the ``events`` table
with pure Column expressions — exercising the branchy parts (multi-key
coalesce, nested first-match, error filters, shape guards, NULL→0
defaults) — runs them through the REAL projection operator, and must
reproduce exactly the relation the DuckDB oracle computes straight from
``events``. A projection regression surfaces as a value-hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_etl_spark.catalog.registry import register
from backend_etl_spark.ingest import projections as P
from backend_etl_spark.session import tune
from backend_etl_spark.sources.loader import load_table

_FETCHED = "2025-01-01 00:00:00"


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → (eid, uid, ts2): the deterministic seed every fixture
    derives its payload values from (same recipe as the twitter union
    entry, so oracles recompute fields from eid alone)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("eid"),
        F.col("user_id").alias("uid"),
        F.date_trunc("second", F.col("ts")).alias("ts2"),
    )


def _s(col) -> Column:
    return col.cast("string")


def _tag(prefix: str, col) -> Column:
    return F.concat(F.lit(prefix), _s(col))


def _null_unless(cond: Column, value: Column) -> Column:
    return F.when(cond, value)


_ORACLE_BASE = """
    base AS (SELECT event_id AS eid, user_id AS uid,
                    date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts2
             FROM events)"""


# ---------------------------------------------------------------------------
# S4 Instagram: error filter (P7), three-source flatten (N1),
# multi-key coalesce (P2), entry-as-post fallback, guard (P5)
# ---------------------------------------------------------------------------


@register(
    "instagram_flatten_fixture",
    oracle=f"""
    WITH {_ORACLE_BASE},
    ok AS (SELECT * FROM base WHERE eid % 31 <> 0),
    p AS (
      SELECT eid, uid, ts2 FROM ok WHERE eid % 3 = 0            -- topPosts
      UNION ALL
      SELECT eid, uid, ts2 FROM ok WHERE eid % 3 IN (0, 1)      -- latestPosts
      UNION ALL
      SELECT eid, uid, ts2 FROM ok WHERE eid % 3 = 2 AND eid % 2 = 0  -- items
      UNION ALL
      SELECT eid, uid, ts2 FROM ok WHERE eid % 3 = 2 AND eid % 2 = 1) -- entry
    SELECT CASE WHEN eid % 5 = 0 THEN 'sc' || eid ELSE 'ig' || eid END
             AS post_id,
           'Acme' AS company_name,
           CASE WHEN eid % 2 = 0 THEN 'c' || eid ELSE 'd' || eid END
             AS caption,
           CASE WHEN eid % 4 = 0 THEN 'o' || uid ELSE 'u' || uid END
             AS author_handle,
           ts2 AS created_at,
           CAST(CASE WHEN eid % 3 <> 0 THEN eid % 50
                     WHEN eid % 21 <> 0 THEN eid % 7 + 1
                     ELSE 0 END AS INT) AS like_count,
           CAST(CASE WHEN eid % 11 <> 0 THEN eid % 9
                     WHEN eid % 33 <> 0 THEN eid % 13 + 1
                     ELSE 0 END AS INT) AS comment_count,
           TIMESTAMP '{_FETCHED}' AS fetched_at,
           CASE WHEN eid % 2 = 0 THEN 'img' || eid END AS image,
           CASE WHEN eid % 8 = 0 THEN 'v' || eid ELSE 'w' || eid END
             AS videourl
    FROM p
    WHERE NOT (eid % 6 = 0 AND eid % 29 = 0)
    """,
)
def instagram_flatten_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 end-to-end: Apify Instagram payloads (error entries, posts
    arriving via topPosts++latestPosts, items, or the entry itself) →
    project_instagram → flat instagram_mentions rows. The fixture routes
    each event through exactly one arrival shape (eid%3 — with %3==0
    landing the same post in BOTH topPosts and latestPosts, so the
    concat really concatenates) and NULLs alternate coalesce keys by
    eid mods, so every P2 chain and the P5/P7 guards execute on real
    data (instagram_scraper.py:78-112 semantics)."""
    tune(spark)
    b = _base(spark, sf_dir)
    eid, uid = F.col("eid"), F.col("uid")
    iso = F.date_format(F.col("ts2"), "yyyy-MM-dd HH:mm:ss")
    post = F.struct(
        _null_unless(eid % 5 != 0, _tag("ig", eid)).alias("id"),
        _tag("sc", eid).alias("shortCode"),
        _null_unless(eid % 2 != 0, _tag("d", eid)).alias("description"),
        _tag("c", eid).alias("caption"),
        _null_unless(eid % 4 != 0, _tag("u", uid)).alias("username"),
        _tag("o", uid).alias("ownerUsername"),
        _null_unless(eid % 6 != 0, iso).alias("publishedAt"),
        _null_unless(eid % 29 != 0, iso).alias("timestamp"),
        _null_unless(eid % 3 != 0, (eid % 50).cast("int")).alias("likesCount"),
        _null_unless(eid % 21 != 0, (eid % 7 + 1).cast("int")).alias("like_count"),
        _null_unless(eid % 11 != 0, (eid % 9).cast("int")).alias("commentsCount"),
        _null_unless(eid % 33 != 0, (eid % 13 + 1).cast("int")).alias(
            "comment_count"
        ),
        _null_unless(eid % 8 == 0, _tag("v", eid)).alias("videoUrl"),
        _tag("w", eid).alias("video_url"),
        _null_unless(eid % 2 == 0, F.array(_tag("img", eid))).alias("images"),
    )
    raw = b.select(
        "eid",
        _null_unless(eid % 31 == 0, F.lit("boom")).alias("error"),
        _null_unless(eid % 3 == 0, F.array(post)).alias("topPosts"),
        _null_unless(eid % 3 <= 1, F.array(post)).alias("latestPosts"),
        _null_unless((eid % 3 == 2) & (eid % 2 == 0), F.array(post)).alias(
            "items"
        ),
        # entry-as-post fallback reads the per-post fields off the entry
        # itself (instagram_scraper.py:84-92 third branch)
        post.alias("__p"),
    ).select("eid", "error", "topPosts", "latestPosts", "items", "__p.*")
    return P.project_instagram(
        raw, F.lit("Acme"), F.lit(_FETCHED).cast("timestamp")
    )


# ---------------------------------------------------------------------------
# S6 Facebook: nested media first-match with decoy (N4), textReferences
# first element (N5), id coalesce (P3), guard (P5), NULL→0 (F12)
# ---------------------------------------------------------------------------


@register(
    "facebook_nested_fixture",
    oracle=f"""
    WITH {_ORACLE_BASE}
    SELECT CASE WHEN eid % 5 = 0 THEN 'fb' || eid ELSE 'pf' || eid END
             AS post_id,
           'Acme' AS company_name,
           'acmepage' AS facebook_username,
           'msg ' || eid AS message,
           ts2 AS created_at,
           CAST(CASE WHEN eid % 3 = 0 THEN eid % 40 ELSE 0 END AS INT)
             AS reactions_count,
           CAST(CASE WHEN eid % 4 = 0 THEN eid % 15 ELSE 0 END AS INT)
             AS comments_count,
           CASE WHEN eid % 13 = 0 THEN NULL
                WHEN eid % 2 = 1 THEN 's' || uid
                ELSE 'n' || uid END AS author_name,
           CASE WHEN eid % 11 = 0 THEN NULL
                WHEN eid % 3 = 0 THEN 'p' || eid
                WHEN eid % 3 = 1 THEN 'u' || eid
                ELSE 'r' || eid END AS image,
           CAST(CASE WHEN eid % 7 = 0 THEN eid % 6 ELSE 0 END AS INT)
             AS share_count,
           'https://fb.example/' || eid AS post_url,
           TIMESTAMP '{_FETCHED}' AS fetched_at
    FROM base
    WHERE eid % 29 <> 0
    """,
)
def facebook_nested_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 end-to-end: Apify Facebook payloads → project_facebook. The
    media array always LEADS with an all-NULL decoy entry, so the
    N4 first-match filter must skip it and pick the element whose
    photo_image.url / image.uri / image.url is set (rotating by eid%3 —
    all three coalesce arms execute); textReferences goes empty on
    eid%13 (author NULL via try_element_at), the id arrives under
    postFacebookId or postId (P3), counters NULL out to the F12
    0-default, and eid%29 drops on the time guard
    (facebook_scraper.py:80-115 semantics)."""
    tune(spark)
    b = _base(spark, sf_dir)
    eid, uid = F.col("eid"), F.col("uid")
    nul = F.lit(None).cast("string")
    img_entry = F.struct(
        F.struct(
            _null_unless(eid % 3 == 0, _tag("p", eid)).alias("url")
        ).alias("photo_image"),
        F.struct(
            _null_unless(eid % 3 == 1, _tag("u", eid)).alias("uri"),
            _null_unless(eid % 3 == 2, _tag("r", eid)).alias("url"),
        ).alias("image"),
    )
    decoy = F.struct(
        F.struct(nul.alias("url")).alias("photo_image"),
        F.struct(nul.alias("uri"), nul.alias("url")).alias("image"),
    )
    ref = F.struct(
        _null_unless(eid % 2 == 1, _tag("s", uid)).alias("short_name"),
        _tag("n", uid).alias("shortname"),
    )
    raw = b.select(
        _null_unless(eid % 5 != 0, _tag("pf", eid)).alias("postFacebookId"),
        _tag("fb", eid).alias("postId"),
        _null_unless(eid % 29 != 0, F.col("ts2")).alias("time"),
        _tag("msg ", eid).alias("text"),
        _null_unless(eid % 3 == 0, (eid % 40).cast("int")).alias("likes"),
        _null_unless(eid % 4 == 0, (eid % 15).cast("int")).alias("comments"),
        _null_unless(eid % 7 == 0, (eid % 6).cast("int")).alias("shares"),
        F.when(eid % 13 == 0, F.array().cast("array<struct<short_name:string,shortname:string>>"))
        .otherwise(F.array(ref))
        .alias("textReferences"),
        F.when(eid % 11 == 0, F.slice(F.array(decoy), 1, 0))
        .otherwise(F.array(decoy, img_entry))
        .alias("media"),
        _tag("https://fb.example/", eid).alias("url"),
    )
    return P.project_facebook(
        raw, F.lit("Acme"), F.lit("acmepage"), F.lit(_FETCHED).cast("timestamp")
    )


# ---------------------------------------------------------------------------
# S7 LinkedIn: posted_at shape guard (P6), urn coalesce (P3), struct
# projection with 8 counters (P4), NULL-skipping name join (F10)
# ---------------------------------------------------------------------------


@register(
    "linkedin_struct_fixture",
    oracle=f"""
    WITH {_ORACLE_BASE}
    SELECT 'Acme' AS company_name,
           CASE WHEN eid % 4 = 0 THEN 'urn' || eid ELSE 'furn' || eid END
             AS urn,
           'post ' || eid AS text,
           'https://li.example/' || eid AS url,
           strftime(ts2, '%Y-%m-%dT%H:%M:%S') AS posted_at_iso,
           epoch_ms(ts2) AS posted_at_ts,
           CASE WHEN eid % 6 = 0 THEN 'A' || uid
                ELSE 'A' || uid || ' ' || 'B' || uid END AS author_name,
           'u' || uid AS author_profile_id,
           CASE WHEN eid % 5 = 0 THEN NULL ELSE 'h' || uid END
             AS author_headline,
           CASE WHEN eid % 9 = 0 THEN 'm' || eid END AS image,
           CAST(CASE WHEN eid % 10 = 0 THEN 0 ELSE eid % 100 END AS INT)
             AS total_reactions,
           CAST(CASE WHEN eid % 12 = 0 THEN 0 ELSE eid % 50 END AS INT)
             AS like_count,
           CAST(CASE WHEN eid % 2 = 0 THEN 0 ELSE eid % 5 END AS INT)
             AS support,
           CAST(eid % 7 AS INT) AS love,
           CAST(0 AS INT) AS insight,
           CAST(eid % 3 AS INT) AS celebrate,
           CAST(CASE WHEN eid % 8 = 0 THEN 0 ELSE eid % 20 END AS INT)
             AS comments_count,
           CAST(CASE WHEN eid % 14 = 0 THEN 0 ELSE eid % 4 END AS INT)
             AS reposts,
           CASE WHEN eid % 2 = 0 THEN 'regular' ELSE 'share' END AS type,
           TIMESTAMP '{_FETCHED}' AS fetched_at
    FROM base
    WHERE eid % 23 <> 0 AND eid % 17 <> 0 AND eid % 19 <> 0
    """,
)
def linkedin_struct_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 end-to-end: Apify LinkedIn payloads → project_linkedin. The
    posted_at struct goes whole-NULL (eid%23), date-NULL (eid%17) and
    timestamp-NULL (eid%19) — all three must fall to the P6 shape guard;
    the urn arrives as full_urn or urn (P3); author last_name NULLs out
    on eid%6 and concat_ws must skip it, not emit a dangling space
    (F10); all 8 reaction counters exercise the struct-field projection
    with NULL→0 defaults (linkedin_scraper.py:65-107 semantics)."""
    tune(spark)
    b = _base(spark, sf_dir)
    eid, uid = F.col("eid"), F.col("uid")
    posted = F.struct(
        _null_unless(
            eid % 17 != 0, F.date_format("ts2", "yyyy-MM-dd'T'HH:mm:ss")
        ).alias("date"),
        _null_unless(eid % 19 != 0, F.unix_millis(F.col("ts2"))).alias(
            "timestamp"
        ),
    )
    raw = b.select(
        _null_unless(eid % 23 != 0, posted).alias("posted_at"),
        _null_unless(eid % 4 != 0, _tag("furn", eid)).alias("full_urn"),
        _tag("urn", eid).alias("urn"),
        _tag("post ", eid).alias("text"),
        _tag("https://li.example/", eid).alias("url"),
        F.struct(
            _tag("A", uid).alias("first_name"),
            _null_unless(eid % 6 != 0, _tag("B", uid)).alias("last_name"),
            _tag("u", uid).alias("username"),
            _null_unless(eid % 5 != 0, _tag("h", uid)).alias("headline"),
        ).alias("author"),
        F.struct(_null_unless(eid % 9 == 0, _tag("m", eid)).alias("url")).alias(
            "media"
        ),
        F.struct(
            _null_unless(eid % 10 != 0, (eid % 100).cast("int")).alias(
                "total_reactions"
            ),
            _null_unless(eid % 12 != 0, (eid % 50).cast("int")).alias("like"),
            _null_unless(eid % 2 != 0, (eid % 5).cast("int")).alias("support"),
            (eid % 7).cast("int").alias("love"),
            F.lit(None).cast("int").alias("insight"),
            (eid % 3).cast("int").alias("celebrate"),
            _null_unless(eid % 8 != 0, (eid % 20).cast("int")).alias("comments"),
            _null_unless(eid % 14 != 0, (eid % 4).cast("int")).alias("reposts"),
        ).alias("stats"),
        F.when(eid % 2 == 0, F.lit("regular")).otherwise(F.lit("share")).alias(
            "post_type"
        ),
    )
    return P.project_linkedin(
        raw, F.lit("Acme"), F.lit(_FETCHED).cast("timestamp")
    )


# ---------------------------------------------------------------------------
# S5 Google Maps: straight review projection with ISO passthrough
# ---------------------------------------------------------------------------


@register(
    "gmaps_projection_fixture",
    oracle=f"""
    WITH {_ORACLE_BASE}
    SELECT 'Acme' AS company_name,
           'https://maps.example/acme' AS place_url,
           'rev ' || uid AS reviewer_name,
           CAST(eid % 5 + 1 AS INT) AS rating,
           'review ' || eid AS review_text,
           strftime(ts2, '%Y-%m-%dT%H:%M:%S') || '.000Z' AS review_date,
           'https://maps.example/r/' || eid AS "reviewUrl",
           CASE WHEN eid % 3 = 0 THEN 'reply ' || eid END AS owner_response,
           TIMESTAMP '{_FETCHED}' AS fetched_at
    FROM base
    """,
)
def gmaps_projection_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 end-to-end: Apify Google Maps review payloads →
    project_google_maps — the straight projection with ISO date
    passthrough and the reference's camelCase reviewUrl kept verbatim
    (google_maps_scraper.py:53-80; the column name survives into the
    sink's ON CONFLICT key, db_helpers.py:187-198)."""
    tune(spark)
    b = _base(spark, sf_dir)
    eid, uid = F.col("eid"), F.col("uid")
    raw = b.select(
        _tag("rev ", uid).alias("name"),
        (eid % 5 + 1).cast("int").alias("stars"),
        _tag("review ", eid).alias("text"),
        F.concat(
            F.date_format("ts2", "yyyy-MM-dd'T'HH:mm:ss"), F.lit(".000Z")
        ).alias("publishedAtDate"),
        _tag("https://maps.example/r/", eid).alias("reviewUrl"),
        _null_unless(eid % 3 == 0, _tag("reply ", eid)).alias(
            "responseFromOwnerText"
        ),
    )
    return P.project_google_maps(
        raw,
        F.lit("Acme"),
        F.lit("https://maps.example/acme"),
        F.lit(_FETCHED).cast("timestamp"),
    )
