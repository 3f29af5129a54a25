"""Golden tests for the per-platform ingest projections on literal
nested fixtures (FIXTURES.md §A3) — coalesce chains, nested extraction,
null guards, the four timestamp parsers, and dedup-key semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from backend_etl_spark.ingest import projections as P
from backend_etl_spark.ingest import schemas as S

def FETCHED():
    return F.lit("2025-01-01 00:00:00").cast("timestamp")


def COMPANY():
    return F.lit("Acme")





def rows_by(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


# --- twitter ---------------------------------------------------------------


@pytest.fixture(scope="module")
def twitter_raw(spark):
    data = [
        {  # full record: media image + video variant
            "id": "t1", "url": "https://x.com/1", "text": "hello @acme",
            "createdAt": "Mon Nov 13 22:13:20 +0000 2023",
            "retweetCount": 2, "replyCount": None, "likeCount": 5, "viewCount": 100,
            "author": {"name": "alice"},
            "media": [{"expanded_url": "img1"}],
            "extendedEntities": {"media": [
                {"type": "photo", "videoInfo": None},
                {"type": "video",
                 "videoInfo": {"variants": [{"url": "vid1"}, {"url": "vid2"}]}},
            ]},
        },
        {"id": "t2", "text": "no ts", "createdAt": None},  # dropped (P5)
        {"id": "t3", "text": "bare", "createdAt": "Tue Nov 14 00:00:00 +0000 2023"},
    ]
    return spark.createDataFrame(data, S.TWITTER_RAW_DDL)


def test_twitter_projection(twitter_raw):
    out = rows_by(P.project_twitter(twitter_raw, COMPANY(), FETCHED()), "tweet_id")
    assert set(out) == {"t1", "t3"}  # t2 dropped by the createdAt guard
    t1 = out["t1"]
    assert t1["created_at"] == dt.datetime(2023, 11, 13, 22, 13, 20)  # F3
    assert t1["image"] == "img1"              # N2: first media element
    assert t1["videourl"] == "vid1"           # N3: first video variant
    assert t1["reply_count"] == 0             # F12: None -> 0
    assert t1["retweet_count"] == 2
    t3 = out["t3"]
    assert t3["image"] is None and t3["videourl"] is None
    assert t3["company_name"] == "Acme"


def test_twitter2_projection(spark):
    """S2 author-timeline shape: flat keys, ISO ts, id+text truthy guard
    (twitter2_scraper.py:53-55), replyCount .get(..., 0) default."""
    data = [
        {"id": "a1", "text": "hello", "createdAt": "2023-11-13T22:13:20",
         "replyCount": 3, "requested_handle": "acme_hq"},
        {"id": "a2", "text": "", "createdAt": "2023-11-13T22:13:20",
         "replyCount": 1, "requested_handle": "acme_hq"},      # empty text → skip
        {"id": None, "text": "orphan", "createdAt": "2023-11-13T22:13:20",
         "replyCount": 1, "requested_handle": "acme_hq"},      # no id → skip
        {"id": "a4", "text": "no reply count", "createdAt": "2023-11-14T00:00:00",
         "replyCount": None, "requested_handle": "acme_hq"},
    ]
    raw = spark.createDataFrame(data, S.TWITTER2_RAW_DDL)
    out = rows_by(P.project_twitter2(raw, COMPANY(), FETCHED()), "tweet_id")
    assert set(out) == {"a1", "a4"}
    a1 = out["a1"]
    assert a1["author_handle"] == "acme_hq"  # request context, not payload
    assert a1["created_at"] == dt.datetime(2023, 11, 13, 22, 13, 20)
    assert a1["reply_count"] == 3
    # fields the S2 payload never carries surface as NULLs
    assert a1["twitter_url"] is None and a1["retweet_count"] is None
    assert a1["like_count"] is None and a1["image"] is None
    assert out["a4"]["reply_count"] == 0  # .get(..., 0) default (F12)


def test_twitter3_projection(spark):
    """S3 snscrape shape: numeric id → string, content/user.username,
    `or 0` falsy-defaults on counts (twitter3_scraper.py:47-53)."""
    data = [
        {"id": 991, "content": "from sn", "date": "2023-11-13T22:13:20",
         "user": {"username": "bob"}, "replyCount": None, "likeCount": 7},
        {"id": 992, "content": "late", "date": "2023-11-15T01:02:03",
         "user": {"username": "eve"}, "replyCount": 2, "likeCount": None},
    ]
    raw = spark.createDataFrame(data, S.TWITTER3_RAW_DDL)
    out = rows_by(P.project_twitter3(raw, COMPANY(), FETCHED()), "tweet_id")
    assert set(out) == {"991", "992"}  # BIGINT id cast to string
    assert out["991"]["author_handle"] == "bob"
    assert out["991"]["reply_count"] == 0 and out["991"]["like_count"] == 7
    assert out["992"]["reply_count"] == 2 and out["992"]["like_count"] == 0
    assert out["992"]["created_at"] == dt.datetime(2023, 11, 15, 1, 2, 3)
    assert out["991"]["retweet_count"] is None  # snscrape shape has no RT count


def test_twitter_three_shapes_conform_to_one_schema(spark):
    """The three projections must be unionByName-compatible — the Spark
    analog of three scrapers writing one twitter_mentions table."""
    s1 = P.project_twitter(
        spark.createDataFrame([], S.TWITTER_RAW_DDL), COMPANY(), FETCHED()
    )
    s2 = P.project_twitter2(
        spark.createDataFrame([], S.TWITTER2_RAW_DDL), COMPANY(), FETCHED()
    )
    s3 = P.project_twitter3(
        spark.createDataFrame([], S.TWITTER3_RAW_DDL), COMPANY(), FETCHED()
    )
    assert s1.columns == s2.columns == s3.columns
    assert s1.unionByName(s2).unionByName(s3).count() == 0


# --- instagram -------------------------------------------------------------


def _ig_post(**kw):
    base = {k: None for k in (
        "id", "shortCode", "description", "caption", "username", "ownerUsername",
        "publishedAt", "timestamp", "likesCount", "like_count", "commentsCount",
        "comment_count", "videoUrl", "video_url", "images")}
    base.update(kw)
    return base


@pytest.fixture(scope="module")
def instagram_raw(spark):
    entry = {k: None for k in (
        "error", "topPosts", "latestPosts", "items", "id", "shortCode", "description",
        "caption", "username", "ownerUsername", "publishedAt", "timestamp",
        "likesCount", "like_count", "commentsCount", "comment_count", "videoUrl",
        "video_url", "images")}
    data = [
        # N1: topPosts ++ latestPosts
        {**entry,
         "topPosts": [_ig_post(id="p1", description="top", publishedAt="2024-01-01T10:00:00",
                               likesCount=7)],
         "latestPosts": [_ig_post(shortCode="p2", caption="latest",
                                  timestamp="2024-01-02T10:00:00", like_count=3)]},
        # N1: items fallback
        {**entry, "items": [_ig_post(id="p3", caption="item",
                                     publishedAt="2024-01-03T10:00:00")]},
        # N1: entry-as-post
        {**entry, "id": "p4", "description": "entrypost",
         "publishedAt": "2024-01-04T10:00:00", "commentsCount": 9},
        # P7: error entry skipped
        {**entry, "error": "not_found", "id": "p5",
         "publishedAt": "2024-01-05T10:00:00"},
        # P5: no id/shortCode -> dropped after explode
        {**entry, "items": [_ig_post(caption="anon", publishedAt="2024-01-06T10:00:00")]},
    ]
    return spark.createDataFrame(data, S.INSTAGRAM_RAW_DDL)


def test_instagram_projection(instagram_raw):
    out = rows_by(P.project_instagram(instagram_raw, COMPANY(), FETCHED()), "post_id")
    assert set(out) == {"p1", "p2", "p3", "p4"}
    assert out["p1"]["caption"] == "top" and out["p1"]["like_count"] == 7
    # P2 fallback keys: shortCode / caption / timestamp / like_count
    assert out["p2"]["caption"] == "latest"
    assert out["p2"]["created_at"] == dt.datetime(2024, 1, 2, 10, 0, 0)
    assert out["p2"]["like_count"] == 3 and out["p2"]["comment_count"] == 0
    assert out["p4"]["comment_count"] == 9  # entry-as-post branch


# --- facebook --------------------------------------------------------------


@pytest.fixture(scope="module")
def facebook_raw(spark):
    data = [
        {"postFacebookId": "f1", "text": "m1", "time": "2024-02-01T00:00:00",
         "likes": 4, "comments": None, "shares": 1,
         "textReferences": [{"short_name": "Bob", "shortname": None}],
         "media": [
             {"photo_image": None, "image": None},
             {"photo_image": {"url": "pi2"}, "image": None},
         ]},
        {"postFacebookId": None, "postId": "f2", "text": "m2",
         "time": "2024-02-02T00:00:00",
         "textReferences": [{"short_name": None, "shortname": "carol"}],
         "media": None},
        {"postFacebookId": None, "postId": None, "text": "dropme",
         "time": "2024-02-03T00:00:00"},           # P5: no id
        {"postFacebookId": "f4", "text": "no time", "time": None},  # P5: no ts
    ]
    return spark.createDataFrame(data, S.FACEBOOK_RAW_DDL)


def test_facebook_projection(facebook_raw):
    out = rows_by(
        P.project_facebook(facebook_raw, COMPANY(), F.lit("acme.fb"), FETCHED()), "post_id"
    )
    assert set(out) == {"f1", "f2"}
    assert out["f1"]["image"] == "pi2"          # N4: first media WITH an image
    assert out["f1"]["author_name"] == "Bob"    # N5 + P3 short_name|shortname
    assert out["f1"]["comments_count"] == 0
    assert out["f2"]["post_id"] == "f2"         # P3: postId fallback
    assert out["f2"]["author_name"] == "carol"
    assert out["f2"]["image"] is None


# --- linkedin --------------------------------------------------------------


@pytest.fixture(scope="module")
def linkedin_raw(spark):
    data = [
        {"urn": "u1", "full_urn": "urn:li:1", "text": "post", "url": "l1",
         "post_type": "article",
         "posted_at": {"date": "2024-03-01 08:00:00", "timestamp": 1709280000000},
         "author": {"first_name": "Ann", "last_name": "Lee", "username": "ann",
                    "headline": "CTO"},
         "media": {"url": "mimg"},
         "stats": {"total_reactions": 10, "like": 6, "support": None, "love": 1,
                   "insight": None, "celebrate": 2, "comments": 3, "reposts": 0}},
        {"urn": "u2", "full_urn": None, "text": "shape-fail", "url": "l2",
         "post_type": "post", "posted_at": None},          # P6 guard
        {"urn": "u3", "text": "no ts", "url": "l3", "post_type": "post",
         "posted_at": {"date": "2024-03-02", "timestamp": None}},  # P6 guard
    ]
    return spark.createDataFrame(data, S.LINKEDIN_RAW_DDL)


def test_linkedin_projection(linkedin_raw):
    rows = P.project_linkedin(linkedin_raw, COMPANY(), FETCHED()).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["urn"] == "urn:li:1"               # P3: full_urn wins
    assert r["author_name"] == "Ann Lee"        # F10 concat_ws
    assert r["support"] == 0 and r["insight"] == 0 and r["like_count"] == 6  # P4
    assert r["posted_at_ts"] == 1709280000000
    # F5: ms epoch -> timestamp (server-side to_timestamp parity)
    from backend_etl_spark.functions.scalars import epoch_millis_ts
    ts = (
        P.project_linkedin(linkedin_raw, COMPANY(), FETCHED())
        .select(epoch_millis_ts("posted_at_ts").alias("t"))
        .collect()[0]["t"]
    )
    assert ts == dt.datetime(2024, 3, 1, 8, 0, 0)


# --- reddit ----------------------------------------------------------------


@pytest.fixture(scope="module")
def reddit_raw(spark):
    data = [
        {"data": {"permalink": "/r/x/1", "title": "T1", "author": "u/a",
                  "score": 10, "num_comments": 2, "created_utc": 1704067200.0,
                  "selftext": "body",
                  "preview": {"images": [{"source": {"url": "ri1"}}]}}},
        {"data": {"permalink": "/r/x/2", "title": "T2", "author": "u/b",
                  "score": None, "num_comments": None, "created_utc": 1704067260.0,
                  "selftext": None, "preview": None}},
    ]
    return spark.createDataFrame(data, S.REDDIT_RAW_DDL)


def test_reddit_projection(reddit_raw):
    out = rows_by(P.project_reddit(reddit_raw, COMPANY(), FETCHED()), "post_url")
    r1 = out["https://www.reddit.com/r/x/1"]    # F10 absolute URL
    assert r1["review_date"] == "2024-01-01T00:00:00+00:00"  # F4 epoch->ISO UTC
    assert r1["image_url"] == "ri1"             # N5 preview.images[0].source.url
    r2 = out["https://www.reddit.com/r/x/2"]
    assert r2["votes"] == 0 and r2["comments"] == 0 and r2["image_url"] is None


# --- trustpilot / feefo / google maps --------------------------------------


def test_trustpilot_projection(spark):
    raw = spark.createDataFrame(
        [
            {"author_name": " Dana ", "rating_alt": "Rated 4 out of 5 stars",
             "review_title": "Great", "review_body": " body ",
             "review_date_raw": "23 January 2025"},
            {"author_name": "Eve", "rating_alt": "Rated 1 out of 5 stars",
             "review_title": "Bad", "review_body": "x",
             "review_date_raw": "not a date"},
        ],
        S.TRUSTPILOT_RAW_DDL,
    )
    out = rows_by(
        P.project_trustpilot(raw, COMPANY(), F.lit("acme.com"), FETCHED()), "author_name"
    )
    assert out["Dana"]["rating"] == 4                       # F8
    assert out["Dana"]["review_date"] == dt.date(2025, 1, 23)  # F1
    assert out["Dana"]["review_body"] == "body"             # F9 trim
    assert out["Eve"]["review_date"] is None                # F1 NULL-on-fail


def test_feefo_projection(spark):
    raw = spark.createDataFrame(
        [{"customer_name": "Flo", "service_review": "sv", "product_review": "pv",
          "customer_location": "UK",
          "review_date_raw": "Date of purchase: 05/03/2025"}],
        S.FEEFO_RAW_DDL,
    )
    r = P.project_feefo(raw, COMPANY(), F.lit("acme-slug"), FETCHED()).collect()[0]
    assert r["review_date"] == dt.date(2025, 3, 5)          # F2 prefix strip + parse


def test_google_maps_projection(spark):
    raw = spark.createDataFrame(
        [{"name": "Gil", "stars": 4.5, "text": "nice", "publishedAtDate":
          "2024-05-01T12:00:00Z", "reviewUrl": "gm1", "responseFromOwnerText": None}],
        S.GOOGLE_MAPS_RAW_DDL,
    )
    r = P.project_google_maps(raw, COMPANY(), F.lit("maps/acme"), FETCHED()).collect()[0]
    assert r["rating"] == 4.5 and r["reviewUrl"] == "gm1"
    assert r["review_date"] == "2024-05-01T12:00:00Z"       # ISO passthrough


# --- unified view + dedup-key semantics ------------------------------------


def test_unified_mentions(twitter_raw, instagram_raw):
    tw = P.project_twitter(twitter_raw, COMPANY(), FETCHED())
    ig = P.project_instagram(instagram_raw, COMPANY(), FETCHED())
    uni = P.unified_mentions({"twitter": tw, "instagram": ig})
    assert uni.count() == tw.count() + ig.count()
    assert set(uni.select("platform").distinct().toPandas()["platform"]) == {
        "twitter", "instagram",
    }
    # superset schema: twitter-only and instagram-only columns both present
    assert "tweet_id" in uni.columns and "post_id" in uni.columns


def test_dedup_key_nulls_compare_equal(spark, tmp_path):
    """Composite natural keys with NULL members dedup as equal — the
    documented NULL-semantics choice (SURVEY §7.3) for trustpilot's
    4-column ON CONFLICT key."""
    from backend_etl_spark.sink import write_idempotent

    raw = spark.createDataFrame(
        [
            {"author_name": "A", "rating_alt": "Rated 3 out of 5 stars",
             "review_title": None, "review_body": "b1", "review_date_raw": "1 May 2024"},
            {"author_name": "A", "rating_alt": "Rated 3 out of 5 stars",
             "review_title": None, "review_body": "b2", "review_date_raw": "1 May 2024"},
        ],
        S.TRUSTPILOT_RAW_DDL,
    )
    df = P.project_trustpilot(raw, COMPANY(), F.lit("acme.com"), FETCHED())
    n = write_idempotent(df, str(tmp_path / "tp"), S.DEDUP_KEYS["trustpilot_reviews"])
    assert n == 1  # NULL title == NULL title for dedup purposes


def test_feed_stream_reader_incremental(spark, tmp_path):
    """Cursor pagination as stream offsets: drain, append a page,
    re-drain with the same checkpoint -> only the new page arrives."""
    import json as _json

    from backend_etl_spark.sources.datasource import FixtureFeedDataSource

    feed = tmp_path / "feed"
    feed.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    for p in range(2):
        (feed / f"page_{p:04d}.jsonl").write_text(
            "\n".join(_json.dumps({"id": p * 10 + i}) for i in range(3))
        )

    spark.dataSource.register(FixtureFeedDataSource)

    def drain():
        (
            spark.readStream.format("fixture_feed")
            .option("path", str(feed))
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    drain()
    assert spark.read.parquet(sink).count() == 6

    (feed / "page_0004.jsonl").write_text(_json.dumps({"id": 99}))
    drain()
    out = spark.read.parquet(sink)
    assert out.count() == 7
    ids = {_json.loads(r["item"])["id"] for r in out.collect()}
    assert 99 in ids


def test_generic_feed_ingest_multiplatform(spark, tmp_path):
    """FeedSpec dispatch: linkedin / reddit / trustpilot feeds through
    the same generic tick — window filter, idempotent sink, watermark."""
    import json as _json

    from backend_etl_spark.ingest.feed_pipeline import ingest_feed
    from backend_etl_spark.sink import WatermarkStore

    state = WatermarkStore(spark, str(tmp_path / "wm"))
    tenant = {
        "id": 7,
        "company_name": "Acme",
        "company_web_address": "acme.com",
        "facebook_username": "acme",
        "feefo_business_info": "acme-slug",
        "place_url": "maps://acme",
    }

    cases = {
        "linkedin": (  # 1 valid post; u2/u3 fail the posted_at shape guard
            [
                {"urn": "u1", "full_urn": "urn:li:1", "text": "post", "url": "l1",
                 "post_type": "article",
                 "posted_at": {"date": "2024-03-01 08:00:00", "timestamp": 1709280000000},
                 "author": {"first_name": "Ann", "last_name": "Lee", "username": "ann",
                            "headline": "CTO"},
                 "media": {"url": "mimg"},
                 "stats": {"total_reactions": 10, "like": 6, "comments": 3, "reposts": 0}},
                {"urn": "u2", "text": "shape-fail", "url": "l2", "post_type": "post"},
            ],
            dt.datetime(2024, 3, 20), 1,
        ),
        "reddit": (
            [
                {"data": {"permalink": "/r/x/1", "title": "T1", "author": "u/a",
                          "score": 10, "num_comments": 2, "created_utc": 1704067200.0,
                          "selftext": "body",
                          "preview": {"images": [{"source": {"url": "ri1"}}]}}},
                {"data": {"permalink": "/r/x/2", "title": "T2", "author": "u/b",
                          "created_utc": 1704067260.0}},
            ],
            dt.datetime(2024, 3, 20), 2,
        ),
        "trustpilot": (  # Eve's unparseable date falls out of the window
            [
                {"author_name": "Dana", "rating_alt": "Rated 4 out of 5 stars",
                 "review_title": "Great", "review_body": "body",
                 "review_date_raw": "23 January 2025"},
                {"author_name": "Eve", "rating_alt": "Rated 1 out of 5 stars",
                 "review_title": "Bad", "review_body": "x",
                 "review_date_raw": "not a date"},
            ],
            dt.datetime(2025, 2, 1), 1,
        ),
    }

    for platform, (payloads, as_of, want_n) in cases.items():
        feed = tmp_path / f"feed_{platform}"
        feed.mkdir()
        (feed / "page_0000.jsonl").write_text(
            "\n".join(_json.dumps(p) for p in payloads)
        )
        sink = str(tmp_path / f"sink_{platform}")
        n = ingest_feed(spark, platform, str(feed), sink, state, tenant, as_of)
        assert n == want_n, platform
        assert spark.read.parquet(sink).count() == want_n
        # redelivery is a no-op; watermark advanced to as_of
        assert ingest_feed(spark, platform, str(feed), sink, state, tenant, as_of) == 0
        assert state.get(7, platform) == as_of


def test_generic_feed_ingest_remaining_platforms(spark, tmp_path):
    """FeedSpec dispatch for the other five platforms: twitter,
    instagram, facebook, feefo, google_maps."""
    import json as _json

    from backend_etl_spark.ingest.feed_pipeline import ingest_feed
    from backend_etl_spark.sink import WatermarkStore

    state = WatermarkStore(spark, str(tmp_path / "wm"))
    tenant = {
        "id": 9,
        "company_name": "Acme",
        "company_web_address": "acme.com",
        "facebook_username": "acme",
        "feefo_business_info": "acme-slug",
        "place_url": "maps://acme",
    }

    cases = {
        "twitter": (
            [{"id": "t1", "url": "u", "text": "hi @acme",
              "createdAt": "Mon Nov 13 22:13:20 +0000 2023",
              "author": {"name": "alice"}},
             {"id": "t2", "text": "no ts"}],  # P5 guard
            dt.datetime(2024, 1, 1), 1,
        ),
        "instagram": (
            [{"id": "p4", "description": "entrypost",
              "publishedAt": "2024-01-04T10:00:00", "commentsCount": 9},
             {"error": "not_found", "id": "p5",
              "publishedAt": "2024-01-05T10:00:00"}],  # P7 guard
            dt.datetime(2024, 2, 1), 1,
        ),
        "facebook": (
            [{"postFacebookId": "f1", "text": "m1", "time": "2024-02-01T00:00:00",
              "likes": 4, "shares": 1,
              "textReferences": [{"short_name": "Bob"}]},
             {"text": "dropme", "time": "2024-02-03T00:00:00"}],  # P5: no id
            dt.datetime(2024, 3, 1), 1,
        ),
        "feefo": (
            [{"customer_name": "Flo", "service_review": "sv", "product_review": "pv",
              "customer_location": "UK",
              "review_date_raw": "Date of purchase: 05/03/2025"}],
            dt.datetime(2025, 4, 1), 1,
        ),
        "google_maps": (
            [{"name": "Gil", "stars": 4.5, "text": "nice",
              "publishedAtDate": "2024-05-01T12:00:00Z", "reviewUrl": "gm1"}],
            dt.datetime(2024, 6, 1), 1,
        ),
    }

    for platform, (payloads, as_of, want_n) in cases.items():
        feed = tmp_path / f"feed_{platform}"
        feed.mkdir()
        (feed / "page_0000.jsonl").write_text(
            "\n".join(_json.dumps(p) for p in payloads)
        )
        sink = str(tmp_path / f"sink_{platform}")
        n = ingest_feed(spark, platform, str(feed), sink, state, tenant, as_of)
        assert n == want_n, platform
        assert ingest_feed(spark, platform, str(feed), sink, state, tenant, as_of) == 0
        assert state.get(9, platform) == as_of


def test_feed_tolerates_corrupt_json_lines(spark, tmp_path):
    """Malformed payload lines: from_json yields NULL structs, the
    null-guard filters drop them, valid lines land — log-and-continue
    (the reference's defensive posture, SURVEY §5.1) without a crash."""
    import json as _json

    from backend_etl_spark.ingest.feed_pipeline import ingest_feed
    from backend_etl_spark.sink import WatermarkStore

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "page_0000.jsonl").write_text(
        "\n".join(
            [
                _json.dumps({"id": "t1", "text": "ok",
                             "createdAt": "Mon Nov 13 22:13:20 +0000 2023"}),
                "{not valid json at all",
                '["wrong shape"]',
            ]
        )
    )
    state = WatermarkStore(spark, str(tmp_path / "wm"))
    n = ingest_feed(
        spark, "twitter", str(feed), str(tmp_path / "sink"), state,
        {"id": 1, "company_name": "Acme"}, dt.datetime(2024, 1, 1),
    )
    assert n == 1
