"""Per-platform ingest projections: raw source payloads → fact records.

Each function re-expresses one reference scraper's record construction
as a pure Catalyst projection (SURVEY §2.3-2.5): multi-key coalesce
chains, nested flatten/element access, null-guard filters, and the four
timestamp parsers — no Python loops, no UDFs. The `company_name` stamp
is the reference's dimension-denormalization (J1, tasks.py:113); pass a
literal for single-tenant batches or join the control dim upstream.

`fetched_at` is injectable (reference uses server-side NOW(),
db_helpers.py:99) so runs are reproducible; defaults to
current_timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from backend_etl_spark.functions.scalars import (
    epoch_millis_ts,
    parse_ctime_utc,
    parse_long_date,
    parse_purchase_date,
    rating_from_alt,
)


def _fetched(fetched_at: Column | None) -> Column:
    return fetched_at if fetched_at is not None else F.current_timestamp()


def _i(col: Column) -> Column:
    """NULL→0 counter defaulting (the reference's `or 0` / `.get(k, 0)`
    idiom, F12)."""
    return F.coalesce(col, F.lit(0)).cast("int")


def project_twitter(
    raw: DataFrame, company_name: Column, fetched_at: Column | None = None
) -> DataFrame:
    """Twitter mentions (scrapers/twitter_scraper.py:65-94).

    - created_at: ctime-with-tz parse → UTC (F3, :69-70)
    - image: first media element's expanded_url (N2, :84)
    - videourl: first video/animated_gif media → first variant url (N3, :89-94)
    - guard: createdAt present (P5, :66-67)
    """
    video_media = F.filter(
        F.col("extendedEntities.media"),
        lambda m: m["type"].isin("video", "animated_gif"),
    )
    return (
        raw.where(F.col("createdAt").isNotNull())
        .select(
            F.col("id").alias("tweet_id"),
            company_name.alias("company_name"),
            F.col("url").alias("twitter_url"),
            F.col("text"),
            F.col("author.name").alias("author_handle"),
            parse_ctime_utc(F.col("createdAt")).alias("created_at"),
            _i(F.col("replyCount")).alias("reply_count"),
            _i(F.col("retweetCount")).alias("retweet_count"),
            _i(F.col("likeCount")).alias("like_count"),
            _i(F.col("viewCount")).alias("view_count"),
            F.try_element_at("media", F.lit(1)).getField("expanded_url").alias("image"),
            F.try_element_at(video_media, F.lit(1))
            .getField("videoInfo")
            .getField("variants")
            .getItem(0)
            .getField("url")
            .alias("videourl"),
            _fetched(fetched_at).alias("fetched_at"),
        )
    )


def project_twitter2(
    raw: DataFrame, company_name: Column, fetched_at: Column | None = None
) -> DataFrame:
    """Apify author-timeline mentions (twitter2_scraper.py:49-66, S2).

    Same sink table as S1, different record shape: flat ``id``/``text``/
    ``createdAt`` keys, ISO timestamps, and the author handle is the
    REQUESTED username from the task payload (:31-33), not a payload
    field. Guard: ``id`` and ``text`` both truthy (:53-55) — note this
    differs from S1's createdAt guard. ``replyCount`` defaults 0 via
    ``.get(..., 0)`` (:63).

    The reference's record omits the url/count keys its shared INSERT
    references (twitter2_scraper.py:57-63 vs db_helpers.py:98) — a
    latent KeyError there; here the missing fields surface as NULLs.
    """
    return (
        raw.where(
            F.col("id").isNotNull() & (F.col("id") != "")
            & F.col("text").isNotNull() & (F.col("text") != "")
        )
        .select(
            F.col("id").alias("tweet_id"),
            company_name.alias("company_name"),
            F.lit(None).cast("string").alias("twitter_url"),
            F.col("text"),
            F.col("requested_handle").alias("author_handle"),
            F.try_to_timestamp(
                F.col("createdAt"), F.lit("yyyy-MM-dd'T'HH:mm:ss")
            ).alias("created_at"),
            _i(F.col("replyCount")).alias("reply_count"),
            F.lit(None).cast("int").alias("retweet_count"),
            F.lit(None).cast("int").alias("like_count"),
            F.lit(None).cast("int").alias("view_count"),
            F.lit(None).cast("string").alias("image"),
            F.lit(None).cast("string").alias("videourl"),
            _fetched(fetched_at).alias("fetched_at"),
        )
    )


def project_twitter3(
    raw: DataFrame, company_name: Column, fetched_at: Column | None = None
) -> DataFrame:
    """snscrape timeline mentions (twitter3_scraper.py:41-58, S3).

    Third record shape writing the same table: numeric ``id`` (cast to
    string, :47), ``content`` as text, nested ``user.username``, ISO
    ``date``; reply/like counts apply the ``or 0`` falsy-default (:52-53,
    F12). The since-lower-bound early termination lives connector-side
    (P9); this projection is shape only.
    """
    return raw.select(
        F.col("id").cast("string").alias("tweet_id"),
        company_name.alias("company_name"),
        F.lit(None).cast("string").alias("twitter_url"),
        F.col("content").alias("text"),
        F.col("user.username").alias("author_handle"),
        F.try_to_timestamp(F.col("date"), F.lit("yyyy-MM-dd'T'HH:mm:ss")).alias(
            "created_at"
        ),
        _i(F.col("replyCount")).alias("reply_count"),
        F.lit(None).cast("int").alias("retweet_count"),
        _i(F.col("likeCount")).alias("like_count"),
        F.lit(None).cast("int").alias("view_count"),
        F.lit(None).cast("string").alias("image"),
        F.lit(None).cast("string").alias("videourl"),
        _fetched(fetched_at).alias("fetched_at"),
    )


#: the per-post fields of the Instagram payload, in schema order
_IG_FIELDS = [
    "id", "shortCode", "description", "caption", "username", "ownerUsername",
    "publishedAt", "timestamp", "likesCount", "like_count", "commentsCount",
    "comment_count", "videoUrl", "video_url", "images",
]


def project_instagram(
    raw: DataFrame, company_name: Column, fetched_at: Column | None = None
) -> DataFrame:
    """Instagram mentions (scrapers/instagram_scraper.py:78-112).

    - error entries dropped (P7, :80-82)
    - posts = topPosts ++ latestPosts, else items, else entry-as-post
      (N1, :84-92)
    - multi-key coalesce: id|shortCode, description|caption,
      publishedAt|timestamp, likesCount|like_count|0 … (P2, :102-109)
    - guard: post_id AND created_at present (P5, :111-112)
    """
    empty = F.array().cast(raw.schema["topPosts"].dataType)
    entry_as_post = F.array(F.struct(*[F.col(c) for c in _IG_FIELDS]))
    posts = (
        F.when(
            F.col("topPosts").isNotNull() | F.col("latestPosts").isNotNull(),
            F.concat(
                F.coalesce(F.col("topPosts"), empty),
                F.coalesce(F.col("latestPosts"), empty),
            ),
        )
        .when(F.col("items").isNotNull(), F.col("items"))
        .otherwise(entry_as_post)
    )
    # evaluate the dim stamps BEFORE the explode: company_name may be a
    # column off a joined users dim (fleet path), and the explode's
    # restructuring would drop it otherwise
    p = (
        raw.where(F.col("error").isNull())
        .select(
            company_name.alias("__company_name"),
            _fetched(fetched_at).alias("__fetched_at"),
            F.explode(posts).alias("p"),
        )
        .select("__company_name", "__fetched_at", "p.*")
    )
    created = F.try_to_timestamp(F.coalesce(F.col("publishedAt"), F.col("timestamp")))
    # the mentions table stores `image` as flat TEXT (utils/db_helpers.py:
    # 113-122; instagram_scraper.py:109,123 stuffs it.get("images") in as-is)
    # — when the payload carries the real Apify ARRAY shape, scalarize to
    # the first URL so the sink schema (schemas.py:27) always holds
    images_t = dict(p.dtypes).get("images", "string")
    image = (
        F.try_element_at("images", F.lit(1))
        if images_t.startswith("array")
        else F.col("images")
    )
    return (
        p.select(
            F.coalesce(F.col("id"), F.col("shortCode")).alias("post_id"),
            F.col("__company_name").alias("company_name"),
            F.coalesce(F.col("description"), F.col("caption")).alias("caption"),
            F.coalesce(F.col("username"), F.col("ownerUsername")).alias("author_handle"),
            created.alias("created_at"),
            _i(F.coalesce(F.col("likesCount"), F.col("like_count"))).alias("like_count"),
            _i(F.coalesce(F.col("commentsCount"), F.col("comment_count"))).alias(
                "comment_count"
            ),
            F.col("__fetched_at").alias("fetched_at"),
            image.alias("image"),
            F.coalesce(F.col("videoUrl"), F.col("video_url")).alias("videourl"),
        )
        .where(F.col("post_id").isNotNull() & F.col("created_at").isNotNull())
    )


def project_facebook(
    raw: DataFrame,
    company_name: Column,
    facebook_username: Column,
    fetched_at: Column | None = None,
) -> DataFrame:
    """Facebook posts (scrapers/facebook_scraper.py:80-115).

    - author: textReferences[0].short_name|shortname (N5, :82-86)
    - image: first media entry with photo_image.url | image.uri | image.url
      (N4, :88-97)
    - post_id: postFacebookId | postId (P3, :100)
    - guard: post_id AND time present (P5, :113-115)
    """
    first_ref = F.try_element_at("textReferences", F.lit(1))
    media_with_img = F.filter(
        F.col("media"),
        lambda m: m["photo_image"]["url"].isNotNull()
        | m["image"]["uri"].isNotNull()
        | m["image"]["url"].isNotNull(),
    )
    first_img = F.try_element_at(media_with_img, F.lit(1))
    return (
        raw.where(
            F.coalesce(F.col("postFacebookId"), F.col("postId")).isNotNull()
            & F.col("time").isNotNull()
        )
        .select(
            F.coalesce(F.col("postFacebookId"), F.col("postId")).alias("post_id"),
            company_name.alias("company_name"),
            facebook_username.alias("facebook_username"),
            F.col("text").alias("message"),
            F.col("time").alias("created_at"),
            _i(F.col("likes")).alias("reactions_count"),
            _i(F.col("comments")).alias("comments_count"),
            F.coalesce(
                first_ref.getField("short_name"), first_ref.getField("shortname")
            ).alias("author_name"),
            F.coalesce(
                first_img.getField("photo_image").getField("url"),
                first_img.getField("image").getField("uri"),
                first_img.getField("image").getField("url"),
            ).alias("image"),
            _i(F.col("shares")).alias("share_count"),
            F.col("url").alias("post_url"),
            _fetched(fetched_at).alias("fetched_at"),
        )
    )


def project_linkedin(
    raw: DataFrame, company_name: Column, fetched_at: Column | None = None
) -> DataFrame:
    """LinkedIn posts (scrapers/linkedin_scraper.py:65-107).

    - shape guard: posted_at.date AND posted_at.timestamp present (P6, :66-77)
    - urn: full_urn | urn (P3, :86)
    - author_name: first+last join skipping NULLs (F10, :91-94)
    - 8 reaction counters with 0 defaults from stats struct (P4, :99-106)
    - posted_at_ts kept raw (ms) — the server-side to_timestamp cast
      (db_helpers.py:289) is `timestamp_millis` at read time (F5)
    """
    return (
        raw.where(
            F.col("posted_at").isNotNull()
            & F.col("posted_at.date").isNotNull()
            & F.col("posted_at.timestamp").isNotNull()
        )
        .select(
            company_name.alias("company_name"),
            F.coalesce(F.col("full_urn"), F.col("urn")).alias("urn"),
            F.col("text"),
            F.col("url"),
            F.col("posted_at.date").alias("posted_at_iso"),
            F.col("posted_at.timestamp").alias("posted_at_ts"),
            F.concat_ws(
                " ", F.col("author.first_name"), F.col("author.last_name")
            ).alias("author_name"),
            F.col("author.username").alias("author_profile_id"),
            F.col("author.headline").alias("author_headline"),
            F.col("media.url").alias("image"),
            _i(F.col("stats.total_reactions")).alias("total_reactions"),
            _i(F.col("stats.like")).alias("like_count"),
            _i(F.col("stats.support")).alias("support"),
            _i(F.col("stats.love")).alias("love"),
            _i(F.col("stats.insight")).alias("insight"),
            _i(F.col("stats.celebrate")).alias("celebrate"),
            _i(F.col("stats.comments")).alias("comments_count"),
            _i(F.col("stats.reposts")).alias("reposts"),
            F.col("post_type").alias("type"),
            _fetched(fetched_at).alias("fetched_at"),
        )
    )


def project_reddit(
    raw: DataFrame, company_name: Column, fetched_at: Column | None = None
) -> DataFrame:
    """Reddit posts (scrapers/reddit_scraper.py:78-99).

    - post_url: permalink → absolute URL (F10, :90)
    - review_date: epoch seconds → ISO-UTC string (F4, :84-88)
    - image_url: preview.images[0].source.url (N5, :96-98)
    """
    d = F.col("data")
    iso = F.concat(
        F.date_format(
            F.timestamp_seconds(d.getField("created_utc").cast("long")),
            "yyyy-MM-dd'T'HH:mm:ss",
        ),
        F.lit("+00:00"),
    )
    return raw.select(
        company_name.alias("company_name"),
        F.concat(F.lit("https://www.reddit.com"), d.getField("permalink")).alias(
            "post_url"
        ),
        d.getField("title").alias("title"),
        d.getField("author").alias("author"),
        F.try_element_at(d.getField("preview").getField("images"), F.lit(1))
        .getField("source")
        .getField("url")
        .alias("image_url"),
        _i(d.getField("score")).alias("votes"),
        _i(d.getField("num_comments")).alias("comments"),
        d.getField("selftext").alias("full_review"),
        iso.alias("review_date"),
        _fetched(fetched_at).alias("fetched_at"),
    )


def project_trustpilot(
    raw: DataFrame,
    company_name: Column,
    company_web_address: Column,
    fetched_at: Column | None = None,
) -> DataFrame:
    """Trustpilot reviews (scrapers/trustpilot_scraper.py:56-91).

    - rating: 'Rated 4 out of 5 stars' alt text → int (F8, :74-79)
    - review_date: 'd MMMM yyyy' parse, NULL on failure (F1,
      utils/date_utils.py:5-13)
    - whitespace strip on every HTML-derived field (F9)
    """
    return raw.select(
        company_name.alias("company_name"),
        company_web_address.alias("company_web_address"),
        F.trim(F.col("author_name")).alias("author_name"),
        rating_from_alt(F.trim(F.col("rating_alt"))).alias("rating"),
        F.trim(F.col("review_title")).alias("review_title"),
        F.trim(F.col("review_body")).alias("review_body"),
        parse_long_date(F.trim(F.col("review_date_raw"))).alias("review_date"),
        _fetched(fetched_at).alias("fetched_at"),
    )


def project_feefo(
    raw: DataFrame,
    company_name: Column,
    feefo_business_info: Column,
    fetched_at: Column | None = None,
) -> DataFrame:
    """Feefo reviews (scrapers/feefo_scraper.py:36-71): dd/MM/yyyy date
    after 'Date of purchase: ' prefix strip (F2, :51-57)."""
    return raw.select(
        company_name.alias("company_name"),
        feefo_business_info.alias("feefo_business_info"),
        F.trim(F.col("customer_name")).alias("customer_name"),
        F.trim(F.col("service_review")).alias("service_review"),
        F.trim(F.col("product_review")).alias("product_review"),
        F.trim(F.col("customer_location")).alias("customer_location"),
        parse_purchase_date(F.trim(F.col("review_date_raw"))).alias("review_date"),
        _fetched(fetched_at).alias("fetched_at"),
    )


def project_google_maps(
    raw: DataFrame,
    company_name: Column,
    place_url: Column,
    fetched_at: Column | None = None,
) -> DataFrame:
    """Google Maps reviews (scrapers/google_maps_scraper.py:53-80):
    straight projection with ISO passthrough dates."""
    return raw.select(
        company_name.alias("company_name"),
        place_url.alias("place_url"),
        F.col("name").alias("reviewer_name"),
        F.col("stars").alias("rating"),
        F.col("text").alias("review_text"),
        F.col("publishedAtDate").alias("review_date"),
        F.col("reviewUrl"),
        F.col("responseFromOwnerText").alias("owner_response"),
        _fetched(fetched_at).alias("fetched_at"),
    )


def unified_mentions(platform_frames: dict[str, DataFrame]) -> DataFrame:
    """Conform the per-platform fact tables into ONE mentions stream with
    a `platform` discriminator (U3) — the Spark idiom replacing the
    reference's 8-way Postgres table split."""
    out = None
    for platform, df in platform_frames.items():
        tagged = df.withColumn("platform", F.lit(platform))
        out = tagged if out is None else out.unionByName(tagged, allowMissingColumns=True)
    return out
