"""Schemas for the reference's data model (FIXTURES.md §A): the control
dimension, the 8 per-platform fact tables (implicit in the reference's
INSERT column lists, utils/db_helpers.py:92-301), and the raw source
payload shapes the scrapers consume (§A3).

Raw payloads are first-class ARRAY/STRUCT types here — the reference
held them only transiently as Python dicts; the engine makes them
columns so flattening is Catalyst work, not dict-walking.
"""

# control dimension — utils/db_helpers.py:55,70
USERS_DDL = """
    id BIGINT NOT NULL, company_name STRING NOT NULL, company_web_address STRING,
    instagram_username STRING, twitter_username STRING, facebook_username STRING,
    linkedin_username STRING, feefo_business_info STRING, place_url STRING,
    last_fetched_trustpilot TIMESTAMP, last_fetched_twitter TIMESTAMP,
    last_fetched_twitter2 TIMESTAMP, last_fetched_twitter3 TIMESTAMP,
    last_fetched_instagram TIMESTAMP, last_fetched_feefo TIMESTAMP,
    last_fetched_google_maps TIMESTAMP, last_fetched_reddit TIMESTAMP,
    last_fetched_facebook TIMESTAMP, last_fetched_linkedin TIMESTAMP
"""

# fact tables — dedup keys in DEDUP_KEYS below
TWITTER_MENTIONS_DDL = """
    tweet_id STRING, company_name STRING, twitter_url STRING, text STRING,
    author_handle STRING, created_at TIMESTAMP, reply_count INT, retweet_count INT,
    like_count INT, view_count INT, image STRING, videourl STRING, fetched_at TIMESTAMP
"""

INSTAGRAM_MENTIONS_DDL = """
    post_id STRING, company_name STRING, caption STRING, author_handle STRING,
    created_at TIMESTAMP, like_count INT, comment_count INT, fetched_at TIMESTAMP,
    image STRING, videourl STRING
"""

TRUSTPILOT_REVIEWS_DDL = """
    company_name STRING, company_web_address STRING, author_name STRING, rating INT,
    review_title STRING, review_body STRING, review_date DATE, fetched_at TIMESTAMP
"""

FEEFO_REVIEWS_DDL = """
    company_name STRING, feefo_business_info STRING, customer_name STRING,
    service_review STRING, product_review STRING, customer_location STRING,
    review_date DATE, fetched_at TIMESTAMP
"""

GOOGLE_MAPS_REVIEWS_DDL = """
    company_name STRING, place_url STRING, reviewer_name STRING, rating DOUBLE,
    review_text STRING, review_date STRING, reviewUrl STRING, owner_response STRING,
    fetched_at TIMESTAMP
"""

REDDIT_POSTS_DDL = """
    company_name STRING, post_url STRING, title STRING, author STRING,
    image_url STRING, votes INT, comments INT, full_review STRING,
    review_date STRING, fetched_at TIMESTAMP
"""

FACEBOOK_POSTS_DDL = """
    post_id STRING, company_name STRING, facebook_username STRING, message STRING,
    created_at STRING, reactions_count INT, comments_count INT, author_name STRING,
    image STRING, share_count INT, post_url STRING, fetched_at TIMESTAMP
"""

LINKEDIN_POSTS_DDL = """
    company_name STRING, urn STRING, text STRING, url STRING, posted_at_iso STRING,
    posted_at_ts BIGINT, author_name STRING, author_profile_id STRING,
    author_headline STRING, image STRING, total_reactions INT, like_count INT,
    support INT, love INT, insight INT, celebrate INT, comments_count INT,
    reposts INT, type STRING, fetched_at TIMESTAMP
"""

#: natural dedup keys (ON CONFLICT targets, utils/db_helpers.py:92-301)
DEDUP_KEYS = {
    "twitter_mentions": ["tweet_id"],
    "instagram_mentions": ["post_id"],
    "trustpilot_reviews": ["company_name", "author_name", "review_title", "review_date"],
    "feefo_reviews": [
        "company_name", "feefo_business_info", "customer_name", "service_review",
        "review_date",
    ],
    "google_maps_reviews": ["place_url", "reviewer_name", "reviewUrl"],
    "reddit_posts": ["company_name", "post_url", "review_date"],
    "facebook_posts": ["post_id"],
    "linkedin_posts": ["company_name", "urn"],
}

#: per-platform dispatch handle on the users dim — the column whose
#: NULL-ness makes the reference skip a tenant entirely (P10,
#: tasks.py:124-126 `if not user.twitter_username: continue` et al.)
HANDLE_COLS = {
    "twitter": "twitter_username",
    "instagram": "instagram_username",
    "facebook": "facebook_username",
    "linkedin": "linkedin_username",
    "feefo": "feefo_business_info",
    "google_maps": "place_url",
    "trustpilot": "company_web_address",
    "reddit": "company_name",  # reddit searches by brand name (reddit_scraper.py)
}

# raw source payload shapes — FIXTURES.md §A3

TWITTER_RAW_DDL = """
    id STRING, url STRING, text STRING, createdAt STRING,
    retweetCount INT, replyCount INT, likeCount INT, viewCount INT,
    author STRUCT<name: STRING>,
    media ARRAY<STRUCT<expanded_url: STRING>>,
    extendedEntities STRUCT<media: ARRAY<STRUCT<
        type: STRING,
        videoInfo: STRUCT<variants: ARRAY<STRUCT<url: STRING>>>>>>
"""

# Apify author-timeline shape (twitter2_scraper.py:49-63): flat keys,
# ISO createdAt, only replyCount among the counters. The requested
# handle is request context, not payload — carried as a column here.
TWITTER2_RAW_DDL = """
    id STRING, text STRING, createdAt STRING, replyCount INT,
    requested_handle STRING
"""

# snscrape timeline shape (twitter3_scraper.py:41-58): numeric id,
# `content` text, nested user.username, ISO date.
TWITTER3_RAW_DDL = """
    id BIGINT, content STRING, date STRING,
    user STRUCT<username: STRING>,
    replyCount INT, likeCount INT
"""

_IG_POST = (
    "STRUCT<id: STRING, shortCode: STRING, description: STRING, caption: STRING, "
    "username: STRING, ownerUsername: STRING, publishedAt: STRING, timestamp: STRING, "
    "likesCount: INT, like_count: INT, commentsCount: INT, comment_count: INT, "
    "videoUrl: STRING, video_url: STRING, images: STRING>"
)

INSTAGRAM_RAW_DDL = f"""
    error STRING,
    topPosts ARRAY<{_IG_POST}>, latestPosts ARRAY<{_IG_POST}>, items ARRAY<{_IG_POST}>,
    id STRING, shortCode STRING, description STRING, caption STRING,
    username STRING, ownerUsername STRING, publishedAt STRING, timestamp STRING,
    likesCount INT, like_count INT, commentsCount INT, comment_count INT,
    videoUrl STRING, video_url STRING, images STRING
"""

FACEBOOK_RAW_DDL = """
    postFacebookId STRING, postId STRING, text STRING, time STRING, url STRING,
    likes INT, comments INT, shares INT,
    textReferences ARRAY<STRUCT<short_name: STRING, shortname: STRING>>,
    media ARRAY<STRUCT<photo_image: STRUCT<url: STRING>,
                       image: STRUCT<uri: STRING, url: STRING>>>
"""

LINKEDIN_RAW_DDL = """
    urn STRING, full_urn STRING, text STRING, url STRING, post_type STRING,
    posted_at STRUCT<date: STRING, timestamp: BIGINT>,
    author STRUCT<first_name: STRING, last_name: STRING, username: STRING,
                  headline: STRING>,
    media STRUCT<url: STRING>,
    stats STRUCT<total_reactions: INT, like: INT, support: INT, love: INT,
                 insight: INT, celebrate: INT, comments: INT, reposts: INT>
"""

REDDIT_RAW_DDL = """
    data STRUCT<permalink: STRING, title: STRING, author: STRING,
                score: INT, num_comments: INT, created_utc: DOUBLE,
                selftext: STRING,
                preview: STRUCT<images: ARRAY<STRUCT<source: STRUCT<url: STRING>>>>>
"""

TRUSTPILOT_RAW_DDL = """
    author_name STRING, rating_alt STRING, review_title STRING,
    review_body STRING, review_date_raw STRING
"""

FEEFO_RAW_DDL = """
    customer_name STRING, service_review STRING, product_review STRING,
    customer_location STRING, review_date_raw STRING
"""

GOOGLE_MAPS_RAW_DDL = """
    name STRING, stars DOUBLE, text STRING, publishedAtDate STRING,
    reviewUrl STRING, responseFromOwnerText STRING
"""
