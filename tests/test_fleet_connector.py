"""Set-based fleet ingest (X1 done right), P10 dispatch guard, W6
bounded retry/backoff, and W8 stream rate limiting."""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from backend_etl_spark.ingest.feed_pipeline import (
    _FLEET_USERS_DDL,
    ingest_feed_fleet,
)
from backend_etl_spark.sink import WatermarkStore
from backend_etl_spark.sources.datasource import FixtureFeedDataSource

AS_OF = dt.datetime(2024, 1, 1)


def _twitter_item(i: int, ts: str = "Mon Nov 13 22:13:20 +0000 2023") -> str:
    return json.dumps(
        {"id": f"t{i}", "url": f"u{i}", "text": f"tweet {i}", "createdAt": ts,
         "author": {"name": "a"}}
    )


def _reddit_item(i: int) -> str:
    return json.dumps(
        {"data": {"permalink": f"/r/x/{i}", "title": f"T{i}", "author": "u/a",
                  "score": i, "num_comments": 0, "created_utc": 1700000000.0 + i}}
    )


@pytest.fixture()
def users(spark):
    # tenant 3 has NO twitter handle (P10 target) but has company_name
    rows = [
        {"id": 1, "company_name": "Acme", "twitter_username": "acme_hq"},
        {"id": 2, "company_name": "Globex", "twitter_username": "globex"},
        {"id": 3, "company_name": "Initech", "twitter_username": None},
    ]
    return spark.createDataFrame(rows, _FLEET_USERS_DDL)


def test_fleet_tick_three_tenants_two_platforms(spark, users, tmp_path):
    """One set-based tick per platform covers the fleet: per-tenant
    watermarks advance independently, the handle-less tenant is skipped
    entirely (no rows, no watermark), and redelivery is absorbed."""
    state = WatermarkStore(spark, str(tmp_path / "wm"))
    feeds_tw, feeds_rd = {}, {}
    for tid in (1, 2, 3):
        d = tmp_path / f"tw_{tid}"
        d.mkdir()
        (d / "page_0000.jsonl").write_text(
            "\n".join(_twitter_item(tid * 10 + i) for i in range(3))
        )
        feeds_tw[tid] = str(d)
        d = tmp_path / f"rd_{tid}"
        d.mkdir()
        (d / "page_0000.jsonl").write_text(_reddit_item(tid))
        feeds_rd[tid] = str(d)

    sink_tw = str(tmp_path / "sink_tw")
    out = ingest_feed_fleet(
        spark, "twitter", feeds_tw, sink_tw, state, users, AS_OF
    )
    # P10: tenant 3 (no handle) contributes nothing and gains no watermark
    assert out["appended"] == 6 and out["advanced"] == [1, 2]
    assert state.get(3, "twitter") is None
    assert state.get(1, "twitter") == AS_OF and state.get(2, "twitter") == AS_OF
    sunk = spark.read.parquet(sink_tw)
    assert sunk.count() == 6
    by_co = {r["company_name"]: r["cnt"] for r in
             sunk.groupBy("company_name").agg(F.count("*").alias("cnt")).collect()}
    assert by_co == {"Acme": 3, "Globex": 3}  # dim stamped per tenant

    # second platform: reddit dispatches on company_name (all 3 eligible)
    sink_rd = str(tmp_path / "sink_rd")
    out = ingest_feed_fleet(
        spark, "reddit", feeds_rd, sink_rd, state, users, AS_OF
    )
    assert out["appended"] == 3 and out["advanced"] == [1, 2, 3]
    assert state.get(3, "reddit") == AS_OF
    assert state.get(3, "twitter") is None  # per-(tenant, platform) isolation

    # redelivery tick: watermark = as_of → empty window → no-op
    out = ingest_feed_fleet(
        spark, "twitter", feeds_tw, sink_tw, state, users, AS_OF
    )
    assert out["appended"] == 0 and out["advanced"] == []
    assert spark.read.parquet(sink_tw).count() == 6


def test_fleet_all_tenants_handleless_is_noop(spark, tmp_path):
    state = WatermarkStore(spark, str(tmp_path / "wm"))
    users = spark.createDataFrame(
        [{"id": 5, "company_name": "NoHandle", "twitter_username": None}],
        _FLEET_USERS_DDL,
    )
    d = tmp_path / "feed"
    d.mkdir()
    (d / "p0.jsonl").write_text(_twitter_item(1))
    out = ingest_feed_fleet(
        spark, "twitter", {5: str(d)}, str(tmp_path / "sink"), state, users, AS_OF
    )
    assert out == {"appended": 0, "advanced": []}
    assert state.get(5, "twitter") is None


def test_connector_bounded_retry_recovers(spark, tmp_path):
    """W6: a page that fails its first two reads succeeds within the
    retry budget — at-least-once delivery, full row set."""
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "page_0000.jsonl").write_text(
        "\n".join(json.dumps({"id": i}) for i in range(4))
    )
    (feed / "page_0000.jsonl.failures").write_text("2")
    spark.dataSource.register(FixtureFeedDataSource)
    df = (
        spark.read.format("fixture_feed")
        .option("path", str(feed))
        .option("max_retries", "3")
        .option("retry_backoff_s", "0.0")
        .load()
    )
    assert df.count() == 4
    assert (feed / "page_0000.jsonl.failures").read_text() == "0"


def test_connector_retry_budget_exhausted_fails(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "page_0000.jsonl").write_text(json.dumps({"id": 1}))
    (feed / "page_0000.jsonl.failures").write_text("5")
    spark.dataSource.register(FixtureFeedDataSource)
    df = (
        spark.read.format("fixture_feed")
        .option("path", str(feed))
        .option("max_retries", "1")
        .option("retry_backoff_s", "0.0")
        .load()
    )
    with pytest.raises(Exception):
        df.count()


def test_stream_max_pages_per_trigger(spark, tmp_path):
    """W8: max_pages_per_trigger bounds each micro-batch of the cursor
    stream (the maxOffsetsPerTrigger analog). The simple stream reader
    executes one batch per start (no availableNow loop), so each drain
    against the same checkpoint consumes at most 2 of the 5 pages —
    exactly 3 drains reach the full sink, and the result matches an
    unthrottled drain."""
    feed = tmp_path / "feed"
    feed.mkdir()
    for p in range(5):
        (feed / f"page_{p:04d}.jsonl").write_text(
            "\n".join(json.dumps({"id": p * 10 + i}) for i in range(2))
        )
    spark.dataSource.register(FixtureFeedDataSource)

    def drain(sink, ckpt, throttled: bool):
        reader = (
            spark.readStream.format("fixture_feed").option("path", str(feed))
        )
        if throttled:
            reader = reader.option("max_pages_per_trigger", "2")
        (
            reader.load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)  # falls back to one batch per start
            .start()
            .awaitTermination()
        )

    s1, c1 = str(tmp_path / "s1"), str(tmp_path / "c1")
    counts = []
    for _ in range(5):
        drain(s1, c1, throttled=True)
        counts.append(spark.read.parquet(s1).count())
        if counts[-1] == 10:
            break
    # bounded steps: 2 pages (4 rows) per drain, 3 drains to finish
    assert counts == [4, 8, 10]

    drain(str(tmp_path / "s2"), str(tmp_path / "c2"), throttled=False)
    b = spark.read.parquet(str(tmp_path / "s2"))
    ids = lambda df: sorted(json.loads(r["item"])["id"] for r in df.collect())
    assert ids(spark.read.parquet(s1)) == ids(b)
    assert b.count() == 10  # unthrottled: one gulp


def test_search_query_template_roundtrip_and_pushdown(spark, tmp_path):
    """F11: the reference-shaped query string is built, parsed back, and
    drives the SAME time-window pushdown as explicit since/until."""
    from backend_etl_spark.functions.query_template import (
        parse_search_query,
        reddit_queries,
        twitter_search_query,
    )

    since = dt.datetime(2023, 11, 1, 0, 0, 0)
    until = dt.datetime(2023, 12, 1, 0, 0, 0)
    q = twitter_search_query("acme_hq", since, until)
    # exact reference rendering (twitter_scraper.py:27,57-59)
    assert q == ("@acme_hq OR #acme_hq "
                 "since:2023-11-01_00:00:00_UTC until:2023-12-01_00:00:00_UTC")
    parsed = parse_search_query(q)
    assert parsed == {"username": "acme_hq", "since": since, "until": until}
    assert reddit_queries("acme.com") == ["url:acme.com", "acme.com"]
    with pytest.raises(ValueError):
        parse_search_query("plain text")
    with pytest.raises(ValueError):
        parse_search_query("@a OR #b since:x until:y")

    feed = tmp_path / "feed"
    feed.mkdir()
    with open(feed / "page_000.jsonl", "w") as fh:
        for day, i in [("10-15", 0), ("11-15", 1), ("11-20", 2), ("12-15", 3)]:
            fh.write(json.dumps({"id": i, "createdAt": f"2023-{day}T12:00:00"}) + "\n")
    spark.dataSource.register(FixtureFeedDataSource)

    def load(**opts):
        r = spark.read.format("fixture_feed").option("path", str(feed)).option(
            "ts_key", "createdAt"
        )
        for k, v in opts.items():
            r = r.option(k, v)
        return {json.loads(row["item"])["id"] for row in r.load().collect()}

    via_query = load(search_query=q)
    via_options = load(since=since.isoformat(), until=until.isoformat())
    assert via_query == via_options == {1, 2}
