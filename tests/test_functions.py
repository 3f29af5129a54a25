"""Golden tests for the scalar parsing layer (SURVEY §2.5 F1-F8) on
literal fixtures — the four timestamp encodings, the two date formats,
rating parse, normalization. Mirrors FIXTURES.md §A3 raw payload shapes."""

import datetime as dt

from pyspark.sql import functions as F

from backend_etl_spark.functions.scalars import (
    epoch_millis_ts,
    epoch_seconds_ts,
    normalize_text,
    parse_ctime_utc,
    parse_long_date,
    parse_purchase_date,
    rating_from_alt,
)
from backend_etl_spark.operators.asof import asof_join


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_parse_long_date(spark):
    assert one(spark, parse_long_date(F.lit("23 January 2025"))) == dt.date(2025, 1, 23)
    assert one(spark, parse_long_date(F.lit("not a date"))) is None  # F1 null-on-fail


def test_parse_purchase_date(spark):
    got = one(spark, parse_purchase_date(F.lit("Date of purchase: 05/03/2025")))
    assert got == dt.date(2025, 3, 5)
    # bare form (no prefix) also parses
    assert one(spark, parse_purchase_date(F.lit("05/03/2025"))) == dt.date(2025, 3, 5)


def test_parse_ctime(spark):
    got = one(spark, parse_ctime_utc(F.lit("Mon Nov 13 22:13:20 2023")))
    assert got == dt.datetime(2023, 11, 13, 22, 13, 20)


def test_epoch_conversions(spark):
    assert one(spark, epoch_seconds_ts(F.lit(1700000000))) == dt.datetime(
        2023, 11, 14, 22, 13, 20
    )
    assert one(spark, epoch_millis_ts(F.lit(1700000000500))) == dt.datetime(
        2023, 11, 14, 22, 13, 20, 500000
    )


def test_rating_from_alt(spark):
    assert one(spark, rating_from_alt(F.lit("Rated 4 out of 5 stars"))) == 4


def test_normalize_text(spark):
    assert one(spark, normalize_text(F.lit("  Hello   WORLD \t x "))) == "hello world x"


def test_asof_join_literal(spark):
    quotes = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (2, 15, 5.0)], "k INT, t INT, px DOUBLE"
    )
    trades = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 25), (2, 14), (3, 99)], "k INT, t INT"
    )
    out = {
        (r["k"], r["t"]): (r["asof_t"], r["asof_px"])
        for r in asof_join(
            trades, quotes, on="k", left_ts="t", right_ts="t", value_cols=["px"]
        ).collect()
    }
    assert out[(1, 5)] == (None, None)      # no quote yet
    assert out[(1, 10)] == (10, 1.0)        # equal ts matches (<=)
    assert out[(1, 25)] == (20, 2.0)        # latest prior
    assert out[(2, 14)] == (None, None)
    assert out[(3, 99)] == (None, None)     # key with no right rows


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """The r6 bounded-error restructure: the entry now emits the exact
    distinct count plus within-3rsd booleans at two precisions; every
    flag must be True and the exact side must match a direct batch
    count (the sketch runs only inside the entry)."""
    from backend_etl_spark.catalog import REGISTRY
    from backend_etl_spark.sources.loader import load_table

    rows = REGISTRY["agg_approx_count_distinct"].fn(spark, sf_dir).collect()
    got = {r["event_type"]: r for r in rows}
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert got[k]["exact_users"] == n
        assert got[k]["within_3rsd_fine"] is True
        assert got[k]["within_3rsd_coarse"] is True


def test_multimodal_frame_sample_shapes(spark):
    from backend_etl_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, "a" * 300), (2, "b" * 64), (3, "c")], "doc_id bigint, text string"
    )
    rows = {
        (r["doc_id"], r["frame_idx"]): (r["frame_len"], r["frame_md5"])
        for r in multimodal.frame_sample(df).collect()
    }
    # 300 bytes -> frames 0..4, keep 0 and 4; 64 -> frame 0; 1 -> frame 0
    assert set(rows) == {(1, 0), (1, 4), (2, 0), (3, 0)}
    assert rows[(1, 0)][0] == 64
    assert rows[(1, 4)][0] == 300 - 4 * 64
    assert rows[(3, 0)][0] == 1
    import hashlib

    assert rows[(2, 0)][1] == hashlib.md5(b"b" * 64).hexdigest()


def test_multimodal_fake_embed_deterministic(spark):
    import hashlib

    from backend_etl_spark.operators import multimodal

    df = spark.createDataFrame([(7, "hello world")], "doc_id bigint, text string")
    got = {
        r["feat_idx"]: r["feat_q"] for r in multimodal.extract_features(df).collect()
    }
    h = hashlib.md5(b"hello world").hexdigest()
    assert got == {k: int(h[4 * k : 4 * k + 4], 16) for k in range(4)}


def test_multimodal_decode_honesty():
    """decode_image / decode_audio / decode_video are REAL for the
    codec-free formats (PPM, PCM WAV, DIB-in-AVI) and reject what they
    can't truly parse (PNG, mp3, compressed AVI streams)."""
    import pytest as _pytest

    from backend_etl_spark.operators import multimodal

    with _pytest.raises(ValueError):
        multimodal.decode_video(b"\x00")  # not RIFF: refuse
    with _pytest.raises(ValueError):
        multimodal.decode_image(b"\x89PNG\r\n")  # PNG needs PIL: refuse
    with _pytest.raises(Exception):
        multimodal.decode_audio(b"ID3\x04mp3data")  # mp3: refuse


def _mini_avi(frames: list[bytes], w: int, h: int, chunk_id: bytes = b"00db",
              declared_frames: int | None = None) -> bytes:
    """Minimal spec-conformant AVI: RIFF(avih-only hdrl + movi)."""
    import struct

    n = len(frames) if declared_frames is None else declared_frames
    avih = struct.pack("<14I", 40000, 0, 0, 0, n, 0, 1, 0, w, h, 0, 0, 0, 0)
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl" \
        + b"avih" + struct.pack("<I", len(avih)) + avih
    movi_body = b"".join(
        chunk_id + struct.pack("<I", len(fr)) + fr + (b"\x00" if len(fr) & 1 else b"")
        for fr in frames
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_video_real_avi():
    import pytest as _pytest

    from backend_etl_spark.operators.multimodal import decode_video

    frames = [bytes(range(24)), bytes(range(24, 48))]
    vid = decode_video(_mini_avi(frames, w=4, h=2))
    assert (vid["width"], vid["height"], vid["n_frames"]) == (4, 2, 2)
    assert vid["frames"] == frames
    # odd-sized chunks must honor the RIFF even-padding rule
    odd = [b"\x01\x02\x03", b"\x04\x05\x06"]
    assert decode_video(_mini_avi(odd, w=1, h=1))["frames"] == odd
    # compressed streams ('00dc') refuse: codec libraries absent
    with _pytest.raises(ValueError, match="00dc"):
        decode_video(_mini_avi(frames, w=4, h=2, chunk_id=b"00dc"))
    # header/movi disagreement is a parse error, not silent truncation
    with _pytest.raises(ValueError, match="mismatch"):
        decode_video(_mini_avi(frames, w=4, h=2, declared_frames=3))


def test_decode_image_real_ppm():
    from backend_etl_spark.operators.multimodal import decode_image

    pixels = bytes(range(2 * 2 * 3))
    ppm = b"P6\n# a comment\n2 2\n255\n" + pixels
    img = decode_image(ppm)
    assert (img["width"], img["height"], img["maxval"]) == (2, 2, 255)
    assert img["pixels"] == pixels
    # truncated payload refused
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_image(b"P6\n2 2\n255\n\x00\x01")


def test_decode_audio_real_wav():
    import io
    import struct
    import wave

    from backend_etl_spark.operators.multimodal import decode_audio

    samples = [0, 1000, -1000, 32767, -32768]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    a = decode_audio(buf.getvalue())
    assert a["n_channels"] == 1 and a["sample_rate"] == 16000
    assert a["n_samples"] == 5 and list(a["samples"]) == samples


def test_asof_forward_ties_and_tolerance(spark):
    import datetime as dt

    from backend_etl_spark.operators.asof import asof_join

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t("2024-01-01 10:00:00")), (2, t("2024-01-01 12:00:00"))],
        "k bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, t("2024-01-01 10:00:00"), "tie"),      # equal ts: >= includes it
            (1, t("2024-01-01 11:00:00"), "later"),
            (2, t("2024-01-01 14:00:01"), "too-far"),  # 2h1s > 2h tolerance
        ],
        "k bigint, ts timestamp, tag string",
    )
    out = {
        r["k"]: (r["asof_ts"], r["asof_tag"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["tag"], direction="forward", tolerance_s=7200,
        ).collect()
    }
    assert out[1] == (t("2024-01-01 10:00:00"), "tie")
    assert out[2] == (None, None)

    # backward on the same data: k=1 at 10:00 matches the tie too
    back = {
        r["k"]: r["asof_tag"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["tag"], direction="backward",
        ).collect()
    }
    assert back[1] == "tie"
    assert back[2] is None  # no right row <= 12:00 for k=2... except none exist


def test_approx_aggregates_within_error_bounds(spark, sf_dir):
    """The approximate aggregates (rows-only in the oracle harness) are
    bounded here against their exact counterparts."""
    from backend_etl_spark.sources.loader import load_table

    orders = load_table(spark, sf_dir, "orders")
    exact = orders.select(F.countDistinct("o_custkey")).collect()[0][0]
    approx = orders.select(F.approx_count_distinct("o_custkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05

    exact_p50 = orders.select(F.expr("percentile(o_totalprice, 0.5)")).collect()[0][0]
    approx_p50 = orders.select(
        F.percentile_approx("o_totalprice", 0.5, 10000)
    ).collect()[0][0]
    assert abs(approx_p50 - exact_p50) / exact_p50 < 0.02


def test_binned_interval_join_boundaries(spark):
    """Band is (left-band, left]: the exact lower bound is excluded, the
    exact left ts included; bucket-boundary crossings are found."""
    import datetime as dt

    from backend_etl_spark.operators.interval import binned_interval_join

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t("2024-01-01 10:05:00"))], "lid bigint, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, t("2024-01-01 10:00:00")),  # exactly lts - 300s -> excluded
            (11, t("2024-01-01 10:00:01")),  # just inside
            (12, t("2024-01-01 10:05:00")),  # exactly lts -> included
            (13, t("2024-01-01 10:05:01")),  # after -> excluded
            (14, t("2024-01-01 10:04:59")),  # previous 5-min bucket, inside band
        ],
        "rid bigint, rts timestamp",
    )
    got = {
        r["rid"]
        for r in binned_interval_join(left, right, "lts", "rts", band_s=300, how="inner").collect()
    }
    assert got == {11, 12, 14}

    # left join keeps the left row even with zero matches
    far = spark.createDataFrame([(99, t("2020-01-01 00:00:00"))], "rid bigint, rts timestamp")
    out = binned_interval_join(left, far, "lts", "rts", band_s=300, how="left").collect()
    assert len(out) == 1 and out[0]["rid"] is None


def test_token_budget_pack_boundary(spark):
    """Budget is inclusive: the doc that exactly fills it stays, the next
    (lower-quality) doc falls out."""
    from pyspark.sql import functions as F2

    from backend_etl_spark.operators.curation import token_budget_pack

    df = spark.createDataFrame(
        [(1, 40, 0.9), (2, 60, 0.8), (3, 10, 0.7)],
        "id bigint, n_tokens bigint, q double",
    )
    kept = {
        r["id"]
        for r in token_budget_pack(df, "id", "n_tokens", F2.col("q"), budget=100).collect()
    }
    assert kept == {1, 2}  # 40 + 60 == budget; doc 3 would exceed it


def test_binned_interval_count_check_unique(spark):
    """r9 advice: under duplicate key_cols the aggregate-pushdown form
    silently hands every duplicate left row the MERGED per-key count —
    check_unique=True must refuse instead of mis-counting."""
    import datetime as dt

    import pytest as _pytest

    from backend_etl_spark.operators.interval import binned_interval_count

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    right = spark.createDataFrame(
        [(1, t("2024-01-01 10:04:00"))], "rid bigint, rts timestamp"
    )
    uniq = spark.createDataFrame(
        [(1, t("2024-01-01 10:05:00")), (2, t("2024-01-01 11:00:00"))],
        "lid bigint, lts timestamp",
    )
    out = {
        r["lid"]: r["n_in_band"]
        for r in binned_interval_count(
            uniq, right, "lts", "rts", 300, ["lid"], check_unique=True
        ).collect()
    }
    assert out == {1: 1, 2: 0}

    dup = spark.createDataFrame(
        [(1, t("2024-01-01 10:05:00")), (1, t("2024-01-01 10:06:00"))],
        "lid bigint, lts timestamp",
    )
    with _pytest.raises(ValueError, match="uniquely identify"):
        binned_interval_count(
            dup, right, "lts", "rts", 300, ["lid"], check_unique=True
        )
