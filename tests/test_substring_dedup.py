"""Property tests for the exact-substring dedup pair (Lee et al. 2022:
detect spans, cut spans) and the hashed linear quality classifier —
invariants the hash-parity oracle can't express directly."""

from pyspark.sql import functions as F

from backend_etl_spark.operators.dedup import (
    cut_substring_spans,
    duplicate_substring_spans,
)
from backend_etl_spark.operators.textops import hashed_linear_quality

K = 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_spans_detect_cross_doc_duplicate_at_any_offset(spark):
    # the 4-gram "w x y z" is shared, but at DIFFERENT offsets — the
    # property fixed-stride passage hashing misses and this op must not
    df = _docs(
        spark,
        [
            ("a", "w x y z p q r s"),
            ("b", "m n w x y z t u"),
        ],
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in duplicate_substring_spans(df, k=K).collect()
    }
    assert spans == {"a": (0, 3), "b": (2, 5)}


def test_spans_merge_overlapping_hits_into_maximal_intervals(spark):
    # a 6-token duplicated run yields three overlapping 4-gram hits per
    # doc; they must merge into ONE maximal span covering all 6 tokens
    df = _docs(
        spark,
        [
            ("a", "d1 d2 d3 d4 d5 d6 only in a"),
            ("b", "other stuff d1 d2 d3 d4 d5 d6"),
        ],
    )
    out = duplicate_substring_spans(df, k=K).collect()
    per_doc = {r["doc_id"]: r for r in out}
    assert len(out) == 2
    assert per_doc["a"]["span_start"] == 0 and per_doc["a"]["span_end"] == 5
    assert per_doc["b"]["span_start"] == 2 and per_doc["b"]["span_end"] == 7


def test_spans_within_doc_repeat_counts_as_duplicate(spark):
    # Lee et al. count a substring occurring twice in the SAME doc
    df = _docs(spark, [("a", "r1 r2 r3 r4 gap r1 r2 r3 r4")])
    out = sorted(
        duplicate_substring_spans(df, k=K).collect(),
        key=lambda r: r["span_start"],
    )
    assert [(r["span_start"], r["span_end"]) for r in out] == [(0, 3), (5, 8)]


def test_spans_disjoint_sorted_and_at_least_k_wide(spark, sf_dir):
    from backend_etl_spark.sources.loader import load_table

    docs = load_table(spark, sf_dir, "documents")
    spans = duplicate_substring_spans(docs, k=8)
    bad_width = spans.where(
        F.col("span_end") - F.col("span_start") + 1 < 8
    ).count()
    assert bad_width == 0
    # no two spans of one doc touch or overlap (they would have merged)
    a, b = spans.alias("a"), spans.alias("b")
    overlapping = (
        a.join(b, "doc_id")
        .where(F.col("a.span_start") < F.col("b.span_start"))
        .where(F.col("b.span_start") <= F.col("a.span_end") + 1)
        .count()
    )
    assert overlapping == 0


def test_cut_conserves_tokens_and_reconstructs(spark, sf_dir):
    from backend_etl_spark.functions.scalars import tokens
    from backend_etl_spark.sources.loader import load_table

    docs = load_table(spark, sf_dir, "documents")
    cut = cut_substring_spans(docs, k=8)
    spans = duplicate_substring_spans(docs, k=8)
    # tokens_removed == total width of the doc's merged spans
    widths = spans.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("w")
    )
    mismatch = (
        cut.join(widths, "doc_id", "left")
        .where(F.col("tokens_removed") != F.coalesce(F.col("w"), F.lit(0)))
        .count()
    )
    assert mismatch == 0
    # tokens survive the cut+rejoin roundtrip: re-tokenizing clean_text
    # yields exactly n_tokens - tokens_removed tokens (tokens carry no
    # whitespace, so concat_ws/split is lossless)
    bad = cut.where(
        F.size(tokens(F.col("clean_text")))
        != F.col("n_tokens") - F.col("tokens_removed")
    ).count()
    assert bad == 0


def test_quality_classifier_decision_matches_logit_sign(spark, sf_dir):
    from backend_etl_spark.sources.loader import load_table

    docs = load_table(spark, sf_dir, "documents")
    q = hashed_linear_quality(docs)
    bad = q.where(
        (F.col("keep") != (F.col("quality_logit") >= 0))
        | (F.col("quality_score") <= 0)
        | (F.col("quality_score") >= 1)
    ).count()
    assert bad == 0
    # single-token doc: logit is that token's weight/10 exactly
    one = hashed_linear_quality(
        _docs(spark, [("x", "hello")])
    ).collect()[0]
    assert one["n_tokens"] == 1
    assert abs(one["quality_logit"]) <= 1.0
