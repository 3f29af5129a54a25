"""Property-based tests (hypothesis): the invariants SURVEY §5.2 calls
for — sink idempotence under arbitrary batches, timestamp-parser
round-trips across the four reference encodings, normalization
invariance of the dedup key, and salted-aggregation equivalence.

Each example batches many generated values into ONE DataFrame so a
property runs a handful of Spark jobs, not one per value.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from backend_etl_spark.functions import scalars
from backend_etl_spark.operators.dedup import content_key
from backend_etl_spark.operators.skew import salted_count_sum
from backend_etl_spark.sink import write_idempotent

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

DT = st.datetimes(
    min_value=dt.datetime(1990, 1, 5),
    max_value=dt.datetime(2037, 12, 25),
).map(lambda d: d.replace(microsecond=0))


@SLOW
@given(st.lists(st.tuples(st.integers(0, 20), st.text(max_size=8)), max_size=30))
def test_sink_idempotent_under_any_batch(spark, tmp_path_factory, batch):
    """Re-writing any batch is a no-op; the sink holds one row per key."""
    path = str(tmp_path_factory.mktemp("sink"))
    df = spark.createDataFrame(batch, "k bigint, payload string") if batch else None
    if df is None:
        return
    n1 = write_idempotent(df, path, ["k"])
    distinct_keys = len({k for k, _ in batch})
    assert n1 == distinct_keys
    assert write_idempotent(df, path, ["k"]) == 0  # redelivery -> no-op
    assert spark.read.parquet(path).count() == distinct_keys if batch else True


@SLOW
@given(st.lists(DT, min_size=1, max_size=50))
def test_timestamp_parsers_round_trip(spark, dts):
    """Render each datetime in all four reference encodings, parse with
    the Column helpers, and get the original instant back."""
    rows = [
        (
            d.strftime("%a %b %d %H:%M:%S %Y"),  # ctime, no offset
            d.strftime("%a %b %d %H:%M:%S +0000 %Y"),  # ctime + RFC822
            int(d.replace(tzinfo=dt.timezone.utc).timestamp()),  # epoch s
            int(d.replace(tzinfo=dt.timezone.utc).timestamp()) * 1000,  # epoch ms
            d.strftime("%d %B %Y"),  # '23 January 2025'
            "Date of purchase: " + d.strftime("%d/%m/%Y"),
            d,
        )
        for d in dts
    ]
    df = spark.createDataFrame(
        rows,
        "ctime string, ctime_tz string, es long, ems long, "
        "longdate string, purchase string, want timestamp",
    )
    out = df.select(
        scalars.parse_ctime_utc("ctime").alias("p_ctime"),
        scalars.parse_ctime_utc("ctime_tz").alias("p_ctime_tz"),
        scalars.epoch_seconds_ts("es").alias("p_es"),
        scalars.epoch_millis_ts("ems").alias("p_ems"),
        scalars.parse_long_date("longdate").alias("p_long"),
        scalars.parse_purchase_date("purchase").alias("p_purchase"),
        "want",
    ).collect()
    for r in out:
        assert r["p_ctime"] == r["want"]
        assert r["p_ctime_tz"] == r["want"]
        assert r["p_es"] == r["want"]
        assert r["p_ems"] == r["want"]
        assert r["p_long"] == r["want"].date()
        assert r["p_purchase"] == r["want"].date()


@SLOW
@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    ),
    st.lists(st.sampled_from([" ", "  ", "\t", "\n", " \t "]), min_size=1, max_size=8),
)
def test_content_key_whitespace_and_case_invariant(spark, words, seps):
    """The dedup content key ignores whitespace layout and case — the
    exact-dedup analog of ON CONFLICT key equality."""
    canonical = " ".join(words)
    mangled = ""
    for i, w in enumerate(words):
        mangled += (seps[i % len(seps)] if i else "") + w.upper()
    mangled = seps[-1] + mangled + seps[0]
    df = spark.createDataFrame([(canonical, mangled)], "a string, b string")
    row = df.select(
        content_key(F.col("a")).alias("ka"), content_key(F.col("b")).alias("kb")
    ).collect()[0]
    assert row["ka"] == row["kb"]


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(-1000, 1000)),
        min_size=1,
        max_size=60,
    )
)
def test_salted_agg_matches_direct(spark, rows):
    """Two-stage salted aggregation is exact for count/sum on integers."""
    df = spark.createDataFrame(
        [(k, float(v)) for k, v in rows], "k bigint, v double"
    )
    direct = {
        r["k"]: (r["n"], r["total"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["total"])
        for r in salted_count_sum(df, ["k"], "v").collect()
    }
    assert salted == direct


@SLOW
@given(
    st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=1, max_size=12
    )
)
def test_shingle_count_property(spark, words):
    """#3-shingles == max(0, n_tokens - 2), always."""
    from backend_etl_spark.operators.dedup import shingles

    df = spark.createDataFrame([(" ".join(words),)], "text string")
    (n,) = df.select(F.size(shingles(F.col("text"))).alias("n")).collect()[0]
    assert n == max(0, len(words) - 2)


@SLOW
@given(
    st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=5),
        min_size=1,
        max_size=10,
        unique=True,
    ),
    st.randoms(),
)
def test_simhash_order_and_duplication_invariant(spark, words, rnd):
    """SimHash is computed over DISTINCT tokens: permuting the tokens and
    duplicating some must not change the hash."""
    from backend_etl_spark.operators.dedup import simhash16

    shuffled = list(words)
    rnd.shuffle(shuffled)
    shuffled = shuffled + [rnd.choice(words)]  # duplicate one token
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(shuffled))], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r["simhash16"] for r in simhash16(df, "doc_id", "text").collect()}
    assert out[1] == out[2]


@SLOW
@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=40, unique=True))
def test_md5_uniform_bounds_and_stability(spark, ids):
    """md5_uniform is in [0, 1) and stable across evaluations."""
    from backend_etl_spark.operators.curation import md5_uniform

    df = spark.createDataFrame([(i,) for i in ids], "id bigint")
    a = {r["id"]: r["u"] for r in df.select("id", md5_uniform("id").alias("u")).collect()}
    b = {r["id"]: r["u"] for r in df.select("id", md5_uniform("id").alias("u")).collect()}
    assert a == b
    assert all(0.0 <= v < 1.0 for v in a.values())


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.sampled_from(["en", "de", "fr"])),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 5),
)
def test_stratified_sample_sizes(spark, rows, k):
    """Exactly min(k, |stratum|) rows per stratum, and a subset of input."""
    from collections import Counter

    from backend_etl_spark.operators.curation import stratified_sample

    df = spark.createDataFrame(rows, "id bigint, lang string")
    out = stratified_sample(df, "id", "lang", k).collect()
    want = Counter(lang for _, lang in rows)
    got = Counter(r["lang"] for r in out)
    assert got == Counter({lang: min(k, n) for lang, n in want.items()})
    assert {(r["id"], r["lang"]) for r in out} <= set(rows)


@SLOW
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            max_size=60,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_char_entropy_bounds(spark, texts):
    """0 <= H <= log2(distinct chars) for ANY text; NULL only when the
    normalized text is empty."""
    import math

    from backend_etl_spark.operators.textops import char_entropy

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id BIGINT, text STRING")
    for r in char_entropy(df).collect():
        h, d = r["char_entropy_bits"], r["n_distinct_chars"]
        if r["n_chars_norm"] == 0:
            assert h is None
        else:
            # +5e-5: char_entropy_bits is rounded to 4 dp, which can
            # round UP past the exact log2(d) bound (e.g. '012' ->
            # 1.585 > log2 3)
            assert -1e-9 <= h <= math.log2(max(d, 1)) + 5e-5


def test_pagerank_invariants(spark, sf_dir):
    """PageRank sanity: every node's rank is at least the teleport floor
    0.15/N, and total rank stays ≤ 1 + ε (dangling mass is dropped, so
    the sum can only shrink from 1)."""
    from backend_etl_spark.catalog import REGISTRY

    rows = REGISTRY["graph_pagerank_users"].fn(spark, sf_dir).collect()
    n = len(rows)
    total = sum(r["pagerank"] for r in rows)
    assert all(r["pagerank"] >= 0.15 / n - 1e-6 for r in rows)
    assert total <= 1.0 + 1e-4
    assert total >= 0.15  # teleport mass alone guarantees this


def test_gap_fill_grid_is_complete_and_conservative(spark, sf_dir):
    """Gap fill: the output is the full (type × hour) grid, and the
    zero-filled cells add nothing — per-type event totals equal the raw
    table's."""
    from pyspark.sql import functions as F2

    from backend_etl_spark.catalog import REGISTRY
    from backend_etl_spark.sources.loader import load_table

    out = REGISTRY["timeseries_gap_fill_hourly"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").where(
        (F2.col("ts") >= "2024-01-01") & (F2.col("ts") < "2024-01-31")
    )
    n_types = ev.select("event_type").distinct().count()
    assert out.count() == n_types * 30 * 24
    got = {
        r["event_type"]: r["s"]
        for r in out.groupBy("event_type").agg(F2.sum("n_events").alias("s")).collect()
    }
    want = {
        r["event_type"]: r["s"]
        for r in ev.groupBy("event_type").agg(F2.count(F2.lit(1)).alias("s")).collect()
    }
    assert got == want


def test_ivfpq_recall_bounds(spark, sf_dir):
    """The measured IVF-PQ recall is a valid fraction and the scanned
    fraction is genuinely partial (< 50% of the corpus at nprobe=2/k=8)."""
    from backend_etl_spark.catalog import REGISTRY

    (r,) = REGISTRY["knn_ivfpq_recall"].fn(spark, sf_dir).collect()
    assert 0.0 <= r["recall_at_3"] <= 1.0
    assert 0.0 < r["avg_scanned_frac"] < 0.5
    assert r["n_queries"] == 5


def _py_bpe(texts, n_merges, min_pair_count=2):
    """Pure-Python reference BPE trainer mirroring bpe_train_merges'
    contract: word-frequency table, pair argmax (count desc, lhs␞rhs
    asc), left-to-right non-overlapping within-word merges. Words are
    symbol TUPLES, so crossing a word boundary is impossible by
    construction — a differential mismatch would expose sentinel
    leakage in the Spark implementation."""
    import collections
    import re

    from backend_etl_spark.operators.textops import BPE_PSEP

    freq = collections.Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                freq[tuple(w)] += 1
    cur = dict(freq)
    merges = []
    for rank in range(1, n_merges + 1):
        counts = collections.Counter()
        for syms, f in cur.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] + BPE_PSEP + kv[0][1])
        )
        if cnt < min_pair_count:
            break

        def apply(syms):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return tuple(out)

        nxt = collections.Counter()
        for syms, f in cur.items():
            nxt[apply(syms)] += f
        cur = dict(nxt)
        vocab = {s for syms in cur for s in syms}
        merges.append(
            {
                "merge_rank": rank,
                "lhs": lhs,
                "rhs": rhs,
                "pair_count": cnt,
                "vocab_size_after": len(vocab),
            }
        )
    return merges


def test_bpe_differential_vs_python_reference(spark):
    """The Spark BPE trainer lands on exactly the same merge sequence as
    an independent tuple-of-symbols Python implementation — including on
    text engineered so that a sentinel-crossing bug WOULD change the
    answer ('b a' adjacencies across words must never count toward the
    ('b','a') pair)."""
    from backend_etl_spark.operators.textops import bpe_train_merges

    texts = [
        "abab abab cab",
        "b a b a b a",
        "aa bb aa bb aab",
        "cabbage cab bab",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id BIGINT, text STRING")
    got = bpe_train_merges(df, n_merges=6)
    assert got == _py_bpe(texts, 6)


def test_bpe_converges_with_bounded_merges(spark):
    """n_merges is a production knob: asking for 50 merges on a small
    repetitive corpus completes quickly, stops at the convergence guard
    (best pair count < 2), and never emits a merge seen only once."""
    from backend_etl_spark.operators.textops import bpe_train_merges

    texts = ["the cat sat", "the cat", "sat the"] * 3
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id BIGINT, text STRING")
    got = bpe_train_merges(df, n_merges=50)
    assert 0 < len(got) < 50
    assert all(m["pair_count"] >= 2 for m in got)
    assert got == _py_bpe(texts, 50)


def test_sharded_running_sum_equals_global_window(spark):
    """The two-pass sharded prefix sum is bit-identical to the global
    single-partition window it replaces, for any shard granularity —
    including shards of size 1 and a single shard holding everything."""
    from pyspark.sql import functions as F2
    from pyspark.sql.window import Window

    from backend_etl_spark.operators.curation import sharded_running_sum

    df = (
        spark.range(500)
        .withColumn("h", F2.md5(F2.col("id").cast("string")))
        .withColumn("n", (F2.col("id") * 37) % 113)
    )
    w = Window.orderBy("h", "id").rowsBetween(Window.unboundedPreceding, 0)
    expected = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F2.sum("n").over(w)).collect()
    }
    # shard = integer value of a PREFIX of the ordering key — monotone in
    # the sort order (a modulo of the hash would NOT be and violates the
    # sharded_running_sum contract)
    shards = {
        1: F2.lit(0),
        16: F2.conv(F2.substring("h", 1, 1), 16, 10).cast("int"),
        256: F2.conv(F2.substring("h", 1, 2), 16, 10).cast("int"),
    }
    for nbuckets, shard in shards.items():
        got = {
            r["id"]: r["cum"]
            for r in sharded_running_sum(
                df,
                shard_expr=shard,
                order_by=[F2.col("h"), F2.col("id")],
                value_col="n",
                out_col="cum",
            ).collect()
        }
        assert got == expected, f"nbuckets={nbuckets}"


def test_sharded_running_sum_descending_shards(spark):
    """Descending variant (quality-ordered packing): identical to the
    global quality-desc window."""
    from pyspark.sql import functions as F2
    from pyspark.sql.window import Window

    from backend_etl_spark.operators.curation import sharded_running_sum

    df = (
        spark.range(300)
        .withColumn("q", F2.round((F2.col("id") * 7919 % 97) / 97.0, 6))
        .withColumn("n", (F2.col("id") * 13) % 50)
    )
    w = Window.orderBy(F2.col("q").desc(), F2.col("id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    expected = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F2.sum("n").over(w)).collect()
    }
    got = {
        r["id"]: r["cum"]
        for r in sharded_running_sum(
            df,
            shard_expr=F2.floor(F2.col("q") * 10).cast("bigint"),
            order_by=[F2.col("q").desc(), F2.col("id")],
            value_col="n",
            out_col="cum",
            ascending_shards=False,
        ).collect()
    }
    assert got == expected


def test_pack_sequences_conservation(spark, sf_dir):
    """Packing conserves tokens: offsets stay inside the window, the
    highest sequence id equals floor((total-1)/2048), and every doc's
    span count is consistent with its length and offset."""
    from backend_etl_spark.catalog import REGISTRY

    rows = REGISTRY["pack_sequences_2048"].fn(spark, sf_dir).collect()
    total = sum(r["n_tokens"] for r in rows)
    assert max(r["seq_id"] for r in rows) == (total - 1) // 2048 or total <= 2048
    for r in rows:
        assert 0 <= r["offset_in_seq"] < 2048
        if r["n_tokens"]:
            span = (r["offset_in_seq"] + r["n_tokens"] - 1) // 2048 + 1
        else:
            # a zero-token doc spans 0 sequences, at every offset — the
            # entry normalizes this (both engines), so the value can no
            # longer depend on where the empty doc's offset happens to land
            span = 0
        assert r["n_seqs_spanned"] == span


def test_expression_helpers_equal_relation_forms(spark, sf_dir):
    """textops.char_entropy_bits / repetition_keep (the bare-expression
    forms for inline pipeline filters) must produce EXACTLY the values
    their relation forms (char_entropy / repetition_metrics) emit —
    same arithmetic, no join-back. Bit-equality, not approx."""
    from backend_etl_spark.operators import textops
    from backend_etl_spark.sources.loader import load_table

    docs = load_table(spark, sf_dir, "documents")
    inline = {
        r["doc_id"]: (r["e"], r["k"])
        for r in docs.select(
            "doc_id",
            textops.char_entropy_bits(F.col("text")).alias("e"),
            textops.repetition_keep(F.col("text")).alias("k"),
        ).collect()
    }
    ent = {
        r["doc_id"]: r["char_entropy_bits"]
        for r in textops.char_entropy(docs).collect()
    }
    rep = {
        r["doc_id"]: r["keep"]
        for r in textops.repetition_metrics(docs).collect()
    }
    assert inline.keys() == ent.keys() == rep.keys()
    for d, (e, k) in inline.items():
        assert e == ent[d], (d, e, ent[d])
        assert k == rep[d], (d, k, rep[d])
