"""Mergeable frequency/membership sketches as DataFrame aggregations.

Count-Min (Cormode & Muthukrishnan 2005) and Bloom (Bloom 1970) built
from scratch on portable md5-derived hashes, because PySpark 4 exposes
neither ``bloom_filter_agg`` nor ``DataFrameStatFunctions.countMinSketch``
to Python — and because a DataFrame-native build is exactly what a
multi-executor cluster wants anyway:

- the CMS is a (depth × width) counter relation produced by ONE
  explode + groupBy — each executor builds partial counters map-side
  and the shuffle merges them (sketches are mergeable by construction);
  estimates are a bounded join against that relation, never a collect.
- the Bloom filter is a dense bigint bitmask array assembled in a
  1-row aggregate and broadcast to the probe side, where membership is
  two O(1) JVM-side bit operations per hash — the hand-rolled version
  of Spark's runtime row-level bloom pruning, usable from PySpark.

The CMS uses the md5-hash family (seeded ``'<tag><i>#' || key``, the
engine-portable idiom from operators/dedup.py) so DuckDB oracles can
replay the *identical* sketch bit-for-bit. The bloom uses JVM-side
xxhash64 instead: it is semantically transparent (no false negatives,
the join removes false positives), so nothing ever replays its bits
and the probe hot path shouldn't pay md5 materialization.

Reference parity: the reference has no sketches at all (its dedup is
``ON CONFLICT DO NOTHING``, utils/db_helpers.py:92-301); these are the
approximate counterparts a 100 TB corpus needs when exact per-key state
no longer fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 64


def _shl(value: F.Column, bits: F.Column) -> F.Column:
    """shiftleft with a *column* shift amount — the `F.shiftleft` Python
    wrapper only accepts a literal int."""
    return F.call_function("shiftleft", value, bits.cast("int"))


def _portable_hash(tag: str, i: int, key: F.Column, modulus: int) -> F.Column:
    """First 8 hex chars of md5('<tag><i>#' || key) as a non-negative
    bigint mod ``modulus`` — identical to DuckDB's
    ``('0x' || substr(md5(...), 1, 8))::BIGINT % modulus``."""
    seed = F.concat(F.lit(f"{tag}{i}#"), key)
    return (
        F.conv(F.substring(F.md5(seed), 1, 8), 16, 10).cast("bigint") % modulus
    )


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def cms_build(df: DataFrame, key: F.Column, depth: int, width: int) -> DataFrame:
    """Count-Min counter relation ``(r, c, cnt)`` with depth·width rows.

    One explode (depth rows per input row, map-side) + one groupBy on
    the bounded (r, c) key: partial counters combine map-side, so the
    shuffle moves at most depth·width rows per input partition no
    matter how many input rows there are — the mergeable-sketch
    property, realized by Spark's partial aggregation.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("bigint").alias("r"),
                        _portable_hash("cms", r, key, width).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy("cell.r", "cell.c").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int, width: int
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: est(k) =
    min over rows r of counter[r][h_r(k)]. A bounded equi-join on the
    (r, c) cell key — the sketch side is ≤ depth·width rows, so AQE
    broadcasts it; no collect anywhere. LEFT join + coalesce(cnt, 0):
    a counter cell no build key hashed into is absent from the sparse
    relation but its value is 0 — an inner join would skip it and
    inflate (or drop) estimates for keys outside the build stream."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("bigint").alias("r"),
                        _portable_hash("cms", r, F.col(key_col), width).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, "cell.r", "cell.c")
    return (
        probes.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def _bloom_hash(i: int, key: F.Column, m_bits: int) -> F.Column:
    """Bloom position i: xxhash64 (JVM-side, whole-stage codegen — no
    md5 materialization cost on the probe hot path). Unlike the CMS,
    the bloom never needs an engine-portable hash: it is semantically
    transparent (no false negatives + the join removes false
    positives), so no oracle ever replays its bits."""
    return F.pmod(F.xxhash64(F.lit(f"bloom{i}"), key), F.lit(m_bits))


def bloom_build(df: DataFrame, key: F.Column, m_bits: int, k: int) -> DataFrame:
    """1-row DataFrame with a dense ``bits: array<bigint>`` bitmask of
    length m_bits/64.

    Shape: explode k positions per key (map-side) → groupBy word →
    bit_or of the set bits (partial-aggregated, ≤ m_bits/64 rows move)
    → one 1-row aggregate densifies the sparse (word, mask) pairs into
    the array. The result is broadcast-sized by construction
    (m_bits/64 bigints) regardless of build-side cardinality.
    """
    n_words = m_bits // _WORD_BITS
    pos = df.select(
        F.explode(
            F.array(*[_bloom_hash(i, key, m_bits) for i in range(k)])
        ).alias("p")
    )
    words = pos.select(
        (F.col("p") / _WORD_BITS).cast("bigint").alias("w"),
        _shl(F.lit(1).cast("bigint"), F.col("p") % _WORD_BITS).alias("b"),
    ).groupBy("w").agg(F.bit_or("b").alias("mask"))
    mm = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "mask"))).alias("mm")
    )
    return mm.select(
        F.transform(
            F.sequence(F.lit(0).cast("bigint"), F.lit(n_words - 1).cast("bigint")),
            lambda w: F.coalesce(
                F.call_function("element_at", F.col("mm"), w),
                F.lit(0).cast("bigint"),
            ),
        ).alias("bits")
    )


def bloom_might_contain(
    bits: F.Column, key: F.Column, m_bits: int, k: int
) -> F.Column:
    """Membership test against a ``bloom_build`` bitmask column: all k
    hash bits set. Two O(1) bit ops per hash, pure JVM expressions
    inside whole-stage codegen — no false negatives, so filtering a
    join's probe side with it before the shuffle is semantics-preserving
    (false positives are removed by the join itself)."""
    checks = []
    for i in range(k):
        p = _bloom_hash(i, key, m_bits)
        word = F.get(bits, (p / _WORD_BITS).cast("int"))
        bit = _shl(F.lit(1).cast("bigint"), p % _WORD_BITS)
        checks.append(word.bitwiseAND(bit) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


# ---------------------------------------------------------------------------
# LogLog distinct-count sketch (FM-family max-rho registers)
# ---------------------------------------------------------------------------

#: LogLog constant alpha_m for m >= 64 (Durand & Flajolet 2003):
#: E = alpha * m * 2^(sum R / m) over max-rho registers
LL_ALPHA = 0.39701


def _fm_rho(h: F.Column) -> F.Column:
    """rho(h) = 1-based position of the least-significant set bit of the
    32-bit value ``h`` (33 when h == 0 — all bits clear). ``h & -h``
    isolates the lowest set bit; log2 of an exact power of two is exact
    in IEEE doubles, so the cast is engine-stable (verified identical in
    DuckDB and the JVM)."""
    lsb = h.bitwiseAND(-h)
    return (
        F.when(h == 0, F.lit(33))
        .otherwise(F.log2(lsb).cast("int") + 1)
        .cast("int")
    )


def fm_registers(df: DataFrame, key: F.Column, m: int, tag: str = "fm") -> DataFrame:
    """LogLog register relation ``(reg, r)`` — for each of ``m`` registers
    (stochastic averaging: register = h1 % m), the max rho over the
    second 32 hash bits of every key routed there. Registers no key
    hashed into are ABSENT (the consumer left-joins a dense spine and
    coalesces to 0, matching the estimator's convention).

    One map-only select + one groupBy on the bounded register id: max is
    associative so partial aggregation merges register maxima map-side —
    at most ``m`` rows per input partition reach the shuffle regardless
    of input cardinality. The same max-merge IS the sketch-union
    operation: fm_registers(A) max-merged with fm_registers(B) equals
    fm_registers(A UNION ALL B), making the sketch distributive over any
    partitioning of the input (the property ``sketch_fm_merge_union``
    attests).

    Hashes are the engine-portable md5 family (first 8 hex chars →
    register, next 8 → rho bits), so a DuckDB oracle replays the sketch
    bit-for-bit — full value attestation, unlike the engine-opaque HLL++
    in approx_count_distinct."""
    seed = F.concat(F.lit(f"{tag}0#"), key)
    h1 = F.conv(F.substring(F.md5(seed), 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(F.md5(seed), 9, 8), 16, 10).cast("bigint")
    return (
        df.select((h1 % m).alias("reg"), _fm_rho(h2).alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("r"))
    )


def fm_estimate(registers: DataFrame, m: int) -> DataFrame:
    """1-row LogLog estimate from a ``fm_registers`` relation:
    E = alpha_m * m * 2^(sum R / m), empty registers counting 0 (Durand
    & Flajolet 2003, Thm 1). The dense spine is a generated m-row
    sequence (broadcast-sized); sum R stays integral so the only float
    work is one pow over an exact dyadic exponent."""
    spine = registers.sparkSession.range(m).select(F.col("id").alias("reg"))
    dense = spine.join(registers, "reg", "left").select(
        F.coalesce(F.col("r"), F.lit(0)).alias("r")
    )
    return dense.agg(
        F.sum("r").cast("bigint").alias("sum_rho"),
        F.count(F.when(F.col("r") == 0, 1)).cast("bigint").alias("n_empty"),
    ).select(
        "sum_rho",
        "n_empty",
        F.round(
            F.lit(LL_ALPHA * m) * F.pow(F.lit(2.0), F.col("sum_rho") / float(m)), 4
        ).alias("fm_est"),
    )
