"""Distributed order-insensitive result hashing — the attestation path
for results too big to collect (r11 verdict item 2).

The driver-style value check collects both result sets and compares
normalized row multisets; at sf10 a multi-GB relation (the LSH
candidate pairs) breaks that on ``spark.driver.maxResultSize`` — a
harness capacity limit, not an engine one. This module removes it: each
engine computes, OVER ITS OWN RESULT and entirely engine-side, a
canonical string per row (columns sorted by name, cells normalized the
same way ``tests/oracle_utils._norm_cell`` does), two independent
md5-derived 60-bit row hashes, and their COMMUTATIVE sums as
DECIMAL(38,0) — order-insensitive, overflow-free, mergeable. The two
scalars (plus row count and sorted column names) are what crosses the
driver, so the compare runs at any SF.

Cross-engine parity is pinned by tests/test_dist_hash.py: for every
supported type the Spark and DuckDB normalizations render identical
strings (ints/strings/bools/dates verbatim; floats rounded to 6 dp with
the same round() on both sides THEN through DECIMAL(38,6) — the
explicit round aligns the two engines' half-way behavior (r12 ADVICE)
and is deliberately STRICTER than the collect path's
12-significant-digit rule; timestamps through an explicit microsecond
format). Non-scalar cells (r12 verdict item 1) render canonically too:
BINARY as uppercase hex (identical in both engines, test-pinned);
ARRAY as '[' + chr(31)-joined recursively-normalized elements + ']'
with NULL elements as the chr(30) sentinel, an explicit NULL guard so
a NULL array never aliases an empty one, and depth-indexed lambda
variables so nesting composes; STRUCT as '{' + chr(31)-joined field
values in FIELD-NAME order + '}', NULL-guarded the same way (a NULL
struct must not alias an all-NULL-fields struct). MAP cells have no
deterministic cross-engine ordering and still raise — entries carrying
them keep the collect path.

NULL sentinel: a NULL cell renders as chr(30) (record separator), NOT
the 4-char string 'NULL' — r12 ADVICE caught that COALESCE(cell,
'NULL') made a literal 'NULL' string hash-identical to a NULL cell.
chr(30)/chr(31) are non-printable and cannot appear in the synthetic
corpora; adversarial data containing them could still alias rows or
nesting boundaries (two 60-bit hash sums must BOTH collide for a wrong
result to pass).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_SEP = 31  # ASCII unit separator — joins cells, array elements, fields
_NULL_SENTINEL = 30  # ASCII record separator — renders NULL cells

#: scalar logical type → (spark normalization template, duckdb template)
_NORM = {
    "int": (
        "CAST({c} AS STRING)",
        "CAST({c} AS VARCHAR)",
    ),
    "bool": (
        "CAST(CAST({c} AS INT) AS STRING)",
        "CAST(CAST({c} AS INT) AS VARCHAR)",
    ),
    # round() to 6 dp FIRST (both engines round half away from zero on
    # doubles), then the exact decimal cast — without the round, the
    # cast's own half-way handling could differ between engines on
    # computed ratios (false MISMATCH, r12 ADVICE low)
    "float": (
        "CAST(CAST(round({c}, 6) AS DECIMAL(38,6)) AS STRING)",
        "CAST(CAST(round({c}, 6) AS DECIMAL(38,6)) AS VARCHAR)",
    ),
    "decimal": (
        "CAST({c} AS STRING)",
        "CAST({c} AS VARCHAR)",
    ),
    "string": ("{c}", "{c}"),
    "date": (
        "CAST({c} AS STRING)",
        "CAST({c} AS VARCHAR)",
    ),
    "timestamp": (
        "date_format({c}, 'yyyy-MM-dd HH:mm:ss.SSSSSS')",
        "strftime({c}, '%Y-%m-%d %H:%M:%S.%f')",
    ),
    # uppercase hex in both engines (pinned by test_dist_hash)
    "binary": ("hex({c})", "hex({c})"),
}

_TYPE_CLASS = [
    (re.compile(r"^(tiny|small|big)?int(eger)?$|^long$|^u?bigint$|^hugeint$"), "int"),
    (re.compile(r"^bool(ean)?$"), "bool"),
    (re.compile(r"^(float|double|real)( precision)?$"), "float"),
    (re.compile(r"^decimal.*$|^numeric.*$"), "decimal"),
    (re.compile(r"^(string|varchar.*|text)$"), "string"),
    (re.compile(r"^date$"), "date"),
    (re.compile(r"^timestamp.*$"), "timestamp"),
    (re.compile(r"^(binary|blob|bytea|varbinary)$"), "binary"),
]


def _classify(type_str: str) -> str:
    t = type_str.strip().lower()
    for rx, cls in _TYPE_CLASS:
        if rx.match(t):
            return cls
    raise ValueError(f"dist-hash: unsupported column type {type_str!r}")


def _spark_cell_expr(col: str, dt, depth: int = 0) -> str:
    """Canonical rendering of one Spark cell, recursing into containers.
    ``col`` is an expression string; ``dt`` a pyspark DataType."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        var = f"_x{depth}"
        inner = _spark_cell_expr(var, dt.elementType, depth + 1)
        return (
            f"concat('[', array_join(transform({col}, "
            f"{var} -> COALESCE({inner}, char({_NULL_SENTINEL}))), "
            f"char({_SEP})), ']')"
        )
    if isinstance(dt, T.StructType):
        parts = []
        for f in sorted(dt.fields, key=lambda f: f.name):
            fe = _spark_cell_expr(f"{col}.`{f.name}`", f.dataType, depth + 1)
            parts.append(f"COALESCE({fe}, char({_NULL_SENTINEL}))")
        body = f", char({_SEP}), ".join(parts)
        return (
            f"CASE WHEN {col} IS NULL THEN NULL "
            f"ELSE concat('{{', {body}, '}}') END"
        )
    if isinstance(dt, T.MapType):
        raise ValueError("dist-hash: unsupported column type 'map'")
    return _NORM[_classify(dt.simpleString())][0].format(c=col)


def _duck_cell_expr(col: str, dt, depth: int = 0) -> str:
    """Canonical rendering of one DuckDB cell (``dt`` a DuckDBPyType).
    array_to_string returns NULL for an EMPTY list in DuckDB, so the
    list branch coalesces the join to '' under an explicit is-NULL guard
    — a NULL array renders as the sentinel, an empty one as '[]'."""
    tid = dt.id
    if tid in ("list", "array"):
        var = f"_x{depth}"
        inner = _duck_cell_expr(var, dict(dt.children)["child"], depth + 1)
        return (
            f"CASE WHEN {col} IS NULL THEN NULL ELSE "
            f"'[' || COALESCE(array_to_string(list_transform({col}, "
            f"{var} -> COALESCE({inner}, chr({_NULL_SENTINEL}))), "
            f"chr({_SEP})), '') || ']' END"
        )
    if tid == "struct":
        parts = []
        for fname, ft in sorted(dt.children):
            fe = _duck_cell_expr(
                f"struct_extract({col}, '{fname}')", ft, depth + 1
            )
            parts.append(f"COALESCE({fe}, chr({_NULL_SENTINEL}))")
        body = f" || chr({_SEP}) || ".join(parts)
        return (
            f"CASE WHEN {col} IS NULL THEN NULL "
            f"ELSE '{{' || {body} || '}}' END"
        )
    if tid == "map":
        raise ValueError("dist-hash: unsupported column type 'map'")
    return _NORM[_classify(str(dt))][1].format(c=col)


def _spark_canonical_expr(schema) -> str:
    """concat_ws(chr(31), <normalized cells in column-name order>)."""
    parts = []
    for f in sorted(schema.fields, key=lambda f: f.name):
        cell = _spark_cell_expr(f"`{f.name}`", f.dataType)
        parts.append(f"COALESCE({cell}, char({_NULL_SENTINEL}))")
    return f"concat_ws(char({_SEP}), {', '.join(parts)})"


def _duck_canonical_expr(cols_types: list[tuple[str, object]]) -> str:
    parts = []
    for name, t in sorted(cols_types, key=lambda ct: ct[0]):
        cell = _duck_cell_expr(f'"{name}"', t)
        parts.append(f"COALESCE({cell}, chr({_NULL_SENTINEL}))")
    return f"concat_ws(chr({_SEP}), {', '.join(parts)})"


#: per-dialect 60-bit row hashes off two disjoint md5 hex spans
_H1 = (
    "CAST(conv(substring(md5(_s), 1, 15), 16, 10) AS BIGINT)",
    "CAST(concat('0x', substr(md5(_s), 1, 15)) AS BIGINT)",
)
_H2 = (
    "CAST(conv(substring(md5(_s), 17, 15), 16, 10) AS BIGINT)",
    "CAST(concat('0x', substr(md5(_s), 17, 15)) AS BIGINT)",
)


def _norm_scalar(v):
    return None if v is None else str(int(v))


def spark_hash_agg(sdf: DataFrame) -> dict:
    """(n, h1, h2, cols) of a Spark result, computed distributed (one
    map-side-combinable aggregate) — the only thing collected is the
    3-scalar aggregate row."""
    row_expr = _spark_canonical_expr(sdf.schema)
    out = (
        sdf.selectExpr(f"{row_expr} AS _s")
        .selectExpr(
            "count(*) AS n",
            f"sum(CAST({_H1[0]} AS DECIMAL(38,0))) AS h1",
            f"sum(CAST({_H2[0]} AS DECIMAL(38,0))) AS h2",
        )
        .first()
    )
    return {
        "n": out["n"],
        "h1": _norm_scalar(out["h1"]),
        "h2": _norm_scalar(out["h2"]),
        "cols": sorted(sdf.columns),
    }


def duckdb_hash_agg(con, sql: str) -> dict:
    """(n, h1, h2, cols) of a DuckDB oracle result — the oracle SQL runs
    as a subquery under the same canonical projection + aggregate, so
    DuckDB streams/spills instead of fetchall-ing the relation."""
    rel = con.sql(sql)
    row_expr = _duck_canonical_expr(list(zip(rel.columns, rel.types)))
    out = con.sql(
        f"SELECT count(*) AS n, "
        f"sum(CAST({_H1[1]} AS DECIMAL(38,0))) AS h1, "
        f"sum(CAST({_H2[1]} AS DECIMAL(38,0))) AS h2 "
        f"FROM (SELECT {row_expr} AS _s FROM ({sql}) _oracle) _rows"
    ).fetchone()
    return {
        "n": out[0],
        "h1": _norm_scalar(out[1]),
        "h2": _norm_scalar(out[2]),
        "cols": sorted(rel.columns),
    }


def dist_hash_compare(sdf: DataFrame, con, sql: str) -> dict:
    """Run both sides; return the driver-shaped verdict plus the scalars
    (for ledger rows)."""
    a = spark_hash_agg(sdf)
    e = duckdb_hash_agg(con, sql)
    return {
        "schema_ok": a["cols"] == e["cols"],
        "count_ok": a["n"] == e["n"],
        "vals_ok": a["h1"] == e["h1"] and a["h2"] == e["h2"],
        "n_spark": a["n"],
        "n_oracle": e["n"],
        "spark": a,
        "oracle": e,
    }
