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
strings (ints/strings/bools/dates verbatim; floats through
DECIMAL(38,6) — deliberately STRICTER than the collect path's
12-significant-digit rule; timestamps through an explicit
microsecond format). Unsupported cell types (arrays, structs, binary)
raise: entries needing them keep the collect path.

Collision note: two 60-bit hash sums must BOTH collide for a wrong
result to pass; cells are joined with chr(31) after NULL-coalescing, so
only adversarial data containing the separator could alias rows.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_SEP = 31  # ASCII unit separator

#: logical type → (spark normalization template, duckdb template)
_NORM = {
    "int": (
        "CAST({c} AS STRING)",
        "CAST({c} AS VARCHAR)",
    ),
    "bool": (
        "CAST(CAST({c} AS INT) AS STRING)",
        "CAST(CAST({c} AS INT) AS VARCHAR)",
    ),
    "float": (
        "CAST(CAST({c} AS DECIMAL(38,6)) AS STRING)",
        "CAST(CAST({c} AS DECIMAL(38,6)) AS VARCHAR)",
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
}

_TYPE_CLASS = [
    (re.compile(r"^(tiny|small|big)?int(eger)?$|^long$|^u?bigint$|^hugeint$"), "int"),
    (re.compile(r"^bool(ean)?$"), "bool"),
    (re.compile(r"^(float|double|real)( precision)?$"), "float"),
    (re.compile(r"^decimal.*$|^numeric.*$"), "decimal"),
    (re.compile(r"^(string|varchar.*|text)$"), "string"),
    (re.compile(r"^date$"), "date"),
    (re.compile(r"^timestamp.*$"), "timestamp"),
]


def _classify(type_str: str) -> str:
    t = type_str.strip().lower()
    for rx, cls in _TYPE_CLASS:
        if rx.match(t):
            return cls
    raise ValueError(f"dist-hash: unsupported column type {type_str!r}")


def _canonical_expr(cols_types: list[tuple[str, str]], dialect: int) -> str:
    """concat_ws(chr(31), <normalized cells in column-name order>)."""
    quote = "`" if dialect == 0 else '"'  # spark backticks, duckdb quotes
    parts = []
    for name, t in sorted(cols_types, key=lambda ct: ct[0]):
        tmpl = _NORM[_classify(t)][dialect]
        cell = tmpl.format(c=f"{quote}{name}{quote}")
        parts.append(f"COALESCE({cell}, 'NULL')")
    chrfn = "char" if dialect == 0 else "chr"
    return f"concat_ws({chrfn}({_SEP}), {', '.join(parts)})"


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
    row_expr = _canonical_expr(sdf.dtypes, dialect=0)
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
    cols_types = list(zip(rel.columns, [str(t) for t in rel.types]))
    row_expr = _canonical_expr(cols_types, dialect=1)
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
