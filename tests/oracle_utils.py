"""Local mirror of the driver's correctness gate: run a catalog query on
Spark and its oracle SQL on DuckDB over the same parquet, compare
row-count, column names, and an order-insensitive multiset of
normalized values."""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from backend_etl_spark.sources.loader import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: drops sub-ulp noise, keeps rounded values exact
        return f"{v:.12g}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def normalized_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(row[i]) for i in order) for row in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    expected_rel = con.sql(sql)
    exp_cols = list(expected_rel.columns)
    exp_rows = expected_rel.fetchall()
    act_cols = list(spark_df.columns)
    act_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(act_cols) == sorted(exp_cols), (
        f"column mismatch: spark={sorted(act_cols)} oracle={sorted(exp_cols)}"
    )
    assert len(act_rows) == len(exp_rows), (
        f"row count mismatch: spark={len(act_rows)} oracle={len(exp_rows)}"
    )
    a = normalized_rows(act_cols, act_rows)
    e = normalized_rows(exp_cols, exp_rows)
    if a != e:
        diffs = [(x, y) for x, y in zip(a, e) if x != y][:5]
        raise AssertionError(f"value mismatch; first diffs (spark, oracle): {diffs}")
    assert_driver_canon_safe(spark_df, expected_rel.df())


def assert_driver_canon_safe(spark_df, oracle_pdf) -> None:
    """Dtype-parity gate (VERDICT r4 #2): the DRIVER's canonicalizer
    pandas-sorts and hashes the oracle frame, so two classes of oracle
    result break it even when values are relationally identical:

    (i)  unhashable cells — DuckDB LIST/STRUCT surfacing as ndarray/dict
         crashes the canon's ``sort_values`` (the r4
         ``instagram_flatten_fixture`` failure);
    (ii) integer cells typed float64 — ``sum()``/scalar-subquery HUGEINT
         → float64 hashes differently from Spark's bigint (the r4
         ``corpus_pipeline_funnel`` failure).

    Assert both classes away for every oracle, before the driver sees it.
    """
    import numpy as np
    from pyspark.sql import types as T

    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    spark_types = {f.name: f.dataType for f in spark_df.schema.fields}
    for col in oracle_pdf.columns:
        s = oracle_pdf[col]
        if s.dtype == object:
            bad = {
                type(v).__name__
                for v in s
                if isinstance(v, (list, dict, set, np.ndarray))
            }
            assert not bad, (
                f"oracle column {col!r} carries unhashable {sorted(bad)} cells "
                "— the driver canon cannot sort these; scalarize or to_json "
                "on BOTH sides"
            )
        st = spark_types.get(col)
        # NULL-bearing int columns legitimately surface as float64+NaN on
        # BOTH sides (pandas has no NaN for int64), so only a float-typed
        # integral column with NO nulls is the HUGEINT-leak signature
        if isinstance(st, integral) and len(s) and not s.isna().any():
            assert s.dtype.kind in "iu", (
                f"oracle column {col!r} is {s.dtype} but the Spark schema is "
                f"{st.simpleString()} — CAST(... AS BIGINT) the oracle "
                "expression (HUGEINT sum/scalar-subquery leak)"
            )
