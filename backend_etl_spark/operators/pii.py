"""PII scrubbing / anonymization for training-data pipelines: digit-run
masking, deterministic pseudonymization, and quasi-identifier
generalization (coarse banding) — the standard pre-release toolkit for a
corpus that carries account identifiers.

Everything is a Catalyst column expression (regexp_replace / md5 /
floor): map-only at any scale, whole-stage-codegen'd, and exactly
reproducible in the DuckDB oracle. The deterministic md5 pseudonym keeps
referential integrity across tables (the same source value always maps
to the same token) without storing a lookup table — the usual
requirement when joins must survive anonymization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mask_digits(col: Column | str, repl: str = "#") -> Column:
    """Replace every digit with ``repl`` — redacts numeric identifiers
    embedded in free text while preserving the surrounding shape."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[0-9]", repl)


def digit_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, "[0-9]", ""))


def pseudonym(col: Column | str, prefix: str) -> Column:
    """Deterministic pseudonym: ``prefix_`` + 12 hex chars of md5.
    Collision-safe enough for joins at corpus scale (48 bits)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(prefix + "_"), F.substring(F.md5(c), 1, 12))


def generalize_band(col: Column | str, width: float) -> Column:
    """k-anonymity-style generalization: floor the value into a band of
    ``width`` so exact amounts can't re-identify a record."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / width) * int(width)).cast("bigint")


def scrub_customers(customers: DataFrame) -> DataFrame:
    """Anonymized customer dimension: name pseudonymized + digit-masked,
    account balance generalized to a 1000-unit band, segment kept as the
    (non-identifying) analytics attribute."""
    return customers.select(
        "c_custkey",
        pseudonym("c_name", "cust").alias("name_token"),
        mask_digits("c_name").alias("name_masked"),
        digit_count("c_name").cast("bigint").alias("n_digits_masked"),
        generalize_band("c_acctbal", 1000.0).alias("acctbal_band"),
        "c_mktsegment",
    )
