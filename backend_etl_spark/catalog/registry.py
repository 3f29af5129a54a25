"""Query registry: every implemented operator gets a named (spark, sf_dir)
callable and — when SQL-expressible — a DuckDB oracle SQL string.

Parity rules that every entry follows (so the driver's row-count +
schema + order-insensitive value-hash comparison passes):
- every computed column is aliased identically on both sides;
- integer outputs are CAST to BIGINT on both sides (Spark `size`/
  `row_number` return INT, DuckDB `len`/`count` return BIGINT);
- floating aggregates are ROUNDed on both sides (2 dp for money sums,
  4 dp for ratios/avgs, 6 dp for cosines) to absorb summation-order
  differences between engines;
- LIMIT queries order by the rounded measure plus a unique tie-break
  key, so both engines select the same row set;
- no wall-clock (`current_timestamp`) — cutoffs are literals.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the catalog."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco
