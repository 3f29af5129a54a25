"""Catalog assembly: importing the query modules populates REGISTRY."""

from backend_etl_spark.catalog import (  # noqa: F401  (register side effects)
    llmops,
    nested,
    relational,
    relational2,
    streamingq,
)
from backend_etl_spark.catalog.registry import REGISTRY, QuerySpec


def queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
