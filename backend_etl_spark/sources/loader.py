"""Parquet table loaders for the synthetic star schema.

Column pruning and predicate pushdown into the parquet scan are free as
long as callers express plans declaratively (``.select``/``.where`` on
the returned DataFrame) — verify via ``df.explain`` → ``PushedFilters``/
``ReadSchema``. At 100 TB these tables would be partitioned (e.g.
``orders`` by month of ``o_orderdate``); the loader API stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Dimensions small enough to always broadcast (the `users` control-dim
#: role from the reference, SURVEY §2.7 J1).
BROADCAST_DIMS = {"region", "nation", "customer", "supplier", "part"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which the Spark parquet
        # reader rejects; read nanos as LONG and convert (integer `div`,
        # not float division — ns-epoch exceeds double's 53-bit mantissa).
        # DuckDB truncates ns→µs on CAST(ts AS TIMESTAMP) the same way.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register temp views so catalog queries can use ``spark.sql``."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
