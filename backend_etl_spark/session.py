"""SparkSession factory and runtime tuning.

The reference ran a 10-process Celery worker pool (Dockerfile:20); here
Spark's scheduler owns parallelism. Configs chosen for the 100 TB design
target: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), explicit shuffle partitioning, UTC session time so
timestamp semantics are deterministic and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe to set on a live session (runtime-mutable).
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.timeParserPolicy": "CORRECTED",
    # small-dim broadcast: `customer`/`nation`/`region` play the reference's
    # `users` control-dimension role (SURVEY §2.7 J1) and must broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # plan-text audits (plans/quality.py, the no-global-window gate) parse
    # expression trees out of explain output — never let Spark elide them
    "spark.sql.debug.maxToStringFields": "4096",
}

#: Confs that must be set before the JVM starts.
STARTUP_CONF: dict[str, str] = {
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
    "spark.ui.enabled": "false",
    # session-catalog warehouse for bucketed tables (co-located joins)
    "spark.sql.warehouse.dir": os.environ.get(
        "SPARK_WAREHOUSE_DIR", "/tmp/spark-graft-warehouse"
    ),
}


def get_spark(app_name: str = "backend-etl-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) a tuned local SparkSession.

    Parallelism follows ``SPARK_GRAFT_CPUS`` (driver contract), defaulting
    to ``local[*]``. On a real cluster the same code runs unchanged with a
    cluster master — no conf here is local-mode-specific.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.master(master).appName(app_name)
    for k, v in {**STARTUP_CONF, **RUNTIME_CONF}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally-created session.

    The driver harness passes its own SparkSession into ``queries()``
    callables; this pins the confs that correctness depends on (UTC
    session time, CORRECTED parser) plus the perf confs that are
    runtime-mutable. Unknown/immutable confs are skipped, not fatal.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
