"""backend_etl_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference ETL backend (Icepeak01/Backend-ETL), built
Spark-first: DataFrame/Catalyst plans, broadcast joins for dimension
stamping, anti-join idempotent sinks, watermark-driven incremental
pipelines, plus large-scale LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Layout:
    session     SparkSession factory + runtime tuning
    sources     parquet loaders / view registration
    functions   scalar Column helpers (timestamp formats, parsing)
    operators   relational, nested, window, asof, dedup, similarity, text
    sink        idempotent dedup-append sink + watermark state
    pipeline    general/catchup incremental batch pipeline
    streaming   Structured Streaming variants
    catalog     named query registry + DuckDB oracle SQL
"""

__version__ = "0.1.0"
