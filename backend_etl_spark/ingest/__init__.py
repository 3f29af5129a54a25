from backend_etl_spark.ingest import projections, schemas
from backend_etl_spark.ingest.projections import unified_mentions
from backend_etl_spark.ingest.schemas import DEDUP_KEYS

__all__ = ["projections", "schemas", "unified_mentions", "DEDUP_KEYS"]
