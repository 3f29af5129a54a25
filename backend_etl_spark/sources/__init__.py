from backend_etl_spark.sources.loader import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
