from backend_etl_spark.functions.scalars import (
    epoch_millis_ts,
    epoch_seconds_ts,
    normalize_text,
    parse_ctime_utc,
    parse_long_date,
    parse_purchase_date,
    rating_from_alt,
    tokens,
)

__all__ = [
    "epoch_millis_ts",
    "epoch_seconds_ts",
    "normalize_text",
    "parse_ctime_utc",
    "parse_long_date",
    "parse_purchase_date",
    "rating_from_alt",
    "tokens",
]
