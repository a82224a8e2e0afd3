from stock_indicators_etl_spark.functions.timefns import (
    epoch_ns,
    iso_week,
    iso_year,
    market_bounds_ns,
    normalize_name,
    wall_time_to_epoch_ns,
)

__all__ = [
    "epoch_ns",
    "iso_week",
    "iso_year",
    "market_bounds_ns",
    "normalize_name",
    "wall_time_to_epoch_ns",
]
