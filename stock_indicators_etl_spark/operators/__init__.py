from stock_indicators_etl_spark.operators.timegrid import (
    fill_gaps,
    interpolate_linear,
    market_hours_filter,
    regularity_violations,
    segment_series,
)

__all__ = [
    "fill_gaps",
    "interpolate_linear",
    "market_hours_filter",
    "regularity_violations",
    "segment_series",
]
