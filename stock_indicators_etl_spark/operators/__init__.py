from stock_indicators_etl_spark.operators.asof import asof_join
from stock_indicators_etl_spark.operators.funnel import (
    funnel_conversions,
    retention_cohorts,
)
from stock_indicators_etl_spark.operators.interval import interval_join
from stock_indicators_etl_spark.operators.pipeline import generate_indicators
from stock_indicators_etl_spark.operators.timegrid import (
    fill_gaps,
    interpolate_linear,
    market_hours_filter,
    regularity_violations,
    segment_series,
)

__all__ = [
    "asof_join",
    "fill_gaps",
    "funnel_conversions",
    "generate_indicators",
    "interpolate_linear",
    "interval_join",
    "market_hours_filter",
    "regularity_violations",
    "retention_cohorts",
    "segment_series",
]
