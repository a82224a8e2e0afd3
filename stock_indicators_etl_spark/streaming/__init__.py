from stock_indicators_etl_spark.streaming.sessions import (
    streaming_ohlcv_rollup,
    streaming_sessionize,
)

__all__ = ["streaming_ohlcv_rollup", "streaming_sessionize"]
