from stock_indicators_etl_spark.sources.io import (
    day_path,
    list_day_files,
    read_bars_day,
    read_ticker_csv,
    write_bars_day,
)

__all__ = [
    "day_path",
    "list_day_files",
    "read_bars_day",
    "read_ticker_csv",
    "write_bars_day",
]
