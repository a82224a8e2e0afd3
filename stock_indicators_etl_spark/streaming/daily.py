"""Day-granular job drivers (SURVEY.md §3 E1/E2/E3).

Thin CLIs mirroring the reference's two jobs — same argv contract
(``--execution_date``, ``--interval``; ``data_indicators.py:71-77``,
``data_download_yahoo.py:115-121``) — so any scheduler that ran the
reference (the 2-task weekday-cron Airflow DAG, ``airflow_dag.py``)
can run these instead. Each invocation processes exactly one logical
day; missing input → clean no-op exit (``data_indicators.py:37-39``).

Usage:
  python -m stock_indicators_etl_spark.streaming.daily download \
      --execution_date 2024-01-02 --interval 1m --base /data/yahoo \
      [--tickers AAPL,MSFT | --ticker_csv path.csv] [--synthetic]
  python -m stock_indicators_etl_spark.streaming.daily indicators \
      --execution_date 2024-01-02 --interval 1m \
      --src /data/yahoo --dst /data/indicators
"""

from __future__ import annotations

import argparse
import sys

from stock_indicators_etl_spark.config import IndicatorConfig
from stock_indicators_etl_spark.operators.pipeline import generate_indicators
from stock_indicators_etl_spark.session import get_spark
from stock_indicators_etl_spark.sources.io import (
    read_bars_day,
    read_ticker_csv,
    write_bars_day,
)
from stock_indicators_etl_spark.sources.yahoo import (
    download_bars,
    synthetic_fetch,
    yfinance_fetch,
)


def run_download(args: argparse.Namespace) -> int:
    spark = get_spark(app_name="download_bars")
    if args.tickers:
        tickers = args.tickers.split(",")
    elif args.ticker_csv:
        tickers = [r.ticker for r in read_ticker_csv(spark, args.ticker_csv).collect()]
    elif args.synthetic:
        tickers = ["AAPL", "GOOG", "MSFT", "SPY", "VOO"]  # offline default
    else:
        raise SystemExit("need --tickers or --ticker_csv")
    fetch = synthetic_fetch if args.synthetic else yfinance_fetch
    bars = download_bars(
        spark, tickers, args.execution_date, args.interval, fetch_fn=fetch
    )
    write_bars_day(bars, args.base, args.interval, args.execution_date)
    return 0


def run_indicators(args: argparse.Namespace) -> int:
    spark = get_spark(app_name="generate_indicators")
    try:
        bars = read_bars_day(spark, args.src, args.interval, args.execution_date)
    except Exception:
        # missing day → skip (reference behavior, data_indicators.py:37-39)
        print(f"no input for {args.execution_date}; skipping")
        return 0
    out = generate_indicators(bars, IndicatorConfig(), date=args.execution_date)
    write_bars_day(out, args.dst, args.interval, args.execution_date)
    return 0


def run_backfill(args: argparse.Namespace) -> int:
    """Date-range indicator backfill as ONE distributed job.

    The reference backfills via ≤8 concurrent single-day Airflow runs
    (``airflow_dag.py:24-26``); here partition pruning selects the
    [start, end] day range from the archive in one scan and the whole
    range flows through one ``generate_indicators`` plan. Per-day
    market-session bounds are computed as Column expressions
    (``to_utc_timestamp`` of each row's own day), so no driver-side
    loop over days exists anywhere.
    """
    from pyspark.sql import functions as F

    NS = 1_000_000_000
    spark = get_spark(app_name="backfill_indicators")
    cfg = IndicatorConfig()
    bars = (
        spark.read.parquet(args.src)
        .filter(F.col("interval") == args.interval)
        .filter((F.col("day") >= args.start) & (F.col("day") <= args.end))
    )
    if bars.isEmpty():
        print(f"no input in [{args.start}, {args.end}]; skipping")
        return 0
    lo = (
        F.unix_timestamp(
            F.to_utc_timestamp(F.concat_ws(" ", "day", F.lit(cfg.market_open)), cfg.tz)
        ).cast("long")
        * NS
    )
    hi = (
        F.unix_timestamp(
            F.to_utc_timestamp(F.concat_ws(" ", "day", F.lit(cfg.market_close)), cfg.tz)
        ).cast("long")
        * NS
    )
    ws = F.col(cfg.time_column)
    in_session = bars.filter((ws >= lo) & (ws < hi)).drop(
        "interval", "year", "month", "day"
    )
    out = generate_indicators(in_session, cfg)
    # re-derive each output row's ET day for the partitioned sink
    day = F.date_format(
        F.from_utc_timestamp(
            F.timestamp_micros((ws / F.lit(1000)).cast("long")), cfg.tz
        ),
        "yyyy-MM-dd",
    )
    (
        out.withColumn("interval", F.lit(args.interval))
        .withColumn("day", day)
        .withColumn("year", F.year("day"))
        .withColumn("month", F.month("day"))
        .write.mode("overwrite")
        .partitionBy("interval", "year", "month", "day")
        .option("compression", "gzip")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(args.dst)
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="daily")
    sub = p.add_subparsers(dest="job", required=True)

    d = sub.add_parser("download")
    d.add_argument("--execution_date", required=True)
    d.add_argument("--interval", default="1m")
    d.add_argument("--base", required=True)
    d.add_argument("--tickers", default=None)
    d.add_argument("--ticker_csv", default=None)
    d.add_argument("--synthetic", action="store_true")
    d.set_defaults(fn=run_download)

    i = sub.add_parser("indicators")
    i.add_argument("--execution_date", required=True)
    i.add_argument("--interval", default="1m")
    i.add_argument("--src", required=True)
    i.add_argument("--dst", required=True)
    i.set_defaults(fn=run_indicators)

    b = sub.add_parser("backfill")
    b.add_argument("--start", required=True)
    b.add_argument("--end", required=True)
    b.add_argument("--interval", default="1m")
    b.add_argument("--src", required=True)
    b.add_argument("--dst", required=True)
    b.set_defaults(fn=run_backfill)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
