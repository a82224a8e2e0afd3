"""Scalar time/string functions (SURVEY.md §2.6, F1–F8).

The reference computes session bounds driver-side with pytz
(``stockdata/utils.py:14-36``); we do the same with the stdlib
``zoneinfo`` and emit int64 epoch-ns literals, so the Spark plan sees
plain long comparisons that push down to the Parquet scan.
"""

from __future__ import annotations

from datetime import datetime
from zoneinfo import ZoneInfo

from pyspark.sql import Column
from pyspark.sql import functions as F

NS_PER_S = 1_000_000_000


def wall_time_to_epoch_ns(date_str: str, time_str: str, tz: str = "US/Eastern") -> int:
    """tz-aware wall time → int64 epoch nanoseconds (F1, ``utils.py:14-23``)."""
    dt = datetime.fromisoformat(f"{date_str}T{time_str}").replace(tzinfo=ZoneInfo(tz))
    return int(dt.timestamp()) * NS_PER_S


def market_bounds_ns(
    date_str: str,
    tz: str = "US/Eastern",
    open_time: str = "09:30:00",
    close_time: str = "16:30:00",
) -> tuple[int, int]:
    """[open, close) session bounds in epoch-ns (F2, ``utils.py:26-36``).

    The 16:30 (not 16:00) close bound is a reference quirk kept for
    parity.
    """
    return (
        wall_time_to_epoch_ns(date_str, open_time, tz),
        wall_time_to_epoch_ns(date_str, close_time, tz),
    )


def epoch_ns(ts_col: Column | str, is_ntz: bool = False) -> Column:
    """Timestamp column → int64 epoch nanoseconds.

    Spark timestamps carry microsecond precision, so this is exact.
    Pass ``is_ntz=True`` for TIMESTAMP_NTZ columns (``unix_micros``
    rejects them); the NTZ-to-NTZ ``timestamp_diff`` form is
    session-timezone independent, matching DuckDB's ``epoch_ns`` of
    the same naive value.
    """
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    if is_ntz:
        ntz_epoch = F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))
        us = F.timestamp_diff("MICROSECOND", ntz_epoch, c)
    else:
        us = F.unix_micros(c)
    return (us * F.lit(1000)).cast("long")


def iso_week(date_col: Column | str) -> Column:
    """ISO week-of-year (F4, ``utils.py:110-121``)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.weekofyear(c)


def iso_year(date_col_name: str) -> Column:
    """ISO week-numbering year (F4). ``extract(YEAROFWEEK FROM d)`` in SQL.

    Takes a column *name* (the extract syntax needs one).
    """
    return F.expr(f"extract(YEAROFWEEK FROM {date_col_name})")


def date_parts(date_col: Column | str) -> tuple[Column, Column, Column]:
    """Zero-padded ``(yyyy, mm, dd)`` string parts of a date (F3,
    ``utils.py:67`` — the reference splits the ISO date string to
    build partition paths)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return (
        F.date_format(c, "yyyy"),
        F.date_format(c, "MM"),
        F.date_format(c, "dd"),
    )


def next_day(date_col: Column | str) -> Column:
    """Exclusive end-date arithmetic: date + 1 day (F7,
    ``data_download_yahoo.py:70-73``)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.date_add(c, 1)


def normalize_name(name: str) -> str:
    """Column-name normalization (F5, ``data_download_yahoo.py:58``)."""
    return name.lower().replace(" ", "_")


def ns_is_19_digits(col: Column | str) -> Column:
    """ns sanity check (F6, ``indicators.py:9-22``): 19-digit epoch."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c.cast("string")) == F.lit(19)
