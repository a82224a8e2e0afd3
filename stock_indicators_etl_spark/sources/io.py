"""Sources / sinks (SURVEY.md §2.1 S2–S6).

The reference stores gzip parquet one file per (interval, day) in a
Hive-ish path ``{base}/{interval}/{yyyy}/{mm}/{yyyy-mm-dd}.parquet.gzip``
(``stockdata/utils.py:61-86``). Spark-side we keep the same *logical*
layout but as a standard partitioned dataset —
``{base}/interval=…/year=…/month=…/day=…/…parquet`` — so partition
**pruning** (the primary 100 TB lever: a day-query opens one
partition, not the archive) and predicate pushdown come from Catalyst
for free. A compatibility reader for the reference's literal layout is
included.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BAR_COLUMNS = [
    "ticker", "volume", "open", "close", "high", "low", "adj_close", "window_start",
]


def day_path(base: str, interval: str, date_str: str) -> str:
    """Reference-layout path for one day
    (``stockdata/utils.py:61-73``): {base}/{interval}/{yyyy}/{mm}/{date}.parquet.gzip."""
    yyyy, mm, _dd = date_str.split("-")
    return os.path.join(base, interval, yyyy, mm, f"{date_str}.parquet.gzip")


def write_bars_day(
    df: DataFrame, base: str, interval: str, date_str: str, mode: str = "overwrite"
) -> None:
    """Partitioned gzip parquet sink (S4, ``stockdata/utils.py:76-86``).

    Writes under ``interval/year/month/day`` partition columns derived
    from the job's logical date — dynamic partition overwrite replaces
    exactly one day (idempotent re-runs, matching the reference's
    overwrite-one-file behavior).
    """
    yyyy, mm, dd = date_str.split("-")
    (
        df.withColumn("interval", F.lit(interval))
        .withColumn("year", F.lit(int(yyyy)))
        .withColumn("month", F.lit(int(mm)))
        .withColumn("day", F.lit(date_str))
        .write.mode(mode)
        .partitionBy("interval", "year", "month", "day")
        .option("compression", "gzip")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(base)
    )


def read_bars_day(
    spark: SparkSession, base: str, interval: str, date_str: str
) -> DataFrame:
    """Parquet scan for one logical day (S3,
    ``data_indicators.py:33-36``), via partition-pruned filters."""
    yyyy, mm, _ = date_str.split("-")
    return (
        spark.read.parquet(base)
        .filter(
            (F.col("interval") == interval)
            & (F.col("year") == int(yyyy))
            & (F.col("month") == int(mm))
            & (F.col("day") == date_str)
        )
        .drop("interval", "year", "month", "day")
    )


def read_reference_layout_day(
    spark: SparkSession, base: str, interval: str, date_str: str
) -> DataFrame:
    """Compatibility scan of the reference's literal file layout."""
    return spark.read.parquet(day_path(base, interval, date_str))


def write_reference_layout_day(
    df: DataFrame, base: str, interval: str, date_str: str
) -> str:
    """Compatibility sink producing the reference's literal layout:
    ONE gzip parquet file at
    ``{base}/{interval}/{yyyy}/{mm}/{date}.parquet.gzip``
    (``stockdata/utils.py:61-86``) — so outputs round-trip with the
    original pandas tool (``pd.read_parquet`` on the exact path).

    A single file per day is the reference's contract, not a scale
    path: the day is coalesced to one partition and the lone part
    file renamed onto the target. Use :func:`write_bars_day` (the
    partitioned dataset) for everything except interop. Returns the
    written path.
    """
    import glob
    import shutil
    import tempfile

    target = day_path(base, interval, date_str)
    parent = os.path.dirname(target)
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=parent, prefix="._ref_day_tmp_")
    try:
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("compression", "gzip")
            .parquet(tmp)
        )
        part = glob.glob(os.path.join(tmp, "part-*.parquet*"))[0]
        os.replace(part, target)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return target


def read_ticker_csv(
    spark: SparkSession, path: str, extra: tuple[str, ...] = ("SPY", "VOO")
) -> DataFrame:
    """Ticker-universe CSV scan (S2, ``data_download_yahoo.py:20-24``):
    reads the symbol column and appends the reference's two literal
    extras."""
    base = spark.read.csv(path, header=True).select(F.col("Symbol").alias("ticker"))
    extras = spark.createDataFrame([(t,) for t in extra], ["ticker"])
    return base.unionByName(extras).distinct()


def list_day_files(base: str, interval: str) -> list[str]:
    """Directory listing utility (S5, ``stockdata/utils.py:39-47``)."""
    root = os.path.join(base, interval)
    out: list[str] = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in files)
    return sorted(out)


def write_bucketed_bars(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 64,
    key_col: str = "ticker",
    ws_col: str = "window_start",
) -> None:
    """Bucketed bars table (DESIGN.md §6): co-locate every series'
    rows in a fixed bucket file, pre-sorted by (key, time).

    A scan of this table reports hash-partitioning on ``key_col`` to
    Catalyst, so per-series windows, groupBys, and co-bucketed joins
    run with ZERO shuffle — the structural win for a daily indicator
    job over a 100 TB archive (asserted in tests/test_plans.py).
    """
    (
        df.write.bucketBy(n_buckets, key_col)
        .sortBy(key_col, ws_col)
        .mode("overwrite")
        .option("path", path)
        .saveAsTable(table)
    )
