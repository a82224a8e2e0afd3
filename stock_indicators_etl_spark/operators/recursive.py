"""Recursive indicators over Spark via Arrow-batched pandas UDFs
(SURVEY.md §2.8 path 2: W7 RSI, W10 CMO, W12 MACDFIX, W15 ADX).

Wilder/EMA recursions are inherently sequential per series, so they
cannot be expressed as window frames. Instead of the textbook
``groupBy(key).applyInPandas`` (which pays ~ms-scale Arrow plumbing
per *group* — ruinous with many short series, and whose task count
gets byte-size-coalesced by AQE even though the stage is
Python-CPU-bound), this uses the fused pattern:

    repartition(N, key) → sortWithinPartitions(key, ws)
      → mapInPandas(partition-level compute)

Each task receives whole series as contiguous, time-sorted runs and
computes every group with plain numpy slicing — Arrow batches stream
through with only the trailing (possibly batch-straddling) series
held back, so peak memory is O(batch + longest series), not
O(partition). N is pinned (explicit repartition), so parallelism
matches cores rather than shuffle bytes, and scales freely with
cluster size because the repartition is on the series key.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from stock_indicators_etl_spark.operators.kernels import (
    adx_kernel,
    aroonosc_talib_kernel,
    cmo_kernel,
    macdfix_kernel,
    rsi_kernel,
)

RECURSIVE_COLS = ["rsi", "cmo", "macd_hist", "adx_di_diff", "adx", "aroonosc_strict"]


def with_recursive_indicators(
    df: DataFrame,
    close_col: str = "adj_close",
    high_col: str = "high",
    low_col: str = "low",
    close_unadj_col: str = "close",
    key_cols: Sequence[str] = ("sub_ticker",),
    ws_col: str = "window_start",
    rsi_n: int = 14,
    cmo_n: int = 14,
    macd_signal: int = 9,
    adx_n: int = 14,
    aroonosc_n: int = 25,
    features: Sequence[str] = ("rsi", "cmo", "macd", "adx"),
    num_partitions: int | None = None,
    pre_partitioned: bool = False,
) -> DataFrame:
    """Append raw (unscaled) recursive indicator columns per series.

    Adds (gated by ``features``): ``rsi``, ``cmo``, ``macd_hist``,
    ``adx_di_diff`` (= +DI − −DI, the reference's ``adx_hist`` before
    scaling) and ``adx``. RSI/CMO/MACD read ``close_col``
    (adj_close); ADX reads high/low/``close_unadj_col``
    (``stockdata/indicators.py:269,468``).

    ``"aroonosc"`` in ``features`` additionally emits
    ``aroonosc_strict`` — AROONOSC under TA-Lib's path-dependent tie
    rule (:func:`~stock_indicators_etl_spark.operators.kernels.aroonosc_talib_kernel`),
    a sequential per-series scan like the Wilder family. The
    frame-expressible default lives in ``rolling.with_aroonosc``;
    this variant is selected by ``IndicatorConfig.strict_talib_ties``.

    ``pre_partitioned``: caller guarantees the input is already
    hash-partitioned by ``key_cols`` and sorted by (keys, ws) within
    partitions — true immediately after any window op with spec
    ``partitionBy(keys).orderBy(ws)`` — so the repartition+sort here
    would be a redundant full shuffle and is skipped.
    """
    features = list(features)
    keys = list(key_cols)
    wanted: list[str] = []
    if "rsi" in features:
        wanted.append("rsi")
    if "cmo" in features:
        wanted.append("cmo")
    if "macd" in features:
        wanted.append("macd_hist")
    if "adx" in features:
        wanted += ["adx_di_diff", "adx"]
    if "aroonosc" in features:
        wanted.append("aroonosc_strict")
    if not wanted:
        return df
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(c, T.DoubleType(), True) for c in wanted]
    )

    def compute_frame(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        close = pdf[close_col].to_numpy(dtype=np.float64, na_value=np.nan)
        if "adx_di_diff" in wanted or "aroonosc_strict" in wanted:
            high = pdf[high_col].to_numpy(dtype=np.float64, na_value=np.nan)
            low = pdf[low_col].to_numpy(dtype=np.float64, na_value=np.nan)
        if "adx_di_diff" in wanted:
            cun = pdf[close_unadj_col].to_numpy(dtype=np.float64, na_value=np.nan)
        out = {c: np.full(m, np.nan) for c in wanted}
        # rows are sorted by (keys, ws): every series is one
        # contiguous, already-time-ordered run — pure numpy slicing.
        for idx in pdf.groupby(keys, sort=False).indices.values():
            s = slice(idx[0], idx[-1] + 1)
            if "rsi" in wanted:
                out["rsi"][s] = rsi_kernel(close[s], rsi_n)
            if "cmo" in wanted:
                out["cmo"][s] = cmo_kernel(close[s], cmo_n)
            if "macd_hist" in wanted:
                _, _, hist = macdfix_kernel(close[s], macd_signal)
                out["macd_hist"][s] = hist
            if "adx_di_diff" in wanted:
                pdi, mdi, adx = adx_kernel(high[s], low[s], cun[s], adx_n)
                out["adx_di_diff"][s] = pdi - mdi
                out["adx"][s] = adx
            if "aroonosc_strict" in wanted:
                out["aroonosc_strict"][s] = aroonosc_talib_kernel(
                    high[s], low[s], aroonosc_n
                )
        for c in wanted:
            pdf[c] = out[c]
        return pdf

    def compute_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Stream Arrow batches: a series may straddle batch boundaries,
        # so hold back the trailing key's rows and process everything
        # before them. Peak memory is O(batch + longest series), NOT
        # O(partition) — the property that lets one task own many
        # series at archive scale.
        held: pd.DataFrame | None = None
        for b in batches:
            if held is not None:
                b = pd.concat([held, b], ignore_index=True)
                held = None
            if len(b) == 0:
                continue
            last_key = tuple(b.iloc[-1][k] for k in keys)
            is_last = np.logical_and.reduce(
                [(b[k] == v).to_numpy() for k, v in zip(keys, last_key)]
            )
            # sorted by key → the last key's rows are a contiguous tail
            cut = int(len(b) - is_last.sum())
            if cut > 0:
                yield compute_frame(b.iloc[:cut].reset_index(drop=True))
            held = b.iloc[cut:].reset_index(drop=True)
        if held is not None and len(held):
            yield compute_frame(held)

    if pre_partitioned:
        rep = df
    else:
        sess = df.sparkSession
        n_parts = num_partitions or int(sess.conf.get("spark.sql.shuffle.partitions"))
        rep = df.repartition(n_parts, *keys).sortWithinPartitions(*keys, ws_col)
    return rep.mapInPandas(compute_partition, schema=schema)
