"""Recursive indicators over Spark via Arrow-batched grouped-map
(SURVEY.md §2.8 path 2: W7 RSI, W10 CMO, W12 MACDFIX, W15 ADX).

Wilder/EMA recursions are inherently sequential per series, so they
cannot be expressed as window frames; one ``applyInPandas`` pass per
series computes all four families together (one shuffle — and when the
upstream plan is already hash-partitioned by the same key, none).

Scale notes: group size is bounded (one series per group, ≤ a few
thousand rows for intraday bars), so Arrow batches stay small; the
kernels are vectorized C-speed (numpy + pandas ewm), not per-row
Python.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from stock_indicators_etl_spark.operators.kernels import (
    adx_kernel,
    cmo_kernel,
    macdfix_kernel,
    rsi_kernel,
)

RECURSIVE_COLS = ["rsi", "cmo", "macd_hist", "adx_di_diff", "adx"]


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
    features: Sequence[str] = ("rsi", "cmo", "macd", "adx"),
) -> DataFrame:
    """Append raw (unscaled) recursive indicator columns per series.

    Adds (gated by ``features``): ``rsi``, ``cmo``, ``macd_hist``,
    ``adx_di_diff`` (= +DI − −DI, the reference's ``adx_hist`` before
    scaling) and ``adx``. RSI/CMO/MACD read ``close_col``
    (adj_close); ADX reads high/low/``close_unadj_col``
    (``stockdata/indicators.py:269,468``).
    """
    features = list(features)
    out_fields = list(df.schema.fields)
    wanted: list[str] = []
    if "rsi" in features:
        wanted.append("rsi")
    if "cmo" in features:
        wanted.append("cmo")
    if "macd" in features:
        wanted.append("macd_hist")
    if "adx" in features:
        wanted += ["adx_di_diff", "adx"]
    if not wanted:
        return df
    schema = T.StructType(
        out_fields + [T.StructField(c, T.DoubleType(), True) for c in wanted]
    )

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ws_col).reset_index(drop=True)
        if "rsi" in wanted:
            pdf["rsi"] = rsi_kernel(pdf[close_col].to_numpy(), rsi_n)
        if "cmo" in wanted:
            pdf["cmo"] = cmo_kernel(pdf[close_col].to_numpy(), cmo_n)
        if "macd_hist" in wanted:
            _, _, hist = macdfix_kernel(pdf[close_col].to_numpy(), macd_signal)
            pdf["macd_hist"] = hist
        if "adx" in wanted:
            pdi, mdi, adx = adx_kernel(
                pdf[high_col].to_numpy(),
                pdf[low_col].to_numpy(),
                pdf[close_unadj_col].to_numpy(),
                adx_n,
            )
            pdf["adx_di_diff"] = pdi - mdi
            pdf["adx"] = adx
        return pdf

    return df.groupBy(*key_cols).applyInPandas(compute, schema=schema)
