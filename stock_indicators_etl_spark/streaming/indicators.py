"""Custom stateful streaming indicators (SURVEY.md §2.7 extension).

The recursive Wilder family cannot be expressed as a streaming window
aggregate — each output depends on the entire series prefix. This
module provides the incremental-state formulation via
``applyInPandasWithState``: per series key, the state carries exactly
the O(1) sufficient statistics of the recursion (last close, seed
sums, Wilder averages), so an unbounded stream computes the same
values as the batch kernel (``operators/kernels.rsi_kernel``) with
bounded memory.

Scale notes: state size is constant per key (6 doubles), so the state
store scales with #series, not #rows. Rows within a micro-batch are
processed with a per-row loop (they arrive a few hundred per key per
trigger); the cross-batch recursion is the part that cannot be
vectorized. Event-time order is the caller's contract (file-per-day
sources and ordered replays satisfy it; out-of-order feeds need an
upstream sort or watermark-delayed emit).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RSI_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_close", T.DoubleType()),
        T.StructField("n_diffs", T.LongType()),
        T.StructField("sum_gain", T.DoubleType()),
        T.StructField("sum_loss", T.DoubleType()),
        T.StructField("avg_gain", T.DoubleType()),
        T.StructField("avg_loss", T.DoubleType()),
    ]
)


def streaming_rsi(
    bars: DataFrame,
    n: int = 14,
    key_col: str = "ticker",
    ts_col: str = "window_start",
    close_col: str = "adj_close",
) -> DataFrame:
    """Incremental Wilder RSI over a streaming bars DataFrame.

    Emits one row per input bar: (key, ts, rsi) — ``rsi`` is null for
    the first ``n`` bars of each series (TA-Lib lookback), then
    identical to the batch ``rsi_kernel`` (SMA seed of the first n
    gains/losses, Wilder recursion after; raw 0–100 scale).
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField(ts_col, T.LongType()),
            T.StructField("rsi", T.DoubleType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_close, n_diffs, sum_gain, sum_loss, avg_gain, avg_loss = state.get
        else:
            last_close, n_diffs = None, 0
            sum_gain = sum_loss = 0.0
            avg_gain = avg_loss = None

        ts_out: list[int] = []
        rsi_out: list[float | None] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, close in zip(pdf[ts_col], pdf[close_col]):
                rsi = None
                if last_close is not None:
                    d = close - last_close
                    g, lo = max(d, 0.0), max(-d, 0.0)
                    if n_diffs < n:
                        sum_gain += g
                        sum_loss += lo
                        n_diffs += 1
                        if n_diffs == n:
                            avg_gain = sum_gain / n
                            avg_loss = sum_loss / n
                    else:
                        avg_gain = (avg_gain * (n - 1) + g) / n
                        avg_loss = (avg_loss * (n - 1) + lo) / n
                    if n_diffs >= n:
                        den = avg_gain + avg_loss
                        rsi = 0.0 if den == 0.0 else 100.0 * avg_gain / den
                last_close = float(close)
                ts_out.append(int(ts))
                rsi_out.append(rsi)

        state.update((last_close, n_diffs, sum_gain, sum_loss, avg_gain, avg_loss))
        yield pd.DataFrame({key_col: key[0], ts_col: ts_out, "rsi": rsi_out})

    return bars.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=RSI_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
