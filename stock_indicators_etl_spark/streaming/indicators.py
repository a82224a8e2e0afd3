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
store scales with #series, not #rows. Within a micro-batch the only
Python-level loop is the seed phase (at most ``n`` iterations over
the whole life of a series); once the state is seeded, the rest of
the batch replays the *batch kernel's own recursion*
(``_seeded_recursion``), so streaming output is bit-identical to
``rsi_kernel`` on the concatenated series — the same y·(1−1/n) +
x·(1/n) IEEE sequence, just resumed from the stored state at each
batch seam. Event-time order is the caller's contract (file-per-day
sources and ordered replays satisfy it; out-of-order feeds need an
upstream sort or watermark-delayed emit).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from stock_indicators_etl_spark.operators.kernels import _seeded_recursion

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
    **bit-identical** to the batch ``rsi_kernel`` (left-fold SMA seed
    of the first n gains/losses, Wilder recursion after; raw 0–100
    scale).
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

        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        closes = pdf[close_col].to_numpy(dtype=np.float64)
        ts = pdf[ts_col].to_numpy(dtype=np.int64)
        m = len(closes)
        rsi = np.full(m, np.nan)

        if m:
            if last_close is None:
                # first-ever row of the series contributes no diff
                d = np.diff(closes)
                offset = 1
            else:
                d = np.diff(np.concatenate(([last_close], closes)))
                offset = 0
            gains = np.maximum(d, 0.0)
            losses = np.maximum(-d, 0.0)

            # seed phase: left-fold sums of the first n diffs — the
            # exact accumulation _lfold_mean performs in the batch
            # kernel, resumable across batch seams. Bounded: runs at
            # most n times over the life of a series.
            i = 0
            while i < len(d) and n_diffs < n:
                sum_gain += gains[i]
                sum_loss += losses[i]
                n_diffs += 1
                if n_diffs == n:
                    avg_gain = sum_gain / n
                    avg_loss = sum_loss / n
                    den = avg_gain + avg_loss
                    rsi[i + offset] = 0.0 if den == 0.0 else 100.0 * avg_gain / den
                i += 1

            # steady state: replay the batch kernel's recursion over
            # the remainder of the micro-batch in one call
            if n_diffs >= n and i < len(d):
                ag = _seeded_recursion(avg_gain, gains[i:], 1.0 / n)[1:]
                al = _seeded_recursion(avg_loss, losses[i:], 1.0 / n)[1:]
                den = ag + al
                rsi[i + offset :] = np.where(
                    den == 0.0, 0.0, 100.0 * ag / np.where(den == 0.0, 1.0, den)
                )
                avg_gain, avg_loss = float(ag[-1]), float(al[-1])

            last_close = float(closes[-1])

        state.update((last_close, n_diffs, sum_gain, sum_loss, avg_gain, avg_loss))
        out = pd.DataFrame({key_col: key[0], ts_col: ts, "rsi": rsi})
        out["rsi"] = out["rsi"].astype(object).where(~np.isnan(rsi), None)
        yield out

    return bars.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=RSI_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
