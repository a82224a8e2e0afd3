"""Streaming trailing-window rate counter — the rate-limiting shape.

Streaming twin of ``queries.q_sliding_counts``'s per-event core: for
every event, the count and integer-cents value sum of the SAME KEY's
events in the trailing window — emitted as the event arrives, which
is the form a rate limiter / burst detector actually consumes (the
batch RANGE-frame query computes the same numbers after the fact).

State per key is the (ts, cents) pairs still inside the window
horizon of the newest event seen — bounded by the window's event
capacity, evicted by time as the stream advances, never by row count.
Counts are over ARRIVED events: with per-key in-order arrival the
emitted numbers are bit-identical to the batch RANGE frame (pinned by
the parity test); an out-of-order straggler is counted from its
arrival onward but already-emitted rows are not retracted — the
standard streaming-vs-batch caveat, stated rather than hidden.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE = T.StructType(
    [
        T.StructField("ts", T.ArrayType(T.LongType())),
        T.StructField("cents", T.ArrayType(T.LongType())),
    ]
)


def streaming_sliding_counts(
    events: DataFrame,
    window_ns: int = 3_600 * 10**9,
    key_col: str = "user_id",
    ts_col: str = "ns",
    val_col: str = "value",
) -> DataFrame:
    """Emit (key, ts, n_win, cents_win) per event: trailing-window
    activity including the event itself; simultaneous events all see
    the full tie group (RANGE-frame semantics, via bisect bounds)."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField(ts_col, T.LongType()),
            T.StructField("n_win", T.LongType()),
            T.StructField("cents_win", T.LongType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            old_ts, old_cents = state.get
            old_ts = np.asarray(old_ts, dtype=np.int64)
            old_cents = np.asarray(old_cents, dtype=np.int64)
        else:
            old_ts = np.empty(0, dtype=np.int64)
            old_cents = np.empty(0, dtype=np.int64)

        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        new_ts = pdf[ts_col].to_numpy(dtype=np.int64)
        new_cents = np.floor(
            pdf[val_col].to_numpy(dtype=np.float64) * 100 + 0.5
        ).astype(np.int64)

        # merged in-window history (state is already ts-sorted; the
        # batch is sorted above; state ts all precede in-order input)
        ts = np.concatenate([old_ts, new_ts])
        cents = np.concatenate([old_cents, new_cents])
        order = np.argsort(ts, kind="stable")
        ts, cents = ts[order], cents[order]
        csum = np.concatenate([[0], np.cumsum(cents)])

        lo = np.searchsorted(ts, new_ts - window_ns, side="left")
        hi = np.searchsorted(ts, new_ts, side="right")
        n_win = hi - lo
        cents_win = csum[hi] - csum[lo]

        keep = ts >= (ts[-1] - window_ns if len(ts) else 0)
        state.update((ts[keep].tolist(), cents[keep].tolist()))
        yield pd.DataFrame(
            {
                key_col: key[0],
                ts_col: new_ts,
                "n_win": n_win.astype(np.int64),
                "cents_win": cents_win.astype(np.int64),
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
