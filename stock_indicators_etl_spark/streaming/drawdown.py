"""Streaming maximum-drawdown monitor (custom stateful operator).

Twin of ``queries.q_drawdown``'s running-extremum closed form: the
batch statistic needs only the running peak and the best (drawdown,
trough) seen so far — so the streaming state is TWO scalars plus the
trough bookkeeping per key, O(1) forever, and the freshest emission
equals the batch operator on the stream prefix (exact integer
parity; earliest-trough tie rule preserved across micro-batches).

Emits one row per key per trigger (update mode) — the live risk
monitor shape: a portfolio system alerts when ``max_dd_cents``
crosses a limit without ever rescanning history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DD_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("max_dd_cents", T.LongType()),
        T.StructField("peak_cents", T.LongType()),
        T.StructField("trough_cents", T.LongType()),
        T.StructField("trough_ts", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

DD_STATE_SCHEMA = T.StructType(
    [
        T.StructField("peak", T.LongType()),
        T.StructField("best_dd", T.LongType()),
        T.StructField("best_peak", T.LongType()),
        T.StructField("best_trough", T.LongType()),
        T.StructField("best_ts", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def streaming_drawdown(
    events: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    cents_col: str = "cents",
    id_col: str | None = None,
) -> DataFrame:
    """Per-key running maximum drawdown over an integer-cents stream.

    Tie rule: the EARLIEST row attaining the maximum drawdown is the
    reported trough (strict ``>`` on update), matching the batch
    argmax's ``(dd desc, ts asc)`` order.

    ``id_col``: unique within-micro-batch sort tiebreak (see
    ``streaming_cusum``) — the running peak is order-sensitive under
    duplicate ``(key, ts)``; pass the stream's event id when
    timestamps are not unique per key. Default sorts by
    ``(ts, cents)``.
    """
    sort_cols = [ts_col, id_col] if id_col else [ts_col, cents_col]

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            peak, best_dd, best_peak, best_trough, best_ts, n_seen = state.get
        else:
            peak, best_dd, best_peak, best_trough, best_ts, n_seen = (
                None, -1, None, None, None, 0,
            )
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(sort_cols)
            for t, c in zip(pdf[ts_col], pdf[cents_col]):
                c, t = int(c), int(t)
                peak = c if peak is None else max(peak, c)
                dd = peak - c
                if dd > best_dd:
                    best_dd, best_peak, best_trough, best_ts = dd, peak, c, t
                n_seen += 1
        state.update(
            (peak, int(best_dd), best_peak, best_trough, best_ts, int(n_seen))
        )
        if n_seen:
            yield pd.DataFrame(
                {
                    "key": [int(key[0])],
                    "max_dd_cents": [int(best_dd)],
                    "peak_cents": [int(best_peak)],
                    "trough_cents": [int(best_trough)],
                    "trough_ts": [int(best_ts)],
                    "n_seen": [int(n_seen)],
                }
            )

    keep = [
        events[key_col].alias("key"),
        events[ts_col].alias(ts_col) if ts_col != "ts" else events[ts_col],
        events[cents_col].alias(cents_col)
        if cents_col != "cents"
        else events[cents_col],
    ]
    if id_col and id_col not in (key_col, ts_col, cents_col):
        keep.append(events[id_col])
    return events.select(*keep).groupBy("key").applyInPandasWithState(
        update,
        outputStructType=DD_OUT_SCHEMA,
        stateStructType=DD_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
