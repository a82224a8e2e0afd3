"""Streaming CUSUM change detector (custom stateful operator).

Twin of :func:`..operators.stats.cusum`: the batch operator computes
Page's ``s_t = max(0, s_{t−1} + x_t − k)`` via its prefix-sum closed
form (two window aggregates); the streaming twin keeps the ONE number
the recurrence actually needs — the current ``s`` per key — as
``applyInPandasWithState`` state, so state is O(1) per key forever
and every emitted row equals the batch operator run on the stream
prefix (exact integer parity, tested cross-micro-batch).

Within a micro-batch, rows for a key can span Arrow chunks with
interleaved timestamps, so ALL chunks are concatenated and sorted
before folding (the established twin pattern — streaming/funnel.py,
streaming/scd.py). Late rows across triggers are NOT reordered (state
has already advanced) — the usual streaming-vs-batch caveat, same as
the other twins; pair with a watermark-sorted source when ordering
matters.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CUSUM_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("cusum", T.LongType()),
        T.StructField("alarm", T.BooleanType()),
    ]
)

CUSUM_STATE_SCHEMA = T.StructType([T.StructField("s", T.LongType())])


def streaming_cusum(
    events: DataFrame,
    k: int,
    h: int,
    key_col: str = "key",
    ts_col: str = "ts",
    x_col: str = "x",
    id_col: str | None = None,
) -> DataFrame:
    """Per-row CUSUM statistic + alarm over a keyed integer stream.

    ``events`` must carry integer ``x`` (e.g. cents); ``k`` is the
    reference level, ``h`` the decision threshold — identical
    semantics to :func:`..operators.stats.cusum`.

    ``id_col``: a UNIQUE column used as the within-micro-batch sort
    tiebreak, matching the batch operator's ``tiebreak_cols`` — the
    max(0,·) fold is order-sensitive, so duplicate ``(key, ts)`` rows
    would otherwise break batch parity. Pass the stream's event id
    whenever timestamps are not unique per key (the batch oracle
    ``q_cusum`` tiebreaks on ``event_id`` for the same reason).
    Default ``None`` falls back to ``x`` (deterministic, and
    sufficient for the fold: equal ``(ts, x)`` rows are
    interchangeable in the recurrence).
    """
    sort_cols = [ts_col, id_col] if id_col else [ts_col, x_col]

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        s = state.get[0] if state.exists else 0
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(sort_cols)
            out_ts, out_s, out_a = [], [], []
            for t, x in zip(pdf[ts_col], pdf[x_col]):
                s = max(0, s + int(x) - int(k))
                out_ts.append(int(t))
                out_s.append(s)
                out_a.append(s > int(h))
            state.update((int(s),))
            yield pd.DataFrame(
                {
                    "key": [int(key[0])] * len(out_ts),
                    "ts": out_ts,
                    "cusum": out_s,
                    "alarm": out_a,
                }
            )
        else:
            state.update((int(s),))

    keep = [
        events[key_col].alias("key"),
        events[ts_col].alias(ts_col) if ts_col != "ts" else events[ts_col],
        events[x_col].alias(x_col) if x_col != "x" else events[x_col],
    ]
    if id_col and id_col not in (key_col, ts_col, x_col):
        keep.append(events[id_col])
    return events.select(*keep).groupBy("key").applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
