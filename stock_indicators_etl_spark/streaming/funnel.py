"""Streaming funnel conversions (custom stateful operator #2).

The batch funnel (:mod:`..operators.funnel`) re-aggregates history;
this is the incremental twin via ``applyInPandasWithState``: per-user
state is exactly the funnel progression — one epoch-ns per step
(−1 = not reached) plus a done flag — so state is O(steps) per user
regardless of event volume, and a conversion is emitted exactly once,
in the micro-batch whose events complete the chain.

Semantics match the batch operator's earliest-strict-order chain
(greedy update: step *i* fires on the first event of its type
strictly after step *i−1*'s time) under the same event-time-order
contract as :func:`..streaming.indicators.streaming_rsi` — in-order
feeds (file-per-day replays) are exact; out-of-order feeds need an
upstream sort or watermark-delayed emit. ``within_ns`` gates
*emission*: a chain completed too slowly is finalized (state frozen)
but never emitted, mirroring batch ``converted=False``.

The per-event Python loop is bounded by rows-per-user-per-micro-batch
(small by construction); state updates are O(1) per event.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_funnel(
    events: DataFrame,
    steps: Sequence[str],
    within_ns: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ns",
) -> DataFrame:
    """Emit ``(user_id, t_0..t_k, duration_ns)`` once per user, in the
    micro-batch that completes their earliest strict-order funnel."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    k = len(steps)
    step_ix = {s: i for i, s in enumerate(steps)}

    state_schema = T.StructType(
        [
            T.StructField("times", T.ArrayType(T.LongType())),
            T.StructField("done", T.BooleanType()),
        ]
    )
    out_schema = T.StructType(
        [T.StructField(user_col, T.LongType())]
        + [T.StructField(f"t_{i}", T.LongType()) for i in range(k)]
        + [T.StructField("duration_ns", T.LongType())]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            times, done = state.get
            times = list(times)
        else:
            times, done = [-1] * k, False

        emitted = None
        if not done:
            pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
            for ty, ts in zip(pdf[type_col], pdf[ts_col]):
                i = step_ix.get(ty)
                if i is None or times[i] >= 0:
                    continue
                if i == 0:
                    times[0] = int(ts)
                elif times[i - 1] >= 0 and ts > times[i - 1]:
                    times[i] = int(ts)
                if times[k - 1] >= 0:
                    done = True
                    dur = times[k - 1] - times[0]
                    if within_ns is None or dur <= within_ns:
                        emitted = pd.DataFrame(
                            [[key[0], *times, dur]],
                            columns=[user_col]
                            + [f"t_{i}" for i in range(k)]
                            + ["duration_ns"],
                        )
                    break

        state.update((times, done))
        if emitted is not None:
            yield emitted

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
