"""Streaming SCD2 (custom stateful operator #4).

The batch operator (:func:`..operators.scd.scd2_history`) re-windows
history; this twin versions dimensions incrementally: per-key state
is just (current attr, its valid_from, version) — O(1) per entity
forever — and a CLOSED validity interval row is emitted in exactly
the micro-batch whose event changes the attribute. The live (open)
version lives in state, not output, so the output stream is
append-only (a closed interval never mutates) and can feed an
append-mode sink directly; the final open rows are recoverable from
the batch operator or a state flush at job end.

Same in-order event-time contract as the other streaming twins
(file-per-day replays are exact; out-of-order feeds need an upstream
sort or watermark-delayed emit). Cross-micro-batch batch-parity is
pinned in tests: streaming closed intervals == batch intervals with
``valid_to`` set.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_scd2(
    events: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
) -> DataFrame:
    """Emit ``(key, attr, valid_from, valid_to, version)`` for every
    CLOSED attribute run, in the micro-batch that closes it."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField(attr_col, T.StringType()),
            T.StructField("valid_from", T.LongType()),
            T.StructField("valid_to", T.LongType()),
            T.StructField("version", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("attr", T.StringType()),
            T.StructField("since", T.LongType()),
            T.StructField("version", T.LongType()),
        ]
    )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            attr, since, version = state.get
        else:
            attr, since, version = None, None, 0
        closed = []
        chunks = list(pdfs)
        if chunks:
            # Concat ALL Arrow chunks before sorting: rows for one key can
            # span chunks with interleaved timestamps, and a per-chunk sort
            # would produce wrong run boundaries (same pattern as
            # streaming/funnel.py and streaming/indicators.py).
            pdf = pd.concat(chunks, ignore_index=True).sort_values([ts_col, attr_col])
            for a, t in zip(pdf[attr_col], pdf[ts_col]):
                if attr is None:
                    attr, since, version = a, int(t), 1
                elif a != attr:
                    closed.append(
                        {
                            key_col: int(key[0]),
                            attr_col: attr,
                            "valid_from": int(since),
                            "valid_to": int(t),
                            "version": int(version),
                        }
                    )
                    attr, since, version = a, int(t), version + 1
        state.update((attr, int(since), int(version)))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[key_col, attr_col, "valid_from", "valid_to", "version"],
            )

    return events.select(key_col, attr_col, ts_col).groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
