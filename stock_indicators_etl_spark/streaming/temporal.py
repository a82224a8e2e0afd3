"""Streaming temporal (point-in-time) enrichment join.

Streaming twin of the batch ``scd2_history`` + ``asof_join``
composition (``queries.q_pit_join``): one tagged stream carries BOTH
dimension-change records and fact records; the per-key state is the
CURRENT dimension version — three scalars, O(1) forever — and every
fact is emitted with the version in effect at its arrival position.
This is the classic stream-enrichment shape (Flink's temporal table
join) built on ``applyInPandasWithState``.

Ordering contract: within a micro-batch all Arrow chunks are
concatenated and sorted by ``(ts, kind)`` with dimension rows FIRST
at equal timestamps — the same inclusive tie rule as the batch as-of
join (a version effective at t applies to a fact at t). Across
triggers the state has already advanced, so late dimension records
are not retro-applied — the streaming-vs-batch caveat every twin in
this package documents; emissions over an ordered prefix equal the
batch composition on that prefix (tested).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TEMPORAL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("val", T.LongType()),
        T.StructField("attr_asof", T.StringType()),
        T.StructField("version", T.LongType()),
    ]
)

TEMPORAL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("attr", T.StringType()),
        T.StructField("since", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)


def streaming_temporal_join(
    tagged: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    kind_col: str = "kind",
    attr_col: str = "attr",
    val_col: str = "val",
) -> DataFrame:
    """Enrich fact rows with the dimension attribute in effect.

    ``tagged`` rows: ``kind`` = 'dim' (a change record setting
    ``attr`` from ``ts`` on) or 'fact' (carrying integer ``val``).
    Facts that arrive before any dimension version get NULL attr and
    version 0 — never a future version (the leakage-safe contract).
    A repeated 'dim' row with the SAME attr does not bump the
    version (SCD2 run semantics, matching ``scd2_history``).
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            attr, since, version = state.get
        else:
            attr, since, version = None, None, 0
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            # dim rows first at equal ts (inclusive as-of tie rule);
            # attr as the final tiebreak for determinism
            pdf["_k"] = (pdf[kind_col] != "dim").astype("int64")
            pdf = pdf.sort_values([ts_col, "_k", attr_col], na_position="last")
            out = {"key": [], "ts": [], "val": [], "attr_asof": [], "version": []}
            for kind, t, a, v in zip(
                pdf[kind_col], pdf[ts_col], pdf[attr_col], pdf[val_col]
            ):
                if kind == "dim":
                    if attr is None or a != attr:
                        attr, since, version = a, int(t), version + 1
                else:
                    out["key"].append(int(key[0]))
                    out["ts"].append(int(t))
                    out["val"].append(int(v))
                    out["attr_asof"].append(attr)
                    out["version"].append(int(version))
            state.update((attr, None if since is None else int(since), int(version)))
            if out["key"]:
                yield pd.DataFrame(out)
        else:
            state.update((attr, None if since is None else int(since), int(version)))

    return tagged.select(
        tagged[key_col].alias("key"),
        tagged[ts_col].alias(ts_col) if ts_col != "ts" else tagged[ts_col],
        tagged[kind_col].alias(kind_col) if kind_col != "kind" else tagged[kind_col],
        tagged[attr_col].alias(attr_col) if attr_col != "attr" else tagged[attr_col],
        tagged[val_col].alias(val_col) if val_col != "val" else tagged[val_col],
    ).groupBy("key").applyInPandasWithState(
        update,
        outputStructType=TEMPORAL_OUT_SCHEMA,
        stateStructType=TEMPORAL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
