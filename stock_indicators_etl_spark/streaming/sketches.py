"""Streaming heavy hitters (custom stateful operator #3).

The batch operator (:func:`..llmdata.sketches.heavy_hitters`) makes
two passes; a stream cannot re-read history, so this twin keeps the
Misra–Gries summaries AS the streaming state: tokens hash to
``n_groups`` state keys, and each key's state is one MG summary of
``capacity`` counters, merged per micro-batch via
``applyInPandasWithState`` (add batch counts, subtract the
(capacity+1)-th largest, drop ≤0 — the mergeable-summaries rule).

Total state is bounded at ``n_groups · capacity`` counters forever,
regardless of stream length or vocabulary size. The guarantee
transfers per group: a token with global frequency > N_g/(cap+1) of
its group's token volume survives its group's summary, so the union
of summaries after any prefix contains every token whose frequency
exceeds N/(cap+1) of the whole prefix — the same candidate contract
as the batch operator's pass 1 (the exact-recount pass 2 is a batch
join the caller runs on demand; tested for candidate-superset parity
in ``tests/test_sources_streaming.py``).

``n_groups`` also sets the parallelism of state maintenance — one
task per group per trigger — so pick it near the executor-slot count
at scale, not 1 (a single global summary would serialize the stream).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from stock_indicators_etl_spark.llmdata.text import spread, words

OUT_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.IntegerType(), False),
        T.StructField("token", T.StringType()),
        T.StructField("wt", T.LongType()),
        # cumulative tokens this group has absorbed — monotone per
        # trigger (identifies the freshest emission) AND the group's
        # MG error bound: true_count − wt ≤ n_seen/(capacity+1)
        T.StructField("n_seen", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("wts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def streaming_heavy_hitters(
    docs: DataFrame,
    capacity: int = 256,
    n_groups: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Per-trigger MG summaries ``(grp, token, wt)`` over the stream
    prefix; state bounded at n_groups·capacity counters."""

    toks = spread(docs).select(
        F.explode(words(F.col(text_col))).alias("token")
    )
    grouped = toks.withColumn(
        "grp", F.pmod(F.xxhash64("token"), F.lit(n_groups)).cast("int")
    )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            tokens, wts, n_seen = state.get
            summary = dict(zip(tokens, wts))
        else:
            summary, n_seen = {}, 0
        for pdf in pdfs:
            n_seen += len(pdf)
            for tok, cnt in pdf["token"].value_counts().items():
                summary[tok] = summary.get(tok, 0) + int(cnt)
            if len(summary) > capacity:
                thresh = sorted(summary.values(), reverse=True)[capacity]
                summary = {
                    t: c - thresh for t, c in summary.items() if c > thresh
                }
        state.update(
            (
                list(summary.keys()),
                [int(v) for v in summary.values()],
                int(n_seen),
            )
        )
        yield pd.DataFrame(
            {
                "grp": int(key[0]),
                "token": list(summary.keys()),
                "wt": [int(v) for v in summary.values()],
                "n_seen": int(n_seen),
            }
        )

    return grouped.groupBy("grp").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
