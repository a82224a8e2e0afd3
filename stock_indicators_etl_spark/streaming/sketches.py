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


# ---------------------------------------------------------------------------
# streaming KMV distinct counter (custom stateful operator)
# ---------------------------------------------------------------------------

KMV_OUT_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.StringType()),
        T.StructField("n_kept", T.LongType()),
        T.StructField("kth_hash", T.LongType()),
        T.StructField("est_distinct", T.DoubleType()),
        # cumulative grams absorbed — monotone per trigger, identifies
        # the freshest emission exactly like streaming_heavy_hitters
        T.StructField("n_seen", T.LongType()),
    ]
)

KMV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("mins", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def streaming_kmv_distinct(
    docs: DataFrame,
    k: int = 64,
    group_col: str = "lang",
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """Streaming twin of :func:`..llmdata.sketches.kmv_distinct`: the
    per-group K-minimum-values sketch IS the streaming state (k
    int64s per group, forever), merged per micro-batch via
    ``applyInPandasWithState``. KMV mergeability makes the twin
    *exact*, not approximate, relative to the batch operator: after
    any stream prefix the state holds precisely the k smallest
    distinct hashes of that prefix, so the freshest emission equals
    ``kmv_distinct`` over the union of all micro-batches —
    batch-parity is an equality test, not a tolerance test
    (tests/test_sketches.py).

    Hashing stays JVM-side (``h56`` before the stateful op); the
    Python state update is ``np.union1d`` + head-k per batch.
    """
    import numpy as np

    from stock_indicators_etl_spark.llmdata.hashing import HASH_DOMAIN, h56
    from stock_indicators_etl_spark.llmdata.sketches import _group_grams

    if k < 2:
        raise ValueError("streaming_kmv_distinct needs k >= 2")
    hashed = _group_grams(docs, group_col, text_col, ngram).select(
        F.col(group_col).alias("grp"), h56(F.col("gram")).alias("h")
    )
    numer = float((k - 1) * HASH_DOMAIN)

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            mins, n_seen = state.get
            cur = np.asarray(mins, dtype=np.int64)
        else:
            cur, n_seen = np.empty(0, dtype=np.int64), 0
        for pdf in pdfs:
            n_seen += len(pdf)
            hs = np.unique(pdf["h"].to_numpy(dtype=np.int64))
            cur = np.union1d(cur, hs)[:k]
        state.update(([int(v) for v in cur], int(n_seen)))
        full = len(cur) >= k
        yield pd.DataFrame(
            {
                "grp": [key[0]],
                "n_kept": [len(cur)],
                "kth_hash": [int(cur[k - 1]) if full else None],
                "est_distinct": [
                    numer / float(cur[k - 1]) if full else float(len(cur))
                ],
                "n_seen": [int(n_seen)],
            }
        )

    return hashed.groupBy("grp").applyInPandasWithState(
        update,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming HyperLogLog distinct counter
# ---------------------------------------------------------------------------

HLL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.StringType()),
        T.StructField("zero_registers", T.LongType()),
        T.StructField("register_sum", T.LongType()),
        T.StructField("raw_est", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

HLL_STATE_SCHEMA = T.StructType(
    [
        # dense register file: HLL_M small ints, fixed size forever
        T.StructField("regs", T.ArrayType(T.IntegerType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def streaming_hll_distinct(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """Streaming twin of :func:`..llmdata.sketches.hll_distinct`: the
    dense HLL register file (m small ints per group, fixed size
    forever) is the state; per-register ``max`` is mergeable, so the
    freshest emission EQUALS the batch operator over the union of all
    micro-batches — exact-equality parity, same contract as
    :func:`streaming_kmv_distinct`.

    The register index and rho rank are computed JVM-side (the same
    shift/bin expressions as the batch plan); the Python state update
    is one ``np.maximum.at`` scatter per batch.
    """
    import numpy as np

    from stock_indicators_etl_spark.llmdata.hashing import h56
    from stock_indicators_etl_spark.llmdata.sketches import (
        _HLL_R,
        _HLL_SUFFIX_BITS,
        HLL_M,
        HLL_NUMER,
        _group_grams,
    )

    sb, rmax = _HLL_SUFFIX_BITS, _HLL_R
    hashed = _group_grams(docs, group_col, text_col, ngram).select(
        F.col(group_col).alias("grp"), h56(F.col("gram")).alias("h")
    )
    regs_in = hashed.select(
        "grp",
        F.shiftright(F.col("h"), sb).cast("int").alias("idx"),
        F.when(F.col("h").bitwiseAND(F.lit((1 << sb) - 1)) == 0, F.lit(rmax))
        .otherwise(
            F.lit(sb + 1)
            - F.length(F.bin(F.col("h").bitwiseAND(F.lit((1 << sb) - 1))))
        )
        .cast("int")
        .alias("rho"),
    )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            regs_list, n_seen = state.get
            regs = np.asarray(regs_list, dtype=np.int32)
        else:
            regs, n_seen = np.zeros(HLL_M, dtype=np.int32), 0
        for pdf in pdfs:
            n_seen += len(pdf)
            np.maximum.at(
                regs,
                pdf["idx"].to_numpy(dtype=np.int64),
                pdf["rho"].to_numpy(dtype=np.int32),
            )
        state.update(([int(v) for v in regs], int(n_seen)))
        s = int(sum(1 << (rmax - int(r)) for r in regs))
        yield pd.DataFrame(
            {
                "grp": [key[0]],
                "zero_registers": [int((regs == 0).sum())],
                "register_sum": [s],
                "raw_est": [HLL_NUMER / float(s)],
                "n_seen": [int(n_seen)],
            }
        )

    return regs_in.groupBy("grp").applyInPandasWithState(
        update,
        outputStructType=HLL_OUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
