"""Streaming Welch-t drift monitor (custom stateful operator).

Twin of :func:`..operators.stats.welch_drift` — the PARAMETRIC live
monitor, and the cheapest possible streaming drift state: the
baseline snapshot reduces once to THREE exact integers per key
(n, Σc, Σc²), and the stream's state is the same three integers —
O(1) per key forever, no histogram, no value buffer. Every trigger
emits the key's Welch t statistic for the stream prefix against the
baseline via the IDENTICAL fixed IEEE sequence as the batch
operator, so after any prefix the emission EQUALS
``welch_drift(baseline, prefix)`` — equality parity, not tolerance
(the 22nd batch≡stream twin).

State-width contract: Σc² accumulates in an int64 (the Arrow state
column) — exact while ``n·max(c)² < 2⁶³`` per key, the same bound
class as the streaming CUSUM's BIGINT cents; the BATCH twin uses
DECIMAL(38,0) and has no such bound. A key that can exceed it wants
the batch monitor on micro-batch checkpoints instead.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

WELCH_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_a", T.LongType()),
        T.StructField("n_b", T.LongType()),
        T.StructField("mean_shift_cents", T.DoubleType()),
        T.StructField("t_stat", T.DoubleType()),
        T.StructField("dof", T.DoubleType()),
    ]
)

WELCH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.LongType()),
        T.StructField("ss", T.LongType()),
    ]
)


def welch_baseline(
    df: DataFrame, key_col: str, value_col: str
) -> pd.DataFrame:
    """Per-key exact (n_a, Σc, Σc²) of the baseline snapshot — the
    three-integer artifact the stream monitors against. One
    combinable aggregate; collected (|keys| rows)."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    return (
        df.select(F.col(key_col).alias("key"), cents.alias("_c"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_a"),
            F.sum("_c").alias("sa"),
            F.sum(F.col("_c") * F.col("_c")).alias("ssa"),
        )
        .toPandas()
    )


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def streaming_welch_drift(
    stream: DataFrame,
    baseline: pd.DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-trigger Welch t of the stream prefix against ``baseline``
    (from :func:`welch_baseline`). The emission replays the batch
    operator's exact op order — means, n−1 variances from the integer
    numerator ``n·Σc² − (Σc)²``, ``se² = va/na + vb/nb``, one sqrt —
    in Python's IEEE doubles, which match the JVM's bit-for-bit for
    the same fixed sequence (the convention every streaming twin
    leans on)."""
    prof = {
        r["key"]: (int(r["n_a"]), int(r["sa"]), int(r["ssa"]))
        for _, r in baseline.iterrows()
    }
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    keyed = stream.select(F.col(key_col).alias("key"), cents.alias("_c"))

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, ss = state.get
        else:
            n, s, ss = 0, 0, 0
        for pdf in pdfs:
            c = pdf["_c"]
            n += len(c)
            s += int(c.sum())
            ss += int((c.astype(object) * c.astype(object)).sum())
        state.update((int(n), int(s), int(ss)))
        base = prof.get(key[0], (0, 0, 0))
        n_a, sa, ssa = base
        na, nb = float(n_a), float(n)
        out = {
            "key": key[0],
            "n_a": n_a,
            "n_b": int(n),
            "mean_shift_cents": None,
            "t_stat": None,
            "dof": None,
        }
        if n_a > 0 and n > 0:
            ma = float(sa) / na
            mb = float(s) / nb
            out["mean_shift_cents"] = _r6(ma - mb)
            if n_a >= 2 and n >= 2:
                va = (na * float(ssa) - float(sa) * float(sa)) / (
                    na * (na - 1.0)
                )
                vb = (nb * float(ss) - float(s) * float(s)) / (
                    nb * (nb - 1.0)
                )
                se2 = va / na + vb / nb
                if se2 > 0:
                    out["t_stat"] = _r6((ma - mb) / math.sqrt(se2))
                    out["dof"] = _r6(
                        (se2 * se2)
                        / (
                            (va / na) * (va / na) / (na - 1.0)
                            + (vb / nb) * (vb / nb) / (nb - 1.0)
                        )
                    )
        yield pd.DataFrame([out])

    return keyed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=WELCH_OUT_SCHEMA,
        stateStructType=WELCH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
