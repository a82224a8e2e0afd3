"""Streaming distribution-drift monitor (custom stateful operator).

Twin of :func:`..operators.dq.histogram_drift`: the BASELINE snapshot
is profiled once up front (per-key bounds + bin counts — a bounded
keys×bins artifact, broadcast into the stream), and the stream's
per-key bin counts are the streaming state (``n_bins`` ints per key,
fixed size forever). Every trigger emits the key's EXACT
total-variation distance against the baseline via the same integer
statistic ``Σ|ca·nb − cb·na|`` + one IEEE division, so after any
prefix the emission equals the batch operator run on (baseline,
prefix) — equality parity, not tolerance — whenever the prefix stays
inside the baseline's value range (out-of-range values clamp into
the edge bins and are reported via ``n_clamped``; the batch twin
uses union bounds instead, so parity is exact only in-range —
documented, tested).

The live use: alert when today's stream drifts from yesterday's
distribution WITHOUT re-scanning yesterday — the baseline histogram
is the only thing kept.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DRIFT_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_a", T.LongType()),
        T.StructField("n_b", T.LongType()),
        T.StructField("l1_scaled", T.LongType()),
        T.StructField("tvd", T.DoubleType()),
        T.StructField("n_clamped", T.LongType()),
    ]
)

DRIFT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
        T.StructField("n_clamped", T.LongType()),
    ]
)


def baseline_profile(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_bins: int = 16,
) -> pd.DataFrame:
    """Per-key (mn, mx, bin counts) of the baseline snapshot — the
    bounded artifact the stream monitors against. One combinable
    bounds pass + one (key, bin) count; collected (keys×bins rows)."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    base = df.select(F.col(key_col).alias("key"), cents.alias("_cents"))
    bounds = base.groupBy("key").agg(
        F.min("_cents").alias("mn"), F.max("_cents").alias("mx")
    )
    binned = base.join(F.broadcast(bounds), "key").withColumn(
        "_bin", F.expr(f"(_cents - mn) * {int(n_bins)} div (mx - mn + 1)")
    )
    counts = (
        binned.groupBy("key", "mn", "mx", "_bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .toPandas()
    )
    out = []
    for (key, mn, mx), sub in counts.groupby(["key", "mn", "mx"]):
        cs = [0] * n_bins
        for _, r in sub.iterrows():
            cs[int(r["_bin"])] = int(r["c"])
        out.append({"key": key, "mn": int(mn), "mx": int(mx), "counts": cs})
    return pd.DataFrame(out)


def streaming_histogram_drift(
    stream: DataFrame,
    baseline: pd.DataFrame,
    key_col: str,
    value_col: str,
    n_bins: int = 16,
) -> DataFrame:
    """Per-trigger TVD of the stream prefix against ``baseline``
    (from :func:`baseline_profile`). State = one ``n_bins`` count
    array per key, forever; bin assignment happens JVM-side against
    the broadcast baseline bounds (clamped to the edge bins)."""
    prof = {r["key"]: (r["mn"], r["mx"], list(r["counts"])) for _, r in baseline.iterrows()}
    spark = stream.sparkSession
    bounds_df = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "key": list(prof),
                    "mn": [v[0] for v in prof.values()],
                    "mx": [v[1] for v in prof.values()],
                }
            )
        )
    )
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    binned = (
        stream.select(F.col(key_col).alias("key"), cents.alias("_cents"))
        .join(bounds_df, "key")  # stream-static inner join
        .select(
            "key",
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(n_bins - 1),
                    F.expr(f"(_cents - mn) * {int(n_bins)} div (mx - mn + 1)"),
                ),
            ).cast("int").alias("bin"),
            (
                (F.col("_cents") < F.col("mn")) | (F.col("_cents") > F.col("mx"))
            ).cast("long").alias("clamped"),
        )
    )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            counts, n_seen, n_clamped = state.get
            counts = list(counts)
        else:
            counts, n_seen, n_clamped = [0] * n_bins, 0, 0
        for pdf in pdfs:
            n_seen += len(pdf)
            n_clamped += int(pdf["clamped"].sum())
            for b, c in pdf["bin"].value_counts().items():
                counts[int(b)] += int(c)
        state.update((counts, int(n_seen), int(n_clamped)))
        base = prof.get(key[0])
        ca = base[2] if base else [0] * n_bins
        n_a = sum(ca)
        l1 = sum(abs(ca[i] * n_seen - counts[i] * n_a) for i in range(n_bins))
        tvd = 1.0 if (n_a == 0 or n_seen == 0) else l1 / (2.0 * n_a * n_seen)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_a": [n_a],
                "n_b": [int(n_seen)],
                "l1_scaled": [int(l1)],
                "tvd": [tvd],
                "n_clamped": [int(n_clamped)],
            }
        )

    return binned.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=DRIFT_OUT_SCHEMA,
        stateStructType=DRIFT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
