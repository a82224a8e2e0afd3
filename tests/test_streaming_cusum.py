"""Streaming CUSUM twin: cross-micro-batch exact parity with the
batch closed-form operator (the same contract as the other streaming
twins — streaming emissions over any prefix equal the batch operator
on that prefix)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def test_streaming_cusum_matches_batch_across_batches(spark, tmp_path):
    from stock_indicators_etl_spark.operators.stats import cusum
    from stock_indicators_etl_spark.streaming.cusum import streaming_cusum

    rng = np.random.default_rng(23)
    rows = []
    for key in (1, 2, 3):
        for t in range(40):
            rows.append((key, t, int(rng.integers(-30, 40))))
    events = pd.DataFrame(rows, columns=["key", "ts", "x"])

    src = tmp_path / "cusum_src"
    src.mkdir()
    # split so every key's series spans both micro-batches
    f0, f1 = str(src / "p0.parquet"), str(src / "p1.parquet")
    events[events.ts < 25].to_parquet(f0)
    events[events.ts >= 25].to_parquet(f1)
    os.utime(f0, (1_000_000_000, 1_000_000_000))
    os.utime(f1, (1_000_000_100, 1_000_000_100))

    stream = (
        spark.readStream.schema("key bigint, ts bigint, x bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    k, h = 4, 60
    out = streaming_cusum(stream, k=k, h=h)
    q = (
        out.writeStream.format("memory")
        .queryName("scusum")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_scusum"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from scusum")
        .toPandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    batch = (
        cusum(
            spark.createDataFrame(events),
            key_cols=("key",),
            ts_col="ts",
            x_col="x",
            k=k,
            h=h,
        )
        .toPandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(batch) == 120
    assert list(got.cusum) == list(batch.cusum)
    assert list(got.alarm) == list(batch.alarm)
    assert got.alarm.any() and not got.alarm.all()  # fixture exercises both


def test_streaming_cusum_state_is_single_scalar(spark, tmp_path):
    """Restarting from state: a second availableNow run over a NEW
    file continues from the persisted s, not from zero."""
    from stock_indicators_etl_spark.streaming.cusum import streaming_cusum

    src = tmp_path / "cusum_inc"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_inc")
    dst = str(tmp_path / "cusum_out")
    pd.DataFrame({"key": [7, 7], "ts": [1, 2], "x": [50, 50]}).to_parquet(
        str(src / "a.parquet")
    )

    def run():
        # memory sinks can't recover from a checkpoint — a parquet
        # sink exercises the real restart path
        stream = spark.readStream.schema("key bigint, ts bigint, x bigint").parquet(
            str(src)
        )
        out = streaming_cusum(stream, k=10, h=100)
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", dst)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    # s after batch 1: (50-10) + (50-10) = 80
    pd.DataFrame({"key": [7], "ts": [3], "x": [40]}).to_parquet(
        str(src / "b.parquet")
    )
    run()
    got = spark.read.parquet(dst).toPandas().sort_values("ts")
    assert list(got.cusum) == [40, 80, 110]  # 80 + (40-10) after restart
    assert list(got.alarm) == [False, False, True]
