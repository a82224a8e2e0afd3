"""Streaming CDC apply — the live-dimension maintenance shape.

Wires :func:`..operators.scd.apply_cdc` into Structured Streaming via
``foreachBatch``: the change stream (I/U/D rows with a monotonically
increasing per-key sequence, e.g. a database CDC feed) lands in
micro-batches, and after every batch the merged snapshot is
republished. The same reuse-a-batch-pipeline-per-micro-batch pattern
as :mod:`.dedup_stream` — MERGE is a multi-stage batch job (window +
anti join + union), not a per-row stateful operator.

State that must survive restarts (the snapshot) lives in storage: on
the first batch after a (re)start the last published snapshot is read
back from ``table_path``. The in-memory handle is localCheckpoint-
pinned before each publish so overwriting the path it was lazily read
from is safe.

Batch-parity contract (pinned in ``tests/test_sources_streaming.py``):
with globally ordered sequence numbers, draining the stream shard by
shard (``maxFilesPerTrigger=1``) publishes exactly the snapshot of a
ONE-SHOT ``apply_cdc`` over the union of all shards — last-wins is
associative when the order key is global, so incremental application
commutes with batching.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def streaming_cdc_apply(
    changes_stream: DataFrame,
    base: DataFrame | None,
    table_path: str,
    checkpoint_path: str,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
    trigger: dict[str, Any] | None = None,
):
    """Start the streaming MERGE job and return the StreamingQuery.

    ``changes_stream``: streaming DataFrame with ``key_col``,
    ``seq_col``, ``op_col`` + the table's data columns. ``base`` is
    the initial snapshot for a fresh table (ignored when
    ``table_path`` already holds a published snapshot — restart
    case).
    """
    from stock_indicators_etl_spark.operators.scd import apply_cdc

    state: dict[str, DataFrame | None] = {"snap": None}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        snap = state["snap"]
        if snap is None:
            if _table_exists(spark, table_path):
                snap = spark.read.parquet(table_path)
            elif base is not None:
                snap = base
            else:
                # empty initial table with the changelog's data shape
                snap = batch_df.drop(seq_col, op_col).limit(0)
        merged = apply_cdc(
            snap, batch_df, key_col, seq_col, op_col=op_col
        ).localCheckpoint()
        merged.write.mode("overwrite").parquet(table_path)
        state["snap"] = merged

    writer = (
        changes_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def _table_exists(spark, table_path: str) -> bool:
    try:
        spark.read.parquet(table_path).schema
        return True
    except Exception:
        return False
