"""Streaming DSIR scoring — the deployment shape of data selection.

The importance model (:func:`..llmdata.dsir.dsir_model` — the
≤n_buckets quantized log-ratio table) is built ONCE from the static
raw+target corpora; a live document stream is then scored against it
per micro-batch with the identical batch operator
(:func:`..llmdata.dsir.dsir_score`): grams hashed scan-locally, the
bounded model broadcast onto the gram stream, one per-doc BIGINT sum.
The 20th streaming twin, same build-once/serve-many split as
``streaming.ann_serve``.

Why ``foreachBatch``: the per-doc aggregation is a streaming
aggregate Structured Streaming would demand watermark state for —
but a document never spans micro-batches, so running the batch
operator per batch is semantically exact (union of per-batch scores
over ANY micro-batch partitioning == the batch operator on all docs
at once; pinned in ``tests/test_r9_wave.py``).

100 TB shape: per-batch cost is O(batch grams); the model is a few
KiB broadcast; state is zero. Scores are integer micro-nats, so the
downstream Gumbel top-k / threshold selection is engine-exact on
whatever system consumes the score stream.

Reference: N/A (the reference repo is a pandas indicator ETL — no
data-selection surface).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def streaming_dsir_score(
    model: DataFrame,
    doc_stream: DataFrame,
    results_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    n_buckets: int = 1024,
    trigger: dict[str, Any] | None = None,
):
    """Start the streaming scoring job and return the
    ``StreamingQuery``. ``model`` is a prebuilt
    :func:`..llmdata.dsir.dsir_model` frame (persist it or read it
    from parquet); ``doc_stream`` is any streaming DataFrame with
    (``doc_id``, ``text_col``). Results land at ``results_path`` as
    parquet ``(doc_id, n_grams, w_unats)`` partitioned by
    ``batch_id``, written with :func:`.sink.write_batch_idempotent` —
    a checkpoint-replayed micro-batch dynamically OVERWRITES its own
    ``batch_id`` partition (same deterministic rows, pure function of
    batch + static model), so the sink is exactly-once, not
    at-least-once append."""
    from stock_indicators_etl_spark.llmdata.dsir import dsir_score
    from stock_indicators_etl_spark.streaming.sink import (
        write_batch_idempotent,
    )

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = dsir_score(
            batch_df, model, text_col=text_col, n_buckets=n_buckets
        )
        write_batch_idempotent(out, results_path, batch_id)

    writer = (
        doc_stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
