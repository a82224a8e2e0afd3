"""Streaming Naive Bayes inference — classifier serving on a stream.

The model (:func:`..llmdata.classifier.nb_train` — k class priors +
the vocab-sized per-word micro-nat weight table) is trained ONCE from
the static labeled corpus; a live document stream is then classified
per micro-batch with the identical batch scorer
(:func:`..llmdata.classifier.nb_score`): one tf aggregate WITHIN the
batch, a word equi-join onto the static weight table, a BIGINT
(doc, class) sum, a k-bounded argmax. The 21st streaming twin, same
build-once/serve-many split as ``streaming.ann_serve`` /
``streaming.dsir_stream``.

Why ``foreachBatch``: the per-doc tf + argmax are streaming
aggregates Structured Streaming would demand watermark state for —
but a document never spans micro-batches, so running the batch
scorer per batch is semantically exact (union of per-batch
predictions over ANY micro-batch partitioning == the batch scorer on
all docs at once; pinned in ``tests/test_r9b_wave.py``).

100 TB shape: per-batch cost is O(batch tokens); the weight table is
vocab-bounded and static (persist it — it is never rebuilt); stream
state is zero. Scores are integer micro-nats, so downstream
thresholding is engine-exact.

Reference: N/A (the reference repo is a pandas indicator ETL — no
classifier surface).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def streaming_nb_classify(
    classes: list,
    priors: DataFrame,
    weights: DataFrame,
    doc_stream: DataFrame,
    results_path: str,
    checkpoint_path: str,
    label_col: str = "lang",
    text_col: str = "text",
    trigger: dict[str, Any] | None = None,
):
    """Start the streaming classification job and return the
    ``StreamingQuery``. ``(classes, priors, weights)`` is a prebuilt
    :func:`..llmdata.classifier.nb_train` model (persist the frames —
    they are re-read per micro-batch, never re-trained);
    ``doc_stream`` is any streaming DataFrame with (``doc_id``,
    ``label_col``, ``text_col``). Predictions land at ``results_path``
    as parquet ``(doc_id, actual, predicted, score, correct)``
    partitioned by ``batch_id``, written with
    :func:`.sink.write_batch_idempotent` — a checkpoint-replayed
    micro-batch dynamically OVERWRITES its own ``batch_id`` partition
    (same deterministic rows, pure function of batch + static model),
    so the sink is exactly-once, not at-least-once append."""
    from stock_indicators_etl_spark.llmdata.classifier import nb_score
    from stock_indicators_etl_spark.streaming.sink import (
        write_batch_idempotent,
    )

    def _classify(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = nb_score(
            batch_df,
            classes,
            priors,
            weights,
            label_col=label_col,
            text_col=text_col,
        )
        write_batch_idempotent(out, results_path, batch_id)

    writer = (
        doc_stream.writeStream.foreachBatch(_classify)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
