"""Streaming tokenizer serving — BPE and unigram-LM encode on a
document stream (23rd/24th streaming twins).

The trainers (:func:`..llmdata.bpe.bpe_train`,
:func:`..llmdata.unigram_lm.train_unigram_lm`) are batch jobs that
run ONCE; the artifacts they ship (a merge list / a vocabulary with
log-probs — both vocab-bounded, driver-side) are pure per-document
functions, so serving is the ``nb_stream``/``ann_serve`` shape: drain
each micro-batch through the IDENTICAL batch encoder inside
``foreachBatch``. A document never spans micro-batches, so the union
of per-batch encodings over ANY micro-batch partitioning equals the
batch encoder on all docs at once (parity-pinned in
``tests/test_r10_streaming_tokenize.py``).

Why ``foreachBatch`` rather than plain streaming transformations:
``bpe_encode`` ends in a per-doc ``groupBy().collect_list`` (a
streaming aggregate Structured Streaming would demand watermark state
for) and ``unigram_encode`` is a ``mapInPandas`` stage — both are
batch-exact per micro-batch and stateless ACROSS batches, which
``foreachBatch`` expresses directly with zero stream state.

100 TB shape: per-batch cost is O(batch tokens); the model rides the
task closure (merge lists are 10²–10⁵ strings, vocabularies
vocab_size-bounded — broadcast-class by construction, never a join);
the sink is exactly-once via :func:`.sink.write_batch_idempotent`.

Reference: N/A (the reference repo is a pandas indicator ETL — no
tokenizer surface).
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def streaming_bpe_encode(
    merges: list[tuple[str, str]],
    doc_stream: DataFrame,
    results_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    trigger: dict[str, Any] | None = None,
):
    """Start the streaming BPE encoding job and return the
    ``StreamingQuery``. ``merges`` is a trained merge list (the
    ``(left, right)`` pairs of :func:`..llmdata.bpe.bpe_train` output
    in learning order); ``doc_stream`` is any streaming DataFrame
    with (``doc_id``, ``text_col``). Encodings land at
    ``results_path`` as parquet ``(doc_id, tokens)`` partitioned by
    ``batch_id`` (exactly-once — a replayed batch overwrites its own
    partition)."""
    from stock_indicators_etl_spark.llmdata.bpe import bpe_encode
    from stock_indicators_etl_spark.streaming.sink import (
        write_batch_idempotent,
    )

    def _encode(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = bpe_encode(batch_df, merges, text_col=text_col)
        write_batch_idempotent(out, results_path, batch_id)

    writer = (
        doc_stream.writeStream.foreachBatch(_encode)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def streaming_unigram_encode(
    vocab: pd.DataFrame,
    doc_stream: DataFrame,
    results_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    trigger: dict[str, Any] | None = None,
):
    """Start the streaming unigram-LM (Viterbi) encoding job and
    return the ``StreamingQuery``. ``vocab`` is the trained
    ``(piece, logp_unats, ec_micro)`` frame from
    :func:`..llmdata.unigram_lm.train_unigram_lm`; ``doc_stream`` is
    any streaming DataFrame with (``doc_id``, ``text_col``).
    Encodings land at ``results_path`` as parquet ``(doc_id,
    n_tokens, tokens)`` partitioned by ``batch_id`` (exactly-once)."""
    from stock_indicators_etl_spark.llmdata.unigram_lm import (
        unigram_encode,
    )
    from stock_indicators_etl_spark.streaming.sink import (
        write_batch_idempotent,
    )

    def _encode(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = unigram_encode(batch_df, vocab, text_col=text_col)
        write_batch_idempotent(out, results_path, batch_id)

    writer = (
        doc_stream.writeStream.foreachBatch(_encode)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
