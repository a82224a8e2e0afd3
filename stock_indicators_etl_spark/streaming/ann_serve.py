"""Streaming ANN serving — the deployment shape of the ANN family.

A vector index is built ONCE from the static corpus
(:func:`..llmdata.similarity.multiprobe_lsh_index` — corpus hashed
into hyperplane buckets, norms precomputed) and a live probe stream
is answered against it: per micro-batch, the probes are hashed
scan-locally, bucket-joined against the index (broadcast of the
micro-batch's probe fan-out — the SMALL side by construction), scored
and top-k ranked per query (VERDICT r8 next #7; ``perceptron_score``
proved the static-weights half of this pattern, this is the
index-join half).

Why ``foreachBatch`` and not a bare stream-static join: the operator
ends in a per-query top-k (``row_number`` over qid), which Structured
Streaming rejects as a stateful window in append mode — but the
ranking only ever looks WITHIN one query's candidates, and a query
never spans micro-batches, so running the identical BATCH operator
per micro-batch is semantically exact, not an approximation. That
makes the batch-parity contract trivial to state and strong to test:
the union of per-batch results over any micro-batch partitioning of
the probe stream equals the batch operator on all probes at once
(pinned cross-micro-batch with ``maxFilesPerTrigger=1`` in
``tests/test_sources_streaming.py``).

100 TB shape: the index is the BIG side and is never rebuilt, never
collected, never broadcast — it is scanned once per micro-batch with
the probe fan-out broadcast onto it. Probe cost per batch is
O(index ∩ probed buckets); state is zero (no watermark needed — there
is no stateful operator).

Reference: N/A (the reference repo is a pandas indicator ETL — no
vector search); the serving pattern is the standard
query-stream-vs-static-index ANN deployment.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def streaming_multiprobe_topk(
    index: DataFrame,
    probe_stream: DataFrame,
    results_path: str,
    checkpoint_path: str,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    n_flip: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    trigger: dict[str, Any] | None = None,
):
    """Start the streaming ANN serving job and return the
    ``StreamingQuery``. ``index`` is a prebuilt
    :func:`..llmdata.similarity.multiprobe_lsh_index` frame (persist
    it or read it from parquet — it is scanned per micro-batch);
    ``probe_stream`` is any streaming DataFrame with (``id_col``,
    ``vec_col``). Results land at ``results_path`` as parquet
    ``(qid, rk, nbr_id, cosine)`` partitioned by ``batch_id``,
    written with :func:`.sink.write_batch_idempotent` — a
    checkpoint-replayed micro-batch dynamically OVERWRITES its own
    ``batch_id`` partition (same deterministic rows, pure function of
    probe batch + static index), so the sink is exactly-once, not
    at-least-once append.
    """
    from stock_indicators_etl_spark.llmdata.similarity import (
        multiprobe_lsh_probe,
    )
    from stock_indicators_etl_spark.streaming.sink import (
        write_batch_idempotent,
    )

    def _serve(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = multiprobe_lsh_probe(
            index,
            batch_df,
            k=k,
            n_planes=n_planes,
            dim=dim,
            n_flip=n_flip,
            vec_col=vec_col,
            id_col=id_col,
        )
        write_batch_idempotent(out, results_path, batch_id)

    writer = (
        probe_stream.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
