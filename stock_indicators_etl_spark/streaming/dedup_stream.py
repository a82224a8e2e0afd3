"""Streaming incremental dedup — the real crawl-ingest shape.

Wires :func:`..llmdata.dedup_index.dedup_increment` into Structured
Streaming via ``foreachBatch``: every micro-batch is one crawl shard,
the persisted MinHash index (bands + shingle sets) receives the
shard's append, and the full ``(doc_id, component)`` mapping is
re-published after each batch. Cost per batch is O(new shard +
collisions) — the quotient-graph merge never rescans old corpus text
(that is `dedup_increment`'s contract, property-tested shard-order-
independent in ``tests/test_dedup_index.py``).

Why ``foreachBatch`` and not a stateful operator: the increment is a
multi-stage batch job (banded LSH equi-join against the stored index,
exact-Jaccard verify, quotient-graph connected components, two index
appends) — exactly the "reuse a batch pipeline per micro-batch" case
``foreachBatch`` exists for. State that must survive restarts (the
index, the mapping) lives in storage, not executor memory, so the job
resumes from the published artifacts after a crash: on the first
batch after a (re)start the previous mapping is read back from
``components_path``.

Batch-parity contract (pinned in
``tests/test_sources_streaming.py``): after draining a file-source
stream with ``maxFilesPerTrigger=1`` (each shard file = one
micro-batch), the published mapping equals the one-shot
``neardup_components`` on the union of all shards — the same
equivalence the batch shard-by-shard property test pins.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def streaming_incremental_dedup(
    docs_stream: DataFrame,
    index_path: str,
    components_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    threshold: float = 0.5,
    n_hashes: int = 12,
    band_size: int = 3,
    k: int = 3,
    max_bucket_size: int | None = None,
    trigger: dict[str, Any] | None = None,
):
    """Start the streaming incremental-dedup job and return the
    ``StreamingQuery``. ``docs_stream`` is any streaming DataFrame
    with (``doc_id``, ``text_col``) columns (e.g.
    :func:`..sources.corpus.stream_documents_jsonl`).

    The mapping at ``components_path`` is atomically republished per
    micro-batch (parquet overwrite of an O(corpus) narrow frame); a
    restarted job reloads it, so exactly-once publication is not
    required — re-processing a shard is idempotent (its bands are
    re-appended, but candidate pairs and labels are set-semantics all
    the way down, and `dedup_increment` dedups candidate pairs).
    """
    from stock_indicators_etl_spark.llmdata.dedup_index import dedup_increment

    state: dict[str, DataFrame | None] = {"comp": None}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        prev = state["comp"]
        if prev is None and _components_exist(spark, components_path):
            # (re)start: reload the last published mapping
            prev = spark.read.parquet(components_path)
        comp = dedup_increment(
            batch_df.select("doc_id", text_col),
            index_path,
            prev,
            text_col=text_col,
            threshold=threshold,
            n_hashes=n_hashes,
            band_size=band_size,
            k=k,
            max_bucket_size=max_bucket_size,
        )
        # comp is localCheckpoint-pinned by dedup_increment, so
        # overwriting the path it may have lazily read from is safe
        _publish(comp, components_path, batch_id)
        state["comp"] = comp

    writer = (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def _publish(comp: DataFrame, components_path: str, batch_id: int) -> None:
    """Atomically republish the full mapping (parquet overwrite of an
    O(corpus) narrow frame). Module-level seam so the restart proof
    (tests/test_r12_streaming_restart.py) can inject a crash AFTER
    the publish and BEFORE the checkpoint commit — the at-least-once
    window whose replay this sink's set semantics absorb."""
    comp.write.mode("overwrite").parquet(components_path)


def _components_exist(spark, components_path: str) -> bool:
    try:
        spark.read.parquet(components_path).schema
        return True
    except Exception:
        return False
