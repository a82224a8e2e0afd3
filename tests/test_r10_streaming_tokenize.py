"""Streaming tokenizer serving twins (23rd/24th): cross-micro-batch
parity with the batch encoders."""

from __future__ import annotations

import pytest


def _sharded_stream(spark, tmp_path, docs, name):
    """3-shard parquet source with maxFilesPerTrigger=1 → ≥3
    micro-batches (the established twin-test harness shape)."""
    pdf = docs.toPandas()
    src = tmp_path / name
    src.mkdir()
    for i in range(3):
        shard = pdf[pdf.doc_id % 3 == i]
        spark.createDataFrame(shard, docs.schema).coalesce(1).write.parquet(
            str(src / f"shard_{i}"), mode="overwrite"
        )
    return (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )


class TestStreamingBpeEncode:
    def test_cross_micro_batch_batch_parity(self, spark, tmp_path):
        """Union of per-micro-batch BPE encodings over a 3-shard
        stream == the batch bpe_encode on all docs at once (23rd
        streaming twin)."""
        from stock_indicators_etl_spark.llmdata.bpe import (
            bpe_encode,
            bpe_train,
        )
        from stock_indicators_etl_spark.streaming.tokenize_stream import (
            streaming_bpe_encode,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        merges = [
            (r["left"], r["right"])
            for r in bpe_train(docs, n_merges=6).collect()
        ]
        assert len(merges) == 6
        stream = _sharded_stream(spark, tmp_path, docs, "docs_bpe")
        results = str(tmp_path / "toks_bpe")
        q = streaming_bpe_encode(
            merges,
            stream,
            results_path=results,
            checkpoint_path=str(tmp_path / "ckpt_bpe"),
        )
        q.awaitTermination(180)
        assert q.lastProgress is not None and q.lastProgress["batchId"] >= 2

        got = {
            r["doc_id"]: list(r["tokens"])
            for r in spark.read.parquet(results).collect()
        }
        want = {
            r["doc_id"]: list(r["tokens"])
            for r in bpe_encode(docs, merges).collect()
        }
        assert len(got) == docs.count()
        assert got == want


class TestStreamingUnigramEncode:
    def test_cross_micro_batch_batch_parity(self, spark, tmp_path):
        """Union of per-micro-batch Viterbi encodings over a 3-shard
        stream == the batch unigram_encode on all docs at once (24th
        streaming twin)."""
        from stock_indicators_etl_spark.llmdata.unigram_lm import (
            train_unigram_lm,
            unigram_encode,
        )
        from stock_indicators_etl_spark.streaming.tokenize_stream import (
            streaming_unigram_encode,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        vocab = train_unigram_lm(docs, vocab_size=48, n_rounds=2)
        stream = _sharded_stream(spark, tmp_path, docs, "docs_uni")
        results = str(tmp_path / "toks_uni")
        q = streaming_unigram_encode(
            vocab,
            stream,
            results_path=results,
            checkpoint_path=str(tmp_path / "ckpt_uni"),
        )
        q.awaitTermination(180)
        assert q.lastProgress is not None and q.lastProgress["batchId"] >= 2

        key = ["doc_id", "n_tokens", "tokens"]
        got = sorted(
            tuple(r[k] for k in key)
            for r in spark.read.parquet(results).collect()
        )
        want = sorted(
            tuple(r[k] for k in key)
            for r in unigram_encode(docs, vocab).collect()
        )
        assert len(got) == docs.count()
        assert got == want
