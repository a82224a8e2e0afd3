"""Restart-from-checkpoint proofs for ALL foreachBatch sinks
(VERDICT r11 next #5).

``tests/test_streaming_restart.py`` proves exactly-once end-to-end for
the Naive-Bayes twin; this file parametrizes the identical
kill-after-write-before-commit scenario over the remaining
``write_batch_idempotent`` sinks (BPE encode, unigram encode,
multi-probe ANN serving, DSIR scoring) and over the incremental-dedup
twin's own publish mechanism: each sink's restarted run must equal its
batch twin row-for-row, with the uncommitted batch demonstrably
REPLAYED (written twice) so the test is not vacuous."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _shards(spark, tmp_path, df, name, key="doc_id"):
    pdf = df.toPandas()
    src = tmp_path / name
    src.mkdir()
    for i in range(3):
        shard = pdf[pdf[key] % 3 == i]
        spark.createDataFrame(shard, df.schema).coalesce(1).write.parquet(
            str(src / f"shard_{i}"), mode="overwrite"
        )

    def stream():
        return (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )

    return stream


def _run_restart_scenario(
    spark, tmp_path, monkeypatch, stream_factory, start_query, results
):
    """Shared kill-after-write-before-commit harness: returns the
    written-batch log after run 1 (crash on batch 1) + run 2
    (restart, same checkpoint)."""
    from stock_indicators_etl_spark.streaming import sink as sink_mod

    written: list[int] = []
    real_write = sink_mod.write_batch_idempotent

    def write_then_die_on_batch_1(out, path, batch_id):
        real_write(out, path, batch_id)
        written.append(int(batch_id))
        if batch_id == 1:
            raise RuntimeError(
                "injected crash: sink write landed, checkpoint commit "
                "will not"
            )

    monkeypatch.setattr(
        sink_mod, "write_batch_idempotent", write_then_die_on_batch_1
    )
    q1 = start_query(stream_factory())
    with pytest.raises(Exception, match="injected crash"):
        q1.awaitTermination(180)
    assert written == [0, 1]
    # the at-least-once window is real: batch 1's partition IS on disk
    assert spark.read.parquet(results).filter("batch_id = 1").count() > 0

    def record_only(out, path, batch_id):
        real_write(out, path, batch_id)
        written.append(int(batch_id))

    monkeypatch.setattr(sink_mod, "write_batch_idempotent", record_only)
    q2 = start_query(stream_factory())
    q2.awaitTermination(180)
    # the uncommitted batch really was replayed — not vacuous
    assert written == [0, 1, 1, 2]


class TestTokenizeRestartBpe:
    def test_restart_equals_batch_twin(self, spark, tmp_path, monkeypatch):
        from stock_indicators_etl_spark.llmdata.bpe import (
            bpe_encode,
            bpe_train,
        )
        from stock_indicators_etl_spark.streaming.tokenize_stream import (
            streaming_bpe_encode,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "text"
        )
        merges = [
            (r["left"], r["right"])
            for r in bpe_train(docs, n_merges=6).collect()
        ]
        stream_factory = _shards(spark, tmp_path, docs, "docs_bpe")
        results = str(tmp_path / "toks_bpe")

        def start(stream):
            return streaming_bpe_encode(
                merges, stream, results_path=results,
                checkpoint_path=str(tmp_path / "ckpt_bpe"),
            )

        _run_restart_scenario(
            spark, tmp_path, monkeypatch, stream_factory, start, results
        )
        got = sorted(
            (r["doc_id"], tuple(r["tokens"]))
            for r in spark.read.parquet(results).collect()
        )
        want = sorted(
            (r["doc_id"], tuple(r["tokens"]))
            for r in bpe_encode(docs, merges).collect()
        )
        assert len(got) == docs.count()
        assert got == want


class TestTokenizeRestartUnigram:
    def test_restart_equals_batch_twin(self, spark, tmp_path, monkeypatch):
        from stock_indicators_etl_spark.llmdata.unigram_lm import (
            train_unigram_lm,
            unigram_encode,
        )
        from stock_indicators_etl_spark.streaming.tokenize_stream import (
            streaming_unigram_encode,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "text"
        )
        vocab = train_unigram_lm(docs, vocab_size=48, n_rounds=2)
        stream_factory = _shards(spark, tmp_path, docs, "docs_uni")
        results = str(tmp_path / "toks_uni")

        def start(stream):
            return streaming_unigram_encode(
                vocab, stream, results_path=results,
                checkpoint_path=str(tmp_path / "ckpt_uni"),
            )

        _run_restart_scenario(
            spark, tmp_path, monkeypatch, stream_factory, start, results
        )
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


class TestAnnServeRestart:
    def test_restart_equals_batch_twin(self, spark, tmp_path, monkeypatch):
        from stock_indicators_etl_spark.llmdata.similarity import (
            multiprobe_lsh_index,
            multiprobe_lsh_topk,
        )
        from stock_indicators_etl_spark.streaming.ann_serve import (
            streaming_multiprobe_topk,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        probes = emb.filter(F.col("vec_id") < 12)
        stream_factory = _shards(
            spark, tmp_path, probes, "probes", key="vec_id"
        )
        results = str(tmp_path / "topk")
        index = multiprobe_lsh_index(emb).persist()
        try:

            def start(stream):
                return streaming_multiprobe_topk(
                    index, stream, results_path=results,
                    checkpoint_path=str(tmp_path / "ckpt_ann"), k=5,
                )

            _run_restart_scenario(
                spark, tmp_path, monkeypatch, stream_factory, start, results
            )
            got = sorted(
                (r["qid"], r["rk"], r["nbr_id"], round(r["cosine"], 9))
                for r in spark.read.parquet(results).collect()
            )
            want = sorted(
                (r["qid"], r["rk"], r["nbr_id"], round(r["cosine"], 9))
                for r in multiprobe_lsh_topk(emb, probes, k=5).collect()
            )
            assert len(got) > 0
            assert got == want
        finally:
            index.unpersist()


class TestDsirRestart:
    def test_restart_equals_batch_twin(self, spark, tmp_path, monkeypatch):
        from stock_indicators_etl_spark.llmdata.dsir import (
            dsir_model,
            dsir_weights,
        )
        from stock_indicators_etl_spark.streaming.dsir_stream import (
            streaming_dsir_score,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "text", "lang"
        )
        model = dsir_model(docs, docs.filter(F.col("lang") == "en")).persist()
        try:
            stream_factory = _shards(spark, tmp_path, docs, "docs_dsir")
            results = str(tmp_path / "scores")

            def start(stream):
                return streaming_dsir_score(
                    model, stream, results_path=results,
                    checkpoint_path=str(tmp_path / "ckpt_dsir"),
                )

            _run_restart_scenario(
                spark, tmp_path, monkeypatch, stream_factory, start, results
            )
            got = sorted(
                (r["doc_id"], r["n_grams"], r["w_unats"])
                for r in spark.read.parquet(results).collect()
            )
            want = sorted(
                (r["doc_id"], r["n_grams"], r["w_unats"])
                for r in dsir_weights(
                    docs, docs.filter(F.col("lang") == "en")
                ).collect()
            )
            assert len(got) == docs.count()
            assert got == want
        finally:
            model.unpersist()


class TestDedupStreamRestart:
    def test_restart_equals_oneshot_components(
        self, spark, tmp_path, monkeypatch
    ):
        """The dedup twin's state is the richest (index shards + the
        published mapping a replay could corrupt): kill after batch
        1's mapping publish but before its commit; the restarted run
        replays shard 1 (its bands re-appended — set semantics absorb
        the duplicates) and the final mapping equals the one-shot
        batch components on the union of all shards."""
        import json

        from stock_indicators_etl_spark.llmdata.dedup import (
            neardup_components,
        )
        from stock_indicators_etl_spark.streaming import (
            dedup_stream as ds_mod,
        )

        docs = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .filter(F.col("doc_id") < 240)
            .select("doc_id", "text")
        )
        pdf = docs.toPandas()
        src = tmp_path / "shards"
        src.mkdir()
        for i in range(3):
            shard = pdf[pdf.doc_id % 3 == i]
            with open(src / f"shard_{i}.jsonl", "w") as f:
                for _, r in shard.iterrows():
                    f.write(
                        json.dumps(
                            {"doc_id": int(r.doc_id), "text": r.text}
                        )
                        + "\n"
                    )

        def _stream():
            return (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .json(str(src))
            )

        comp_path = str(tmp_path / "components")
        published: list[int] = []
        real_publish = ds_mod._publish

        def publish_then_die_on_batch_1(comp, path, batch_id):
            real_publish(comp, path, batch_id)
            published.append(int(batch_id))
            if batch_id == 1:
                raise RuntimeError(
                    "injected crash: mapping published, checkpoint "
                    "commit will not"
                )

        def start():
            return ds_mod.streaming_incremental_dedup(
                _stream(),
                index_path=str(tmp_path / "idx"),
                components_path=comp_path,
                checkpoint_path=str(tmp_path / "ckpt"),
                threshold=0.5,
            )

        monkeypatch.setattr(ds_mod, "_publish", publish_then_die_on_batch_1)
        q1 = start()
        with pytest.raises(Exception, match="injected crash"):
            q1.awaitTermination(180)
        assert published == [0, 1]

        def record_only(comp, path, batch_id):
            real_publish(comp, path, batch_id)
            published.append(int(batch_id))

        monkeypatch.setattr(ds_mod, "_publish", record_only)
        q2 = start()
        q2.awaitTermination(180)
        # batch 1 replayed against the already-appended index shards
        assert published == [0, 1, 1, 2]

        got = sorted(
            (r["doc_id"], r["component"])
            for r in spark.read.parquet(comp_path).collect()
        )
        oneshot = neardup_components(
            docs, threshold=0.5, max_bucket_size=None
        )
        want = sorted(
            (r["doc_id"], r["component"]) for r in oneshot.collect()
        )
        assert got == want
