"""Unigram-LM (SentencePiece-style) tokenizer trainer tests."""

from __future__ import annotations

import math

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (i, "internationalization international nation nationalization inter " * 3)
    for i in range(6)
] + [(100 + i, "data pipeline data data pipe line liner " * 2) for i in range(6)]


class TestUnigramTrain:
    def test_learns_multichar_pieces(self, spark):
        from stock_indicators_etl_spark.llmdata.unigram_lm import train_unigram_lm

        vocab = train_unigram_lm(_docs(spark, CORPUS), vocab_size=40, n_rounds=3)
        pieces = set(vocab["piece"])
        # repeated morphemes must earn multi-char pieces
        assert {"data", "pipe", "line"} <= pieces
        assert any(len(p) >= 4 for p in pieces)

    def test_single_char_coverage(self, spark):
        from stock_indicators_etl_spark.llmdata.unigram_lm import train_unigram_lm

        vocab = train_unigram_lm(_docs(spark, CORPUS), vocab_size=40, n_rounds=2)
        chars = {c for _, t in CORPUS for w in t.split() for c in w}
        assert chars <= set(vocab["piece"])  # every char survives pruning

    def test_deterministic_across_runs(self, spark):
        from stock_indicators_etl_spark.llmdata.unigram_lm import train_unigram_lm

        docs = _docs(spark, CORPUS)
        a = train_unigram_lm(docs, vocab_size=32, n_rounds=2)
        b = train_unigram_lm(
            docs.repartition(7), vocab_size=32, n_rounds=2
        )  # different partitioning must not change the result
        assert a.equals(b)

    def test_probabilities_normalized(self, spark):
        from stock_indicators_etl_spark.llmdata.unigram_lm import train_unigram_lm

        vocab = train_unigram_lm(_docs(spark, CORPUS), vocab_size=40, n_rounds=2)
        # log-probs are micro-nat quantized logs of a distribution
        # over EM mass: sum of exp over the trained support stays <= ~1
        total = sum(math.exp(lp / 1e6) for lp in vocab["logp_unats"])
        assert total <= 1.05


class TestUnigramEncode:
    def test_tokens_reassemble_words(self, spark):
        from stock_indicators_etl_spark.llmdata.unigram_lm import (
            train_unigram_lm,
            unigram_encode,
        )

        docs = _docs(spark, CORPUS)
        vocab = train_unigram_lm(docs, vocab_size=40, n_rounds=2)
        out = {r["doc_id"]: r for r in unigram_encode(docs, vocab).collect()}
        for doc_id, text in CORPUS:
            assert "".join(out[doc_id]["tokens"].split()) == "".join(
                text.lower().split()
            )

    def test_compression_beats_chars(self, spark):
        from stock_indicators_etl_spark.llmdata.unigram_lm import (
            train_unigram_lm,
            unigram_encode,
        )

        docs = _docs(spark, CORPUS)
        vocab = train_unigram_lm(docs, vocab_size=40, n_rounds=3)
        out = unigram_encode(docs, vocab).collect()
        n_chars = sum(len("".join(t.split())) for _, t in CORPUS)
        n_tokens = sum(r["n_tokens"] for r in out)
        assert n_tokens < 0.5 * n_chars  # multi-char pieces do real work

    def test_viterbi_python_replica(self, spark):
        from stock_indicators_etl_spark.llmdata.unigram_lm import (
            _viterbi,
            train_unigram_lm,
            unigram_encode,
        )

        docs = _docs(spark, CORPUS)
        vocab = train_unigram_lm(docs, vocab_size=40, n_rounds=2)
        logp = {
            str(r["piece"]): int(r["logp_unats"]) / 1e6
            for _, r in vocab.iterrows()
        }
        max_len = max(len(p) for p in logp)
        out = {r["doc_id"]: r["tokens"] for r in unigram_encode(docs, vocab).collect()}
        for doc_id, text in CORPUS[:3]:
            want = []
            for w in text.lower().split():
                want += _viterbi(w, logp, max_len)
            assert out[doc_id] == " ".join(want)

    def test_oov_word_emitted_whole(self, spark):
        from stock_indicators_etl_spark.llmdata.unigram_lm import (
            train_unigram_lm,
            unigram_encode,
        )

        docs = _docs(spark, CORPUS)
        vocab = train_unigram_lm(docs, vocab_size=40, n_rounds=2)
        probe = _docs(spark, [(999, "データ data")])  # chars outside vocab
        r = unigram_encode(probe, vocab).collect()[0]
        assert "データ" in r["tokens"].split()  # unsegmentable → whole word


class TestForwardBackward:
    def test_expected_counts_sum_to_path_length(self):
        # uniform 2-piece model over "abab": E[#pieces] equals the
        # posterior-weighted mean segmentation length
        from stock_indicators_etl_spark.llmdata.unigram_lm import (
            _forward_backward,
        )

        logp = {"a": math.log(0.25), "b": math.log(0.25), "ab": math.log(0.5)}
        ec = _forward_backward("abab", logp, 2)
        # paths: ab|ab (p=.25), a|b|ab, ab|a|b, a|b|a|b — check mass
        assert ec["ab"] > ec["a"] and ec["ab"] > ec["b"]
        assert abs(sum(ec.values()) - (
            # expected number of pieces
            sum(
                w * n
                for w, n in [
                    (0.5 * 0.5, 2),
                    (0.25 * 0.25 * 0.5, 3),
                    (0.5 * 0.25 * 0.25, 3),
                    (0.25 ** 4, 4),
                ]
            )
            / (0.25 + 2 * 0.25 * 0.25 * 0.5 + 0.25 ** 4)
        )) < 1e-9

    def test_unreachable_word_empty(self):
        from stock_indicators_etl_spark.llmdata.unigram_lm import (
            _forward_backward,
        )

        assert _forward_backward("xyz", {"a": 0.0}, 1) == {}


class TestUnigramOnStream:
    def test_encode_runs_unchanged_on_readstream(self, spark, tmp_path):
        """unigram_encode is scan-shaped (mapInPandas with a bounded
        static vocab in the closure, no shuffle), so the SAME
        operator runs on a readStream frame — the
        perceptron_score/blocklist deployment shape for tokenizer
        serving."""
        from stock_indicators_etl_spark.llmdata.unigram_lm import (
            train_unigram_lm,
            unigram_encode,
        )

        docs = _docs(spark, CORPUS)
        vocab = train_unigram_lm(docs, vocab_size=40, n_rounds=2)
        src = str(tmp_path / "udocs")
        docs.write.parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        out = unigram_encode(stream, vocab)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("uni_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["doc_id"]: r["tokens"]
            for r in spark.sql("select * from uni_stream").collect()
        }
        want = {
            r["doc_id"]: r["tokens"]
            for r in unigram_encode(docs, vocab).collect()
        }
        assert got == want


def test_tokenizer_training_example(spark):
    """examples/tokenizer_training.py end-to-end on sf0.001: both
    trainers run on the same corpus, every language gets a fertility
    row, and both tokenizers compress (fertility ≥ 1 token/word by
    construction, and finite)."""
    import sys

    sys.path.insert(0, "examples")
    from tokenizer_training import tokenizer_report

    rep = tokenizer_report(
        spark, "/root/testdata/sf0.001", vocab_size=48, n_merges=8
    ).collect()
    langs = {r["lang"] for r in rep}
    assert langs == {"en", "de", "es", "fr", "zh"}
    for r in rep:
        assert r["n_words"] > 0
        assert r["bpe_fertility_ppm"] >= 1_000_000  # >= 1 token per word
        assert r["uni_fertility_ppm"] >= 1_000_000
        assert r["uni_tokens"] > 0 and r["bpe_tokens"] > 0
