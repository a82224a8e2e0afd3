"""Tokenizer-fertility evaluation gate tests."""

from __future__ import annotations


def _fertility(spark, rows, n_merges=4):
    from pyspark.sql import functions as F

    from stock_indicators_etl_spark.llmdata.bpe import bpe_encode, bpe_train
    from stock_indicators_etl_spark.llmdata.text import norm_text, words

    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, n_merges=n_merges).collect()
    ]
    enc = bpe_encode(docs, merges).select(
        "doc_id", F.size("tokens").cast("long").alias("_t")
    )
    per = (
        docs.select(
            "doc_id",
            "lang",
            F.size(words(F.col("text"))).cast("long").alias("_w"),
            F.length(
                F.regexp_replace(norm_text(F.col("text")), " ", "")
            ).cast("long").alias("_c"),
        )
        .join(enc, "doc_id", "left")
        .na.fill({"_t": 0})
    )
    return {
        r["lang"]: r
        for r in per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_w").alias("n_words"),
            F.sum("_t").alias("n_tokens"),
            F.sum("_c").alias("n_chars"),
        )
        .filter(F.col("n_chars") > 0)
        .select(
            "*",
            F.expr("n_tokens * 1000000 div n_chars").alias("tokens_per_mchar"),
        )
        .collect()
    }


class TestTokenizerFertility:
    def test_dominant_language_gets_lower_fertility(self, spark):
        """Merges learned on a corpus dominated by lang 'aa' compress
        its repeated word into fewer tokens than the unseen-pattern
        minority language — the exact signal the gate exists to show."""
        rows = [(i, "aa", "dada dada dada dada") for i in range(8)] + [
            (100, "zz", "qxkw mvbn")
        ]
        f = _fertility(spark, rows, n_merges=6)
        assert f["aa"]["n_docs"] == 8 and f["zz"]["n_docs"] == 1
        # dada → 4 chars; fully merged it is ~1-2 tokens per word,
        # while qxkw/mvbn stay character-fragmented
        assert (
            f["aa"]["tokens_per_mchar"] < f["zz"]["tokens_per_mchar"]
        )

    def test_exact_counts_tiny_fixture(self, spark):
        """Known-answer: one lang, one doc 'ab ab' with enough merges
        to fuse each word to a single token: 2 words, 4 chars,
        2 tokens → 500000 tokens per mchar."""
        f = _fertility(spark, [(1, "aa", "ab ab")], n_merges=4)
        r = f["aa"]
        assert r["n_words"] == 2 and r["n_chars"] == 4
        assert r["n_tokens"] == 2
        assert r["tokens_per_mchar"] == 500_000

    def test_empty_text_doc_counts_zero(self, spark):
        f = _fertility(
            spark, [(1, "aa", "ab ab"), (2, "aa", "   ")], n_merges=2
        )
        assert f["aa"]["n_docs"] == 2
        assert f["aa"]["n_words"] == 2  # empty doc adds nothing


class TestUnigramFertilityLeg:
    """Unigram-LM leg of the gate (VERDICT r10 next #8): the serving
    encoder on the fixed UF_VOCAB, gated through the SAME per-lang
    frame as the BPE leg."""

    def _gate(self, spark, rows):
        import pandas as pd
        from pyspark.sql import functions as F

        from stock_indicators_etl_spark.llmdata.unigram_lm import (
            unigram_encode,
        )
        from stock_indicators_etl_spark.queries_llm import (
            UF_VOCAB,
            _fertility_frame,
        )

        docs = spark.createDataFrame(
            rows, "doc_id long, lang string, text string"
        )
        vocab = pd.DataFrame(
            {
                "piece": [p for p, _ in UF_VOCAB],
                "logp_unats": [u for _, u in UF_VOCAB],
            }
        )
        enc = unigram_encode(docs, vocab).select(
            "doc_id", F.col("n_tokens").alias("_t")
        )
        return {
            r["lang"]: r for r in _fertility_frame(docs, enc).collect()
        }

    def test_tie_break_and_fallback_counts(self, spark):
        """'table'/'window'/'order' are constructed ties (whole-piece
        vs two-piece paths with equal logp): the min-start-index rule
        must pick the whole piece (1 token each); a word with a
        character outside the vocabulary falls back to one whole-word
        token."""
        got = self._gate(
            spark,
            [
                (1, "en", "table window order"),  # 3 ties -> 3 tokens
                (2, "de", "stream filter"),  # 2 words -> 4 tokens
                (3, "fr", "xyzzy!"),  # fallback -> 1 token
            ],
        )
        assert got["en"]["n_tokens"] == 3 and got["en"]["n_words"] == 3
        assert got["de"]["n_tokens"] == 4
        assert got["fr"]["n_tokens"] == 1 and got["fr"]["n_words"] == 1

    def test_matches_duckdb_recursive_viterbi(self, spark, tmp_path):
        """Bit-exact parity of the full gate against the recursive-CTE
        oracle on a crafted corpus that exercises ties, composites,
        unsegmentable-char fallback, and an empty-text doc."""
        import duckdb

        from stock_indicators_etl_spark.queries_llm import (
            SQL_TOKENIZER_FERTILITY_UNIGRAM,
            q_tokenizer_fertility_unigram,
        )

        rows = [
            (1, "en", "table window order customer"),
            (2, "en", "the quick zebra!! jumps"),
            (3, "de", "stream stream filter column vector"),
            (4, "de", ""),
            (5, "fr", "a dup query merge batch value"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, lang string, text string"
        )
        p = str(tmp_path / "documents.parquet")
        docs.write.parquet(p)
        got = sorted(
            tuple(r) for r in q_tokenizer_fertility_unigram(
                spark, str(tmp_path)
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{p}/*.parquet')"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(SQL_TOKENIZER_FERTILITY_UNIGRAM).fetchall()
        )
        assert got == want
