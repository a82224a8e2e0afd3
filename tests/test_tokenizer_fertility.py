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
