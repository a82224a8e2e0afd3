#!/usr/bin/env python
"""Worked example: train BOTH classical subword tokenizers on one
corpus and publish the fertility report that decides between them.

The two trainers share the big distributional idea — the corpus
collapses to the DISTINCT ``(word, count)`` table once, after which
training cost is vocabulary-proportional — but differ in mechanism:

- BPE (`llmdata.bpe`): bottom-up merge counting, one 1-row argmax
  collect per merge; encoding = greedy replace-fold (scan-local);
- unigram LM (`llmdata.unigram_lm`): top-down EM over segmentation
  lattices in Arrow batches, expected counts quantized to integer
  micro-counts so training is partitioning-invariant; encoding =
  Viterbi (scan-local).

The report a tokenization decision is reviewed against: per
language, corpus tokens-per-word (fertility) under each tokenizer —
lower fertility at equal vocab budget means better compression for
that slice, and a slice whose fertility diverges is the slice whose
script the vocabulary underserves.

Usage:
    python examples/tokenizer_training.py <sf_dir> [--vocab 48] [--merges 12]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tokenizer_report(
    spark: SparkSession,
    sf_dir: str,
    vocab_size: int = 48,
    n_merges: int = 12,
) -> DataFrame:
    """Returns the per-language fertility comparison:
    ``(lang, n_docs, n_words, bpe_tokens, bpe_fertility_ppm,
    uni_tokens, uni_fertility_ppm)``."""
    from stock_indicators_etl_spark.llmdata.bpe import bpe_encode, bpe_train
    from stock_indicators_etl_spark.llmdata.text import words
    from stock_indicators_etl_spark.llmdata.unigram_lm import (
        train_unigram_lm,
        unigram_encode,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )

    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, n_merges=n_merges).collect()
    ]
    bpe = bpe_encode(docs, merges).select(
        "doc_id", F.size("tokens").alias("bpe_tokens")
    )

    vocab = train_unigram_lm(docs, vocab_size=vocab_size, n_rounds=2)
    uni = unigram_encode(docs, vocab).select(
        "doc_id", F.col("n_tokens").alias("uni_tokens")
    )

    base = docs.select(
        "doc_id", "lang", F.size(words(F.col("text"))).alias("n_words")
    )
    j = base.join(bpe, "doc_id").join(uni, "doc_id")
    return (
        j.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("bpe_tokens").alias("bpe_tokens"),
            F.sum("uni_tokens").alias("uni_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "bpe_tokens",
            F.expr("bpe_tokens * 1000000 div n_words").alias(
                "bpe_fertility_ppm"
            ),
            "uni_tokens",
            F.expr("uni_tokens * 1000000 div n_words").alias(
                "uni_fertility_ppm"
            ),
        )
        .orderBy("lang")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--vocab", type=int, default=48)
    ap.add_argument("--merges", type=int, default=12)
    args = ap.parse_args()
    from stock_indicators_etl_spark.session import get_spark

    spark = get_spark(app_name="tokenizer_training")
    tokenizer_report(spark, args.sf_dir, args.vocab, args.merges).show(
        20, truncate=False
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
