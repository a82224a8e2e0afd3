#!/usr/bin/env python
"""End-to-end training-corpus curation pipeline (runnable example).

Chains the engine's LLM-data operators the way a production curation
job would, JSONL in → sharded parquet out:

1. ingest    — JSONL scan, explicit schema, one-pass QA counts
               (ingested / malformed / missing_key — nothing lost)
1b. canon    — typography/control-char canonicalization IN PLACE,
               before any hashing (dedup must see canonical bytes)
2. quality   — word-count / repetition / compressibility gates
3. dedup     — exact (content md5) survivors, then MinHash-LSH →
               Jaccard-verified near-dup components, keep min-id
4. split     — leakage-safe train/val/test: the split hashes the
               near-dup COMPONENT, so duplicate groups never
               straddle splits
5. shard     — per-language token-budget shards → partitioned parquet
               (split column carried through)

Every stage is a lazy DataFrame transformation: the whole pipeline is
ONE Spark job graph with two wide shuffle families (dedup's hash
groupBys and the shard window), and scales by partitioning — there is
no driver-side data movement anywhere.

Usage:
    python examples/corpus_pipeline.py <in.jsonl> <out_dir> \
        [--budget 4096] [--min-words 30] [--threshold 0.5]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate(
    spark: SparkSession,
    src: str,
    out_dir: str,
    token_budget: int = 4096,
    min_words: int = 30,
    max_repetition: float = 0.2,
    min_compression: float = 0.05,
    neardup_threshold: float = 0.5,
) -> dict[str, int]:
    """Run the curation pipeline; returns per-stage row counts."""
    from stock_indicators_etl_spark.llmdata.dedup import (
        dedup_survivors,
        neardup_components,
    )
    from stock_indicators_etl_spark.llmdata.sampling import (
        leakage_safe_split,
        token_shards,
    )
    from stock_indicators_etl_spark.llmdata.text import (
        canonical_text,
        compression_ratio,
        repetition_score,
        token_counts,
        words,
    )
    from stock_indicators_etl_spark.sources.corpus import (
        ingest_qa_counts,
        read_documents_jsonl,
        write_corpus_shards,
    )

    counts: dict[str, int] = {}

    # 1. ingest (+ QA: one aggregate pass partitions every input line
    # into ingested / malformed / missing_key — nothing silently lost)
    qa = ingest_qa_counts(spark, src)
    counts["malformed_lines"] = qa["malformed"]
    counts["missing_key_lines"] = qa["missing_key"]
    docs = read_documents_jsonl(spark, src)
    counts["ingested"] = qa["ingested"]

    # 1b. canonicalize IN PLACE before any hashing: exact dedup keys
    # on content md5, so "curly-quote variants" must already agree
    docs = docs.withColumn("text", canonical_text(F.col("text")))

    # 2. quality gates: length + repetition + compressibility (a
    # zlib ratio below min_compression means near-pure boilerplate)
    docs = docs.filter(F.size(words(F.col("text"))) >= min_words)
    rep = repetition_score(docs).select("doc_id", "repetition_ratio")
    comp = compression_ratio(docs).select("doc_id", "ratio")
    docs = (
        docs.join(rep, "doc_id")
        .join(comp, "doc_id")
        .filter(
            (F.col("repetition_ratio") <= max_repetition)
            & (F.col("ratio") >= min_compression)
        )
        .drop("repetition_ratio", "ratio")
    )
    counts["after_quality"] = docs.count()

    # 3a. exact dedup survivors
    docs = dedup_survivors(docs)
    counts["after_exact_dedup"] = docs.count()

    # 3b. near-dup components → keep the min-id member per group
    comps = neardup_components(docs, threshold=neardup_threshold)
    canon = comps.filter(F.col("doc_id") == F.col("component")).select("doc_id")
    docs = docs.join(canon, "doc_id", "left_semi")
    counts["after_near_dedup"] = docs.count()

    # 4. leakage-safe split: hash the dedup component (survivors are
    # their group's min id = their component label), so if a later
    # crawl re-introduces a near-dup it lands in the SAME split
    docs = leakage_safe_split(docs, comps)

    # 5. token counts → per-language token-budget shards → sink
    toks = token_counts(docs).select("doc_id", "n_subtokens")
    sharded = token_shards(docs, toks, budget=token_budget)
    out: DataFrame = docs.join(
        sharded.select("doc_id", "shard_id"), "doc_id"
    ).withColumnRenamed("shard_id", "shard")
    write_corpus_shards(out, out_dir)
    counts["shipped"] = out.count()
    return counts


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src")
    ap.add_argument("out_dir")
    ap.add_argument("--budget", type=int, default=4096)
    ap.add_argument("--min-words", type=int, default=30)
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    from stock_indicators_etl_spark.session import get_spark

    spark = get_spark(app_name="corpus-pipeline")
    counts = curate(
        spark,
        args.src,
        args.out_dir,
        token_budget=args.budget,
        min_words=args.min_words,
        neardup_threshold=args.threshold,
    )
    for stage, n in counts.items():
        print(f"{stage:>18s}: {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
