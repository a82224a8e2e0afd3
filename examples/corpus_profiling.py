#!/usr/bin/env python
"""Sketch-driven corpus profiling (runnable example).

The sizing pass a curation team runs BEFORE committing to expensive
dedup/mixing jobs — every number below comes from bounded-state
sketches, so the whole report costs roughly one scan of the corpus
regardless of its size:

1. volume      — docs / bytes per source (plain combinable agg)
2. cardinality — distinct word-trigram estimates per source, two
                 ways: KMV (exact below k, ~1/√k error above) and
                 HyperLogLog (cheapest: pure-JVM register groupBy)
3. overlap     — pairwise Jaccard/containment between sources from
                 the SAME KMV sketches (no all-pairs shingle join):
                 which sources duplicate each other, which are safe
                 to mix at full weight
4. recommend   — a naive mixing note per source pair: flag pairs
                 whose estimated containment exceeds a threshold as
                 dedup-before-mix candidates

At 100 TB: stages 2-3 carry ≤ k rows per (source, partition) through
the only shuffle; stage 3's pair join touches G² k-length arrays
where G = #sources. Nothing materializes a distinct-shingle set.

Usage:
    python examples/corpus_profiling.py <documents.parquet> \
        [--k 64] [--ngram 3] [--containment-flag 0.5]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def profile(
    spark: SparkSession,
    src: str,
    k: int = 64,
    ngram: int = 3,
    containment_flag: float = 0.5,
) -> dict[str, DataFrame]:
    """Build the four profiling reports as lazy DataFrames."""
    from stock_indicators_etl_spark.llmdata.sketches import (
        hll_distinct,
        kmv_distinct,
        kmv_pairwise_overlap,
    )

    docs = spark.read.parquet(src).select("doc_id", "source", "text")

    volume = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    kmv = kmv_distinct(docs, k=k, group_col="source", ngram=ngram)
    hll = hll_distinct(docs, group_col="source", ngram=ngram)
    overlap = kmv_pairwise_overlap(docs, k=k, group_col="source", ngram=ngram)
    flagged = overlap.withColumn(
        "dedup_before_mix",
        (F.col("containment_a_est") >= F.lit(containment_flag))
        | (F.col("n_b") > 0)
        & (F.col("n_both").cast("double") / F.col("n_b") >= F.lit(containment_flag)),
    )
    return {
        "volume": volume,
        "kmv": kmv,
        "hll": hll,
        "overlap": flagged,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src")
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--containment-flag", type=float, default=0.5)
    args = ap.parse_args()

    from stock_indicators_etl_spark.session import get_spark

    spark = get_spark(app_name="corpus_profiling")
    reports = profile(
        spark, args.src, args.k, args.ngram, args.containment_flag
    )
    for name, df in reports.items():
        print(f"== {name} ==")
        df.show(20, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
