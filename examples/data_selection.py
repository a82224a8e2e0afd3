#!/usr/bin/env python
"""Worked example: target-matched training-data selection.

Composes the round-9 selection operators into the pipeline a
pretraining-mix job actually runs, raw corpus in → selected subset +
audit report out, all lazy DataFrame transformations:

1. gate    — the published Gopher quality rules (integer
             cross-multiplication bitmap; `llmdata.text.gopher_rules`)
             drop documents no mix should contain;
2. dedup   — exact-content survivors (md5 groupBy,
             `llmdata.dedup.dedup_survivors`) so duplicated documents
             cannot vote twice in the importance model OR the output;
3. model   — the DSIR importance model is fit ONCE on the deduped
             gate survivors vs the target subset
             (`llmdata.dsir.dsir_model`, a ≤n_buckets log-ratio table
             in integer micro-nats);
4. select  — deterministic Gumbel top-k over the scored survivors
             (`dsir_score` + the low-46-bit hash noise) picks the
             training subset reproducibly — same corpus, same target,
             same k ⇒ byte-identical selection on any cluster;
5. report  — per-source funnel: gated / deduped / selected counts
             plus the selection's mean importance weight, the
             audit a mix decision is reviewed against.

Every constituent operator is independently oracle-checked; the
composition adds only joins and one aggregate. A real deployment
writes ``selected`` as the training shard list and ``report`` next to
it (the `mix_domains` quota step runs downstream of the same scores).

Usage:
    python examples/data_selection.py <sf_dir> [--k 200] [--target-lang en]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def select_training_data(
    spark: SparkSession,
    sf_dir: str,
    k: int = 200,
    target_lang: str = "en",
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(selected, report)``: the k chosen docs (with their
    weights) and the per-source funnel report."""
    from stock_indicators_etl_spark.llmdata.dedup import dedup_survivors
    from stock_indicators_etl_spark.llmdata.dsir import (
        dsir_model,
        dsir_score,
    )
    from stock_indicators_etl_spark.llmdata.hashing import h56
    from stock_indicators_etl_spark.llmdata.text import gopher_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. quality gate — scan-local rule bitmap, keep passers only
    gate = gopher_rules(docs).select("doc_id", "passes")
    gated = docs.join(gate.filter(F.col("passes")), "doc_id", "left_semi")

    # 2. exact dedup — one md5 groupBy, min-id survivor per content
    deduped = dedup_survivors(gated)

    # 3. importance model vs the target subset (bounded table)
    target = deduped.filter(F.col("lang") == target_lang)
    model = dsir_model(deduped, target)

    # 4. deterministic Gumbel top-k (same arithmetic as dsir_select,
    #    over the deduped gate survivors)
    scored = dsir_score(deduped, model)
    h_red = F.pmod(h56(F.col("doc_id").cast("string")), F.lit(1 << 46))
    u = (h_red.cast("double") + F.lit(0.5)) / F.lit(float(1 << 46))
    g = F.floor(-F.log(-F.log(u)) * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    selected = (
        scored.withColumn("key_unats", F.col("w_unats") + g)
        .orderBy(F.desc("key_unats"), F.asc("doc_id"))
        .limit(k)
        .join(docs.select("doc_id", "lang", "source"), "doc_id", "left")
    )

    # 5. per-source funnel — one aggregate over flag columns
    flags = (
        docs.select("doc_id", "source")
        .join(gate, "doc_id", "left")
        .join(
            deduped.select("doc_id", F.lit(True).alias("_kept")),
            "doc_id",
            "left",
        )
        .join(
            selected.select("doc_id", F.lit(True).alias("_sel")),
            "doc_id",
            "left",
        )
    )
    report = flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0)).alias("n_gated"),
        F.sum(F.when(F.col("_kept"), 1).otherwise(0)).alias("n_deduped"),
        F.sum(F.when(F.col("_sel"), 1).otherwise(0)).alias("n_selected"),
    )
    return selected, report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--k", type=int, default=200)
    ap.add_argument("--target-lang", default="en")
    args = ap.parse_args()
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    selected, report = select_training_data(
        spark, args.sf_dir, k=args.k, target_lang=args.target_lang
    )
    report.orderBy("source").show(25, truncate=False)
    selected.select("doc_id", "lang", "source", "w_unats").show(
        10, truncate=False
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
