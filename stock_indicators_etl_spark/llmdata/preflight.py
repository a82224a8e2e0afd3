"""Self-join pair-budget preflight — measure the blow-up BEFORE the run.

Every candidate-generation family in this engine is a self-join over
blocking units (MinHash-LSH band buckets, n-gram posting lists,
winnowing fingerprint postings, embedding sign-LSH buckets), and each
unit of size ``n`` emits ``C(n, 2)`` pairs. That sum — one cheap
combinable aggregate per family, no pair ever materialized — is what
decides whether the expensive join is submittable at all: r11's
uncapped truth join filled 78 GB of shuffle spill on a fixture whose
pair budget would have predicted it, and r12's ``triangles`` sf10 cell
was submitted only after the same preflight shape (Σ C(out-deg, 2))
measured 1.14 B wedges ≈ a feasible ~25 GB shuffle. This module makes
that practice a first-class operator: run the report, read
``pairs_budget`` against your cluster's shuffle capacity, and if the
capped column is materially smaller, run the operator WITH its cap.

100 TB shape: four scans (shingle/signature projections are
scan-local HOFs), four combinable groupBy-count aggregates over the
blocking keys, and a 4-row result. Budgets accumulate in
DECIMAL(38,0) — a single stop-shingle posting over a 10^11-doc corpus
has C(10^11, 2) ≈ 5·10^21 predicted pairs, past BIGINT, and a silent
wraparound in the one report whose job is to warn about exactly that
unit would be the worst possible bug.

Reference: N/A (pandas indicator ETL, ``/root/reference/src/etl.py``
has no joins); the unit-size→pair-count economics follow Schleimer et
al. (SIGMOD'03) §4 and the MinHash-LSH banding analysis in Leskovec
et al., MMDS ch. 3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: family → the documented production cap knob this report evaluates
#: (the same constants the operators themselves default to or
#: document: dedup.SCALE_MAX_BUCKET_SIZE / SCALE_MAX_DOC_FREQ and the
#: winnowing stop-fingerprint cap).
_DEC = "decimal(38,0)"


def _c2(n: Column) -> Column:
    """Exact C(n, 2) in DECIMAL(38,0): n(n−1) is always even, so the
    halved product is an integer and the final cast is exact."""
    big = n.cast(_DEC)
    return ((big * (big - F.lit(1))) / F.lit(2)).cast(_DEC)


def _family_budget(units: DataFrame, family: str, cap: int) -> DataFrame:
    """Fold one family's unit-size frame (column ``n``) into its
    single report row. All-integer output: count/max as BIGINT, the
    two pair budgets as DECIMAL(38,0)."""
    pairs = _c2(F.col("n"))
    return units.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.max("n").alias("max_unit"),
        F.sum(pairs).cast(_DEC).alias("pairs_budget"),
        F.sum(F.when(F.col("n") <= cap, pairs).otherwise(F.lit(0).cast(_DEC)))
        .cast(_DEC)
        .alias("pairs_budget_capped"),
    ).select(
        F.lit(family).alias("family"),
        F.lit(cap).cast("long").alias("cap"),
        "n_units",
        "max_unit",
        "pairs_budget",
        "pairs_budget_capped",
    )


def pair_budget_report(
    docs: DataFrame,
    embeddings: DataFrame,
    text_col: str = "text",
    n_hashes: int = 12,
    band_size: int = 3,
    shingle_k: int = 3,
    winnow_k: int = 4,
    winnow_window: int = 5,
    embed_planes: int = 8,
    embed_band: int = 2,
    embed_dim: int = 64,
    lsh_cap: int | None = None,
    posting_cap: int | None = None,
    winnow_cap: int = 256,
) -> DataFrame:
    """One row per candidate-generation family: ``family, cap,
    n_units, max_unit, pairs_budget, pairs_budget_capped``.

    ``pairs_budget`` = Σ C(n_unit, 2) — the exact number of candidate
    pairs the family's self-join would emit with no cap;
    ``pairs_budget_capped`` re-sums counting only units within the
    family's documented cap knob (hot units DROP, matching the
    operators' cap semantics, so capped ≤ uncapped always). A large
    uncapped/capped ratio is the skewed-corpus signature — run the
    operator with its cap and expect the difference to be boilerplate.
    """
    from stock_indicators_etl_spark.llmdata.dedup import (
        SCALE_MAX_BUCKET_SIZE,
        SCALE_MAX_DOC_FREQ,
        band_rows,
        minhash_signatures,
        winnow_fingerprints,
        word_shingles,
    )
    from stock_indicators_etl_spark.llmdata.similarity import band_sign_buckets

    if lsh_cap is None:
        lsh_cap = SCALE_MAX_BUCKET_SIZE
    if posting_cap is None:
        posting_cap = SCALE_MAX_DOC_FREQ

    sig = minhash_signatures(docs, text_col, n_hashes, shingle_k)
    mh_units = (
        band_rows(sig, n_hashes, band_size)
        .groupBy("band_idx", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    posting_units = (
        word_shingles(docs, text_col, shingle_k, distinct=True)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    winnow_units = (
        winnow_fingerprints(docs, text_col, winnow_k, winnow_window)
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    buckets = band_sign_buckets("embedding", embed_planes, embed_band, embed_dim)
    embed_units = (
        embeddings.select(F.posexplode(F.array(*buckets)).alias("band", "bk"))
        .groupBy("band", "bk")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        _family_budget(mh_units, "minhash_lsh", lsh_cap)
        .unionByName(_family_budget(posting_units, "ngram_postings", posting_cap))
        .unionByName(_family_budget(winnow_units, "winnow_fp", winnow_cap))
        .unionByName(_family_budget(embed_units, "embed_lsh", lsh_cap))
    )
