"""LLM-training-data pipeline operators (SURVEY.md §7 Phase 6 /
BASELINE.json north star): deduplication, similarity search, text
analysis, multimodal column plumbing — all designed for 100 TB scale
(no driver-side loops, shuffle-minimal blocking joins, broadcast
where small)."""

from stock_indicators_etl_spark.llmdata.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from stock_indicators_etl_spark.llmdata.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
)
from stock_indicators_etl_spark.llmdata.text import (
    doc_fingerprint,
    language_id,
    text_quality,
    token_counts,
)

__all__ = [
    "cosine_topk",
    "doc_fingerprint",
    "embedding_neardup_pairs",
    "exact_dedup",
    "language_id",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "text_quality",
    "token_counts",
]
