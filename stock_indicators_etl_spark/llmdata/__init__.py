"""LLM-training-data pipeline operators (SURVEY.md §7 Phase 6 /
BASELINE.json north star): deduplication, similarity search, lexical
retrieval, clustering / semantic dedup, context packing, sampling,
text analysis, multimodal column plumbing — all designed for 100 TB
scale (no driver-side loops, shuffle-minimal blocking joins,
broadcast where small)."""

from stock_indicators_etl_spark.llmdata.clustering import (
    assign_with_centroids,
    kmeans_assign,
    kmeans_centroid_stats,
    semantic_neardup_pairs,
    semantic_survivors,
)
from stock_indicators_etl_spark.llmdata.dedup import (
    connected_components,
    dedup_survivors,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    neardup_components,
    ngram_containment,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from stock_indicators_etl_spark.llmdata.retrieval import (
    bm25_topk,
    chunk_documents,
    unigram_surprisal,
)
from stock_indicators_etl_spark.llmdata.sampling import (
    hash_sample,
    stratified_sample,
    token_shards,
)
from stock_indicators_etl_spark.llmdata.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    ivf_topk,
    lsh_bucketed_topk,
)
from stock_indicators_etl_spark.llmdata.text import (
    doc_fingerprint,
    language_id,
    redact_pii,
    repetition_score,
    text_quality,
    token_counts,
)

__all__ = [
    "assign_with_centroids",
    "bm25_topk",
    "chunk_documents",
    "connected_components",
    "cosine_topk",
    "dedup_survivors",
    "doc_fingerprint",
    "embedding_neardup_pairs",
    "exact_dedup",
    "hash_sample",
    "ivf_topk",
    "kmeans_assign",
    "kmeans_centroid_stats",
    "language_id",
    "lsh_bucketed_topk",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "neardup_components",
    "ngram_containment",
    "ngram_jaccard_pairs",
    "redact_pii",
    "repetition_score",
    "semantic_neardup_pairs",
    "semantic_survivors",
    "simhash_fingerprints",
    "stratified_sample",
    "text_quality",
    "token_counts",
    "token_shards",
    "unigram_surprisal",
]
