"""Lexical retrieval + context packing for training-data pipelines.

- :func:`bm25_topk` — BM25-ranked top-k document retrieval for a set
  of queries, built as an inverted-index (term-postings) join — the
  lexical complement to the embedding ANN operators in
  :mod:`.similarity`. No per-row Python anywhere; one wide shuffle.
- :func:`chunk_documents` — split each document's token stream into
  fixed-size overlapping windows (training-context packing: long
  documents become model-context-sized chunks with ``stride`` overlap
  so no boundary information is lost). Pure generator expressions —
  embarrassingly parallel, zero shuffles.

Scale notes (100 TB):

- ``bm25_topk``'s only full-width shuffle is the ``groupBy(doc_id,
  term)`` term-frequency aggregate, which is map-side combinable; the
  per-doc length rides through that same shuffle as a ``max``
  aggregate instead of requiring a second exchange or window. The
  query-term table and the per-term idf table are broadcast (queries
  are small by construction; idf rows = query vocabulary only, because
  idf is joined after the postings are semi-joined down to query
  terms). Corpus-wide stats (N, avgdl) are a one-row aggregate.
- The final per-query ranking partitions by query id. With few
  queries and a huge corpus that is a skew point — the same shape as
  :func:`..similarity.cosine_topk` — so for production fan-out use
  many queries per job (the partition count scales with |Q|), or cut
  candidates first with ``min_score``.
- ``chunk_documents`` never shuffles: chunking is per-row
  ``sequence``/``explode``  — scan-local, so it inherits the input's
  partitioning and parallelism.

Cross-engine determinism (driver oracle contract): per-(query, doc)
score sums run as a left fold over term-sorted contribution lists
(``aggregate(sort_array(collect_list(...)))`` ≡ DuckDB
``list_reduce(list(... ORDER BY term))``), so IEEE summation order is
pinned. idf values are quantized to 6dp *before* scoring because JVM
``Math.log`` and libm ``ln`` can differ by 1 ulp (measured ~2% of
inputs); every other operation is exact-field IEEE arithmetic on
identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stock_indicators_etl_spark.llmdata.text import norm_text, spread, words

#: BM25 free parameters (Robertson/Sparck-Jones defaults).
BM25_K1 = 1.2
BM25_B = 0.75


def _r6(c):
    """6dp round-half-up, the repo-wide cross-engine float convention."""
    return F.floor(c * F.lit(1_000_000.0) + F.lit(0.5)) / F.lit(1_000_000.0)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    min_score: float | None = None,
) -> DataFrame:
    """Top-k BM25-scored documents per query (Lucene-style idf).

    ``min_score`` prunes candidates BEFORE the per-query ranking — at
    scale the ranking window partitions by query id, so cutting the
    candidate stream first is the lever against few-queries skew.

    ``score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) /
    (tf + k1·(1−b + b·dl/avgdl))`` with
    ``idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)`` (always ≥ 0).

    Plan: one map-side-combinable ``groupBy(doc_id, term)`` builds the
    postings (tf) with the doc length carried through as ``max(dl)``;
    postings are then broadcast-semi-joined to the query terms, scored
    with broadcast idf, folded per (query, doc) in term order, and
    ranked per query with a deterministic (score desc, doc_id asc)
    tie-break. Tokenization is :func:`..text.words` (lower + trim +
    whitespace split) — the same convention every text operator here
    uses.
    """
    # materialize the words array BEFORE the explode (DESIGN §4.11: no
    # CSE around generators/lambdas — exploding `words(text)` directly
    # re-runs the normalize+split regex per emitted token, measured
    # ~8× on this projection at sf0.1) and fan the scan out first (a
    # single-file local read arrives as one partition; at cluster
    # scale the source is already partitioned and the repartition is a
    # no-op branch, not a plan change)
    pre = spread(docs).select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("_w")
    )
    toks = pre.select(
        "doc_id",
        F.size(F.col("_w")).alias("dl"),
        F.explode(F.col("_w")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )

    stats = docs.select(F.size(words(F.col(text_col))).alias("nw")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nw").alias("total_tokens"),
    )

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(words(F.col(query_text_col)))).alias("term"),
    )

    # df(t) over the full corpus, restricted to query vocabulary before
    # the idf math so the broadcast side stays |query vocab|-sized.
    dft = (
        tf.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("dft"))
    )
    idf = dft.crossJoin(F.broadcast(stats)).select(
        "term",
        _r6(
            F.log(
                (F.col("n_docs") - F.col("dft") + F.lit(0.5))
                / (F.col("dft") + F.lit(0.5))
                + F.lit(1.0)
            )
        ).alias("idf"),
    )

    contrib = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "avgdl",
            F.col("total_tokens").cast("double") / F.col("n_docs").cast("double"),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )

    scored = contrib.groupBy("query_id", "doc_id").agg(
        _r6(
            F.expr(
                "aggregate(sort_array(collect_list(struct(term, contrib))), "
                "cast(0.0 as double), (acc, x) -> acc + x.contrib)"
            )
        ).alias("score")
    )

    if min_score is not None:
        scored = scored.filter(F.col("score") >= F.lit(min_score))

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "doc_id", "score")
    )


def unigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mean unigram surprisal per document: ``−mean_t ln p(t)`` over
    the doc's token occurrences, with ``p`` the corpus unigram
    distribution — the information-theoretic quality signal
    (templated/boilerplate text scores low, rare-token soup scores
    high; CCNet-style pipelines threshold on exactly this, with a
    real LM in place of the unigram model).

    Plan: the same single map-side-combinable ``groupBy(doc_id,
    term)`` as BM25, a vocabulary-sized term-count aggregate joined
    back per term (broadcast under AQE at realistic vocab sizes), and
    a term-sorted left fold for the per-doc sum — deterministic and
    oracle-replayable. Per-term surprisal is quantized to 6dp before
    the tf-weighted fold (JVM vs libm ``ln``, 1-ulp).
    """
    pre = spread(docs).select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("_w")
    )
    toks = pre.select(
        "doc_id",
        F.size(F.col("_w")).alias("dl"),
        F.explode(F.col("_w")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    counts = tf.groupBy("term").agg(F.sum("tf").alias("ct"))
    total = counts.agg(F.sum("ct").alias("total_tokens"))
    surp = counts.crossJoin(F.broadcast(total)).select(
        "term",
        _r6(
            -F.log(F.col("ct").cast("double") / F.col("total_tokens").cast("double"))
        ).alias("s"),
    )
    return (
        tf.join(F.broadcast(surp), "term")
        .withColumn("ws", F.col("tf") * F.col("s"))
        .groupBy("doc_id", "dl")
        .agg(
            F.expr(
                "aggregate(sort_array(collect_list(struct(term, ws))), "
                "cast(0.0 as double), (acc, x) -> acc + x.ws)"
            ).alias("_sum")
        )
        .select(
            "doc_id",
            F.col("dl").alias("n_tokens"),
            _r6(F.col("_sum") / F.col("dl").cast("double")).alias("mean_surprisal"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunks per document.

    Chunk ``i`` covers tokens ``[i·stride, i·stride + chunk_tokens)``
    for every start offset ``< n_tokens`` (so trailing tokens always
    appear in at least one chunk; with ``stride < chunk_tokens``
    consecutive chunks overlap by ``chunk_tokens − stride`` tokens).
    Emits the chunk's token count and an md5 fingerprint of its
    re-joined text rather than the text itself — rows stay narrow, and
    the fingerprint is what downstream chunk-level dedup keys on.

    Scan-local per-row expressions only (``sequence`` + ``explode`` +
    ``slice``): no shuffle, no UDF.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        # a stride wider than the window leaves inter-chunk token gaps,
        # silently violating the every-token-covered guarantee the
        # property test pins (found by hypothesis: chunk=1, stride=2)
        raise ValueError("stride must be <= chunk_tokens (full coverage)")
    ws = words(F.col(text_col))
    n = F.size(ws)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - F.lit(1), F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws"),
        n.alias("n_tokens_doc"),
        F.explode(starts).alias("start"),
    )
    chunk = F.slice(F.col("ws"), F.col("start") + F.lit(1), F.lit(chunk_tokens))
    return exploded.select(
        "doc_id",
        (F.col("start") / F.lit(stride)).cast("int").alias("chunk_id"),
        F.col("start").cast("long").alias("start"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style sequence packing: concatenate the corpus's token
    stream in ``doc_id`` order and cut it into fixed ``seq_len``
    training sequences — the complement of :func:`chunk_documents`
    (which windows WITHIN a document; packing pools short documents
    so no sequence slot is wasted on padding).

    Emits one row per (sequence, document) overlap:
    ``(seq_id, doc_id, seq_from, seq_to, doc_from, n_tokens)`` —
    sequence slot ``[seq_from, seq_to)`` is filled by the document's
    tokens starting at ``doc_from``. Downstream assembly of the
    actual token arrays is a ``groupBy(seq_id)`` away; keeping the
    mapping relational (not materializing token arrays) is what keeps
    rows narrow at corpus scale.

    Plan: the global running offset is a TWO-LEVEL prefix sum — a
    single unpartitioned window would drag the whole corpus through
    one task. Docs bucket by ``doc_id div bucket``; per-bucket
    subtotals (one combinable shuffle) cumsum on a frame with one row
    PER BUCKET (the only unpartitioned window, corpus_size/bucket
    rows), broadcast back, and the within-bucket running sum windows
    partition by bucket. Then a scan-local ``sequence``/``explode``
    fans each doc onto the sequences it intersects. Deterministic
    integer arithmetic end-to-end (exact oracle).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    bucket = 4096
    n_tok = F.size(words(F.col(text_col)))
    counted = docs.select(
        F.col(id_col).alias("doc_id"), n_tok.cast("long").alias("n")
    ).filter(F.col("n") > 0)
    counted = counted.withColumn("bkt", F.expr(f"doc_id div {bucket}"))
    # level 1: one row per bucket; the unpartitioned cumsum touches
    # only corpus/4096 rows
    bw = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    bucket_offsets = (
        counted.groupBy("bkt")
        .agg(F.sum("n").alias("bn"))
        .withColumn("boff", F.coalesce(F.sum("bn").over(bw), F.lit(0)))
        .select("bkt", "boff")
    )
    # level 2: within-bucket running sum, properly partitioned
    iw = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_off = (
        counted.join(F.broadcast(bucket_offsets), "bkt")
        .withColumn(
            "off",
            F.col("boff") + F.coalesce(F.sum("n").over(iw), F.lit(0)),
        )
        .drop("bkt", "boff")
    )
    # integer DIV, not float division: a float quotient silently loses
    # exactness once offsets pass 2^53 (a ~1 PB token stream)
    first_seq = F.expr(f"off div {seq_len}")
    last_seq = F.expr(f"(off + n - 1) div {seq_len}")
    exploded = with_off.select(
        "doc_id",
        "n",
        "off",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * seq_len
    seq_from = F.greatest(F.col("off"), seq_start) - seq_start
    seq_to = (
        F.least(F.col("off") + F.col("n"), seq_start + F.lit(seq_len)) - seq_start
    )
    return exploded.select(
        "seq_id",
        "doc_id",
        seq_from.cast("long").alias("seq_from"),
        seq_to.cast("long").alias("seq_to"),
        (F.greatest(F.col("off"), seq_start) - F.col("off"))
        .cast("long")
        .alias("doc_from"),
        (seq_to - seq_from).cast("long").alias("n_tokens"),
    )


RRF_SCALE = 10**12


def rrf_fuse(
    ranked: DataFrame,
    item_col: str = "nbr_id",
    rank_col: str = "rk",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of several ranked lists (one list per
    ranker — BM25, dense ANN, …): the standard way to combine rankers
    whose scores are incomparable. Classic RRF scores
    ``Σ 1/(k + rank)``; this variant works in FIXED POINT —
    ``RRF_SCALE DIV (k + rank)`` per row, summed as BIGINT — the same
    integer-arithmetic strategy as ``operators/graph.pagerank``, so
    the fused order is deterministic and cross-engine exact (float
    reciprocal sums would depend on addition order). Error vs the
    float score is ≤ n_lists/RRF_SCALE — never reorders at sane k.

    ``ranked`` holds ALL lists stacked: (list id, item, rank). One
    combinable groupBy(item); the final fused ordering is a global
    row_number over the fused set, which is BOUNDED (≤ k·n_lists
    rows — top-k lists are small by construction), so the
    single-partition sort is fine at any corpus scale.
    """
    contrib = F.expr(
        f"CAST({RRF_SCALE} AS BIGINT) DIV CAST(({k} + {rank_col}) AS BIGINT)"
    )
    agg = ranked.groupBy(item_col).agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.sum(contrib).alias("rrf_fp"),
    )
    w = Window.orderBy(F.col("rrf_fp").desc(), F.col(item_col).asc())
    return agg.select(
        F.col(item_col).alias("item"),
        "n_lists",
        "rrf_fp",
        F.row_number().over(w).alias("fused_rank"),
    )


BIGRAM_LAMBDA = 0.75  # exactly representable: interpolation stays IEEE-identical


def bigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = BIGRAM_LAMBDA,
) -> DataFrame:
    """Mean INTERPOLATED-BIGRAM surprisal per document — the step up
    from :func:`unigram_surprisal` toward the KenLM-style perplexity
    filter real pipelines run: ``p(w₂|w₁) = λ·c(w₁w₂)/c(w₁·) +
    (1−λ)·c(·w₂)/N`` over corpus bigram statistics, scored as
    ``−mean ln p`` across the doc's bigram occurrences. Repetitive
    boilerplate scores low, incoherent token soup scores high, and
    unseen bigrams are handled by the unigram back-off term instead
    of blowing up to ∞.

    Plan: bigrams are a scan-local ``transform+explode`` (no
    shuffle); then the same shape as unigram — one combinable
    ``groupBy(doc, w₁, w₂)``, bigram-vocabulary aggregates joined
    back (broadcast at realistic vocab sizes), and a (w₁,w₂)-sorted
    left fold per doc. Exactness: counts are integers; p is a fixed
    sequence of correctly-rounded IEEE ops (λ=0.75 is binary-exact);
    per-bigram surprisal is 6dp-quantized before the fold (JVM vs
    libm ``ln``, 1-ulp). Docs with <2 tokens drop (no bigrams).
    """
    pre = spread(docs).select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("_w")
    )
    bg = (
        pre.filter(F.size("_w") >= 2)
        .select(
            "doc_id",
            (F.size("_w") - 1).alias("nb"),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_w) - 1), "
                    "i -> struct(_w[i-1] AS w1, _w[i] AS w2))"
                )
            ).alias("_b"),
        )
        .select("doc_id", "nb", F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    )
    tf = bg.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("tf"), F.max("nb").alias("nb")
    )
    c12 = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").alias("c2"))
    total = c12.agg(F.sum("c12").alias("nn"))
    p = F.lit(lam) * (
        F.col("c12").cast("double") / F.col("c1").cast("double")
    ) + F.lit(1.0 - lam) * (
        F.col("c2").cast("double") / F.col("nn").cast("double")
    )
    surp = (
        c12.join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", _r6(-F.log(p)).alias("s"))
    )
    return (
        tf.join(F.broadcast(surp), ["w1", "w2"])
        .withColumn("ws", F.col("tf") * F.col("s"))
        .groupBy("doc_id", "nb")
        .agg(
            F.expr(
                "aggregate(sort_array(collect_list(struct(w1, w2, ws))), "
                "cast(0.0 as double), (acc, x) -> acc + x.ws)"
            ).alias("_sum")
        )
        .select(
            "doc_id",
            F.col("nb").alias("n_bigrams"),
            _r6(F.col("_sum") / F.col("nb").cast("double")).alias(
                "mean_surprisal"
            ),
        )
    )
