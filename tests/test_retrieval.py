"""Unit tests for lexical retrieval + context packing
(`llmdata/retrieval.py`): BM25 known-answer vs a plain-Python
replica, chunk coverage/overlap invariants."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from stock_indicators_etl_spark.llmdata.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_topk,
    chunk_documents,
)

DOCS = [
    (0, "spark shuffles data across the cluster"),
    (1, "spark broadcasts small tables to every executor"),
    (2, "the cluster schedules tasks on executors"),
    (3, "data skew makes one task slow"),
    (4, "completely unrelated words about cooking pasta"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def _py_bm25(query_terms: set[str], k1=BM25_K1, b=BM25_B) -> dict[int, float]:
    """Reference BM25 over DOCS with the module's exact conventions."""
    toks = {d: t.lower().split() for d, t in DOCS}
    n_docs = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    dft: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            dft[term] = dft.get(term, 0) + 1
    scores: dict[int, float] = {}
    for d, t in toks.items():
        s = 0.0
        # term-sorted order, matching the operator's sorted left fold
        for term in sorted(set(t) & query_terms):
            tf = t.count(term)
            idf = math.log((n_docs - dft[term] + 0.5) / (dft[term] + 0.5) + 1.0)
            idf = math.floor(idf * 1e6 + 0.5) / 1e6
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(t) / avgdl)
            )
        if s > 0:
            scores[d] = math.floor(s * 1e6 + 0.5) / 1e6
    return scores


def test_bm25_matches_python_replica(spark, docs):
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": [100], "text": ["spark cluster data"]})
    )
    out = bm25_topk(docs, queries, k=10).toPandas()
    expect = _py_bm25({"spark", "cluster", "data"})
    got = {r.doc_id: r.score for r in out.itertuples()}
    assert got == pytest.approx(expect, abs=2e-6)
    # ranking: score desc, doc_id asc
    ranked = out.sort_values("rk")
    assert list(ranked.score) == sorted(ranked.score, reverse=True)


def test_bm25_self_retrieval_ranks_self_first(spark, docs):
    queries = docs.filter("doc_id = 1").selectExpr("doc_id as query_id", "text")
    out = bm25_topk(docs, queries, k=3).toPandas()
    assert out[out.rk == 1].iloc[0].doc_id == 1


def test_bm25_empty_query_and_no_match(spark, docs):
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": [7, 8], "text": ["", "zzz qqq"]})
    )
    out = bm25_topk(docs, queries, k=5).toPandas()
    assert len(out) == 0  # no overlapping terms → no rows


def test_chunks_cover_all_tokens_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    out = (
        chunk_documents(df, chunk_tokens=10, stride=6)
        .toPandas()
        .sort_values("chunk_id")
    )
    # starts at 0, 6, 12, 18, 24 (< 25 tokens)
    assert list(out.start) == [0, 6, 12, 18, 24]
    assert list(out.n_tokens) == [10, 10, 10, 7, 1]
    # consecutive chunks overlap by chunk_tokens - stride = 4
    assert out.iloc[0].n_tokens + out.iloc[1].start - out.iloc[1].n_tokens <= 10


def test_chunk_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["just three tokens", ""]})
    )
    out = chunk_documents(df, chunk_tokens=64, stride=48).toPandas()
    assert len(out) == 1  # empty doc emits nothing
    r = out.iloc[0]
    assert (r.doc_id, r.chunk_id, r.start, r.n_tokens) == (0, 0, 0, 3)


def test_chunk_hash_keys_dedup(spark):
    # identical chunk content → identical fingerprint across docs
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "a b c"]})
    )
    out = chunk_documents(df, chunk_tokens=8, stride=8).toPandas()
    assert out.chunk_hash.nunique() == 1


def test_chunk_rejects_bad_params(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, stride=-1)


def test_chunk_rejects_gapping_stride(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, stride=8)


def test_bm25_min_score_prunes_before_ranking(spark, docs):
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": [100], "text": ["spark cluster data"]})
    )
    full = bm25_topk(docs, queries, k=10).toPandas()
    cut = full.score.median()
    pruned = bm25_topk(docs, queries, k=10, min_score=cut).toPandas()
    assert set(pruned.doc_id) == set(full[full.score >= cut].doc_id)
    # ranks are recomputed on the pruned stream: contiguous from 1
    assert sorted(pruned.rk) == list(range(1, len(pruned) + 1))


def test_unigram_surprisal_known_answer(spark):
    from stock_indicators_etl_spark.llmdata.retrieval import unigram_surprisal

    # corpus: "a a a b" → p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a a a", "b"]})
    )
    out = unigram_surprisal(df).toPandas().set_index("doc_id")

    def q6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    s_a, s_b = q6(-math.log(3 / 4)), q6(-math.log(1 / 4))
    assert out.loc[0].n_tokens == 3
    assert out.loc[0].mean_surprisal == pytest.approx(q6(3 * s_a / 3), abs=1e-9)
    assert out.loc[1].mean_surprisal == pytest.approx(q6(s_b), abs=1e-9)
    # the common-token doc is less surprising than the rare-token doc
    assert out.loc[0].mean_surprisal < out.loc[1].mean_surprisal


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_pack_sequences_partitions_token_stream(spark):
    from stock_indicators_etl_spark.llmdata.retrieval import pack_sequences

    texts = {
        1: "a b c d e",          # 5 tokens
        2: "",                   # empty: contributes nothing
        3: "f g h",              # 3
        7: "i j k l m n o p q",  # 9
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    out = pack_sequences(df, seq_len=4).toPandas().sort_values(
        ["seq_id", "doc_id"]
    )
    # 17 tokens / len 4 -> 5 sequences (last partial)
    assert out.seq_id.nunique() == 5
    assert 2 not in set(out.doc_id)
    # every sequence slot is filled exactly: full sequences sum to 4
    per_seq = out.groupby("seq_id").n_tokens.sum()
    assert per_seq.iloc[:-1].eq(4).all() and per_seq.iloc[-1] == 17 - 4 * 4
    # per-doc coverage: token spans reassemble the doc exactly
    for did, text in texts.items():
        n = len(text.split())
        spans = out[out.doc_id == did].sort_values("doc_from")
        if n == 0:
            assert spans.empty
            continue
        assert spans.n_tokens.sum() == n
        assert spans.doc_from.iloc[0] == 0
        # contiguous, non-overlapping
        ends = spans.doc_from + spans.n_tokens
        assert (spans.doc_from.iloc[1:].values == ends.iloc[:-1].values).all()
    # slot arithmetic: seq_to - seq_from == n_tokens, bounded by seq_len
    assert (out.seq_to - out.seq_from).equals(out.n_tokens)
    assert out.seq_to.le(4).all() and out.seq_from.ge(0).all()


def test_pack_sequences_doc_spanning_multiple_sequences(spark):
    from stock_indicators_etl_spark.llmdata.retrieval import pack_sequences

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [5], "text": [" ".join("t%d" % i for i in range(11))]})
    )
    out = pack_sequences(df, seq_len=4).toPandas().sort_values("seq_id")
    assert list(out.n_tokens) == [4, 4, 3]
    assert list(out.doc_from) == [0, 4, 8]
    assert list(out.seq_from) == [0, 0, 0]


def test_pack_sequences_rejects_bad_len(spark):
    from stock_indicators_etl_spark.llmdata.retrieval import pack_sequences

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)


# ------------------------------------------------------------------
# BPE tokenizer training / encoding (llmdata/bpe.py)
# ------------------------------------------------------------------


def _py_bpe_train(texts, n_merges):
    """Reference implementation (Sennrich et al. 2016 pseudocode)."""
    import collections

    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(w) + ("</w>",)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = max(pairs, key=lambda p: (pairs[p], [-ord(c) for c in p[0]], ))
        # deterministic: max count, then lexicographically smallest
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append((best[0], best[1], top))
        new_vocab = collections.Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference(spark):
    import pandas as pd

    from stock_indicators_etl_spark.llmdata.bpe import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide wide wide",
        "low newer wide lowest",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = bpe_train(docs, n_merges=10).toPandas()
    want = _py_bpe_train(texts, 10)
    assert list(zip(got["left"], got["right"], got["pair_count"])) == want


def test_bpe_greedy_overlap_rule(spark):
    """' a a a ' under merge (a,a) must become [aa, a] — replace never
    rematches inside its own output, which is BPE's greedy rule."""
    import pandas as pd

    from stock_indicators_etl_spark.llmdata.bpe import bpe_encode

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["aaa"]}))
    out = bpe_encode(docs, [("a", "a")]).toPandas()
    assert out.iloc[0].tokens.tolist() == ["aa", "a", "</w>"]


def test_bpe_encode_applies_merges_in_order(spark):
    import pandas as pd

    from stock_indicators_etl_spark.llmdata.bpe import bpe_encode, bpe_train

    texts = ["the cat sat on the mat", "the cat ate the rat"]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": texts})
    )
    merges_df = bpe_train(docs, n_merges=6).toPandas()
    merges = list(zip(merges_df["left"], merges_df["right"]))
    enc = bpe_encode(docs, merges).toPandas().set_index("doc_id")

    # python reference encode with the same merges
    def ref_encode(text):
        toks = []
        for w in text.lower().split():
            syms = list(w) + ["</w>"]
            for a, b in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            toks.extend(syms)
        return toks

    for doc_id, text in zip([1, 2], texts):
        assert enc.loc[doc_id].tokens.tolist() == ref_encode(text), doc_id


def test_bpe_train_exhausts_small_vocab(spark):
    """More merges requested than pairs exist → stops early, no error."""
    import pandas as pd

    from stock_indicators_etl_spark.llmdata.bpe import bpe_train

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["ab"]}))
    got = bpe_train(docs, n_merges=20).toPandas()
    # "ab</w>": pairs (a,b) then (ab,</w>) then nothing
    assert len(got) == 2
    assert list(got["left"]) == ["a", "ab"]


def test_rrf_fuse_orders_shared_items_first(spark):
    import pandas as pd

    from stock_indicators_etl_spark.llmdata.retrieval import (
        RRF_SCALE,
        rrf_fuse,
    )

    # item 100 is rank-2 in BOTH lists; item 1 tops list A only
    ranked = pd.DataFrame(
        {
            "qid": ["a", "a", "a", "b", "b", "b"],
            "nbr_id": [1, 100, 3, 4, 100, 5],
            "rk": [1, 2, 3, 1, 2, 3],
        }
    )
    out = rrf_fuse(spark.createDataFrame(ranked), k=60).collect()
    by_rank = {r["fused_rank"]: r for r in out}
    assert by_rank[1]["item"] == 100 and by_rank[1]["n_lists"] == 2
    assert by_rank[1]["rrf_fp"] == 2 * (RRF_SCALE // 62)
    # singles follow, ordered by rank then id tiebreak
    assert by_rank[2]["item"] == 1 and by_rank[3]["item"] == 4
    assert {r["item"] for r in out} == {1, 3, 4, 5, 100}


def test_bigram_surprisal_separates_repetition_from_soup(spark):
    import pandas as pd

    from stock_indicators_etl_spark.llmdata.retrieval import bigram_surprisal

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                # pure repetition: one bigram dominating the corpus
                "spam ham " * 30,
                # coherent-ish: bigrams seen twice
                "the quick brown fox jumps the quick brown fox sleeps",
                # soup: every bigram unique
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",
            ],
        }
    )
    out = {
        r["doc_id"]: r
        for r in bigram_surprisal(spark.createDataFrame(docs)).collect()
    }
    # repetition is most predictable; the SOUP doc sits in the middle
    # (every context is a corpus singleton, so its only continuation
    # has conditional prob λ·1 — the bigram-LM overconfidence on
    # unseen contexts); the BRANCHING doc (fox → jumps/sleeps,
    # the → quick twice out of three) genuinely surprises most
    assert (
        out[1]["mean_surprisal"]
        < out[3]["mean_surprisal"]
        < out[2]["mean_surprisal"]
    )
    assert out[1]["n_bigrams"] == 59
    # single-token / empty docs would drop: none here, all three present
    assert set(out) == {1, 2, 3}
