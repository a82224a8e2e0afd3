"""Corpus-curation operators: span dedup, weighted sampling,
leakage-safe splits (`llmdata/dedup.span_dedup`,
`llmdata/sampling.weighted_sample` / `leakage_safe_split`)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from stock_indicators_etl_spark.llmdata.dedup import span_dedup
from stock_indicators_etl_spark.llmdata.sampling import (
    leakage_safe_split,
    weighted_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


BLOCK = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen"


class TestSpanDedup:
    def test_repeated_block_removed_from_later_doc(self, spark):
        unique = "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu xi omicron pi"
        docs = _docs(spark, [(1, f"{BLOCK} {unique}"), (2, f"{BLOCK} {unique}")])
        out = {r.doc_id: r for r in span_dedup(docs, block_words=16).collect()}
        # doc 1 (first occurrence) keeps everything
        assert out[1].clean_text == f"{BLOCK} {unique}"
        assert out[1].n_spans == 2 and out[1].n_spans_kept == 2
        # doc 2's both blocks already occurred -> fully emptied
        assert out[2].clean_text == "" and out[2].n_spans_kept == 0

    def test_unique_doc_reassembles_to_normalized_text(self, spark):
        txt = "  The Quick   Brown fox JUMPS over the lazy dog again and again today  "
        docs = _docs(spark, [(7, txt)])
        out = span_dedup(docs, block_words=5).collect()[0]
        norm = " ".join(txt.lower().split())
        assert out.clean_text == norm
        assert out.n_spans == out.n_spans_kept == 3  # 13 words / 5

    def test_empty_doc_survives_with_empty_clean_text(self, spark):
        docs = _docs(spark, [(1, ""), (2, "   "), (3, "hello world")])
        out = {r.doc_id: r for r in span_dedup(docs).collect()}
        assert out[1].clean_text == "" and out[1].n_spans == 0
        assert out[2].clean_text == "" and out[2].n_spans == 0
        assert out[3].clean_text == "hello world"

    def test_intra_document_repeats_collapse(self, spark):
        # same block twice INSIDE one doc: second occurrence dropped
        docs = _docs(spark, [(1, f"{BLOCK} {BLOCK}")])
        out = span_dedup(docs, block_words=16).collect()[0]
        assert out.clean_text == BLOCK
        assert out.n_spans == 2 and out.n_spans_kept == 1

    def test_paragraph_mode_with_separator(self, spark):
        docs = _docs(
            spark,
            [
                (1, "first paragraph here\nshared boilerplate footer"),
                (2, "different opening text\nshared boilerplate footer"),
            ],
        )
        out = {
            r.doc_id: r for r in span_dedup(docs, sep="\n").collect()
        }
        assert out[1].clean_text == "first paragraph here shared boilerplate footer"
        assert out[2].clean_text == "different opening text"
        assert out[2].n_spans == 2 and out[2].n_spans_kept == 1


class TestWeightedSample:
    def _weighted(self, spark, weights):
        return spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": range(len(weights)), "w": weights}
            )
        )

    def test_deterministic_across_runs(self, spark):
        df = self._weighted(spark, [1.0] * 50)
        a = [r.doc_id for r in weighted_sample(df, "w", 10).collect()]
        b = [r.doc_id for r in weighted_sample(df, "w", 10).collect()]
        assert a == b and len(a) == 10

    def test_zero_and_negative_weights_never_drawn(self, spark):
        df = self._weighted(spark, [0.0, -1.0] + [1.0] * 10)
        got = {r.doc_id for r in weighted_sample(df, "w", 12).collect()}
        assert got == set(range(2, 12))

    def test_dominant_weight_always_selected(self, spark):
        # key = ln(u)/w -> a astronomically heavy row's key ~ 0⁻ beats
        # every unit-weight row regardless of hash draw
        df = self._weighted(spark, [1.0] * 99 + [1e12])
        top = weighted_sample(df, "w", 1).collect()[0]
        assert top.doc_id == 99

    def test_n_exceeding_population_returns_all_positive(self, spark):
        df = self._weighted(spark, [0.0, 2.0, 3.0])
        got = {r.doc_id for r in weighted_sample(df, "w", 100).collect()}
        assert got == {1, 2}


class TestLeakageSafeSplit:
    def _comps(self, spark, mapping):
        return spark.createDataFrame(
            pd.DataFrame(
                [(k, v) for k, v in mapping.items()],
                columns=["doc_id", "component"],
            )
        )

    def test_component_members_share_split(self, spark):
        # 100 docs in 10 components of 10
        mapping = {i: (i // 10) * 10 for i in range(100)}
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(100)})
        )
        out = leakage_safe_split(docs, self._comps(spark, mapping)).collect()
        by_comp: dict[int, set[str]] = {}
        for r in out:
            by_comp.setdefault(r.component, set()).add(r.split)
        assert len(out) == 100
        assert all(len(s) == 1 for s in by_comp.values())

    def test_fractions_roughly_respected(self, spark):
        n = 2000  # singleton components
        docs = spark.createDataFrame(pd.DataFrame({"doc_id": range(n)}))
        comps = self._comps(spark, {i: i for i in range(n)})
        out = leakage_safe_split(docs, comps, fractions=(0.8, 0.1))
        counts = {
            r["split"]: r["n"]
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        assert abs(counts["train"] / n - 0.8) < 0.05
        assert abs(counts.get("val", 0) / n - 0.1) < 0.03
        assert abs(counts.get("test", 0) / n - 0.1) < 0.03

    def test_bad_fractions_raise(self, spark):
        docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1]}))
        comps = self._comps(spark, {1: 1})
        with pytest.raises(ValueError):
            leakage_safe_split(docs, comps, fractions=(0.9, 0.2))

    def test_split_stable_under_corpus_growth(self, spark):
        # adding new docs must not move an existing component's split
        docs1 = spark.createDataFrame(pd.DataFrame({"doc_id": range(50)}))
        comps1 = self._comps(spark, {i: i for i in range(50)})
        first = {
            r.doc_id: r.split
            for r in leakage_safe_split(docs1, comps1).collect()
        }
        docs2 = spark.createDataFrame(pd.DataFrame({"doc_id": range(100)}))
        comps2 = self._comps(spark, {i: i for i in range(100)})
        second = {
            r.doc_id: r.split
            for r in leakage_safe_split(docs2, comps2).collect()
        }
        assert all(second[i] == first[i] for i in range(50))


class TestRecommendedLshBlocking:
    def test_bucket_space_scales_with_corpus(self):
        from stock_indicators_etl_spark.llmdata.similarity import (
            recommended_lsh_blocking,
        )

        small = recommended_lsh_blocking(200)
        mid = recommended_lsh_blocking(20_000)
        big = recommended_lsh_blocking(10**9)
        # band_size (log2 of bucket count) grows with N...
        assert small[1] < mid[1] < big[1]
        # ...keeping expected bucket size ~target regardless of N
        for n, (_, bs) in ((200, small), (20_000, mid), (10**9, big)):
            assert n / (1 << bs) <= 256 * 2

    def test_recall_model_met(self):
        import math

        from stock_indicators_etl_spark.llmdata.similarity import (
            recommended_lsh_blocking,
        )

        for n in (1000, 10**6, 10**9):
            for thr in (0.8, 0.9, 0.95):
                planes, bs = recommended_lsh_blocking(n, threshold=thr)
                bands = planes // bs
                p = 1 - math.acos(thr) / math.pi
                recall = 1 - (1 - p**bs) ** bands
                assert recall >= 0.95 - 1e-9, (n, thr, planes, bs, recall)

    def test_invalid_threshold_raises(self):
        import pytest as _pytest

        from stock_indicators_etl_spark.llmdata.similarity import (
            recommended_lsh_blocking,
        )

        with _pytest.raises(ValueError):
            recommended_lsh_blocking(1000, threshold=1.5)


class TestPqTopk:
    def _emb(self, spark, n=24, dim=16, seed=3):
        import numpy as np

        rng = np.random.default_rng(seed)
        mat = rng.normal(size=(n, dim)).round(3)
        return (
            spark.createDataFrame(
                pd.DataFrame(
                    {"vec_id": range(n), "embedding": [list(map(float, r)) for r in mat]}
                )
            ),
            mat,
        )

    def _replica(self, mat, qids, k, m, ksub):
        """Brute-force python replay of pq_topk's exact algorithm."""
        import hashlib

        import numpy as np

        n, dim = mat.shape
        sub = dim // m
        order = sorted(range(n), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        samp = [mat[i] for i in order[:ksub]]
        out = []
        codes = np.zeros((n, m), dtype=int)
        for i in range(n):
            for s in range(m):
                d2 = [
                    float(np.sum((mat[i, s * sub:(s + 1) * sub] - c[s * sub:(s + 1) * sub]) ** 2))
                    for c in samp
                ]
                codes[i, s] = int(np.argmin(d2))  # argmin -> first min = lowest j
        for qid in qids:
            qv = mat[qid]
            qnrm = float(np.linalg.norm(qv))
            scored = []
            for i in range(n):
                if i == qid:
                    continue
                rec = np.concatenate(
                    [samp[codes[i, s]][s * sub:(s + 1) * sub] for s in range(m)]
                )
                rnrm = float(np.linalg.norm(rec))
                adc = float(np.dot(qv, rec))
                scored.append((adc / (qnrm * rnrm) if qnrm * rnrm else 0.0, i))
            scored.sort(key=lambda t: (-t[0], t[1]))
            for rk, (cos, i) in enumerate(scored[:k], 1):
                out.append((qid, rk, i, cos))
        return out

    def test_matches_python_replica(self, spark):
        from stock_indicators_etl_spark.llmdata.similarity import pq_topk

        emb, mat = self._emb(spark)
        q = emb.filter(F.col("vec_id") < 3)
        got = sorted(
            (r.qid, r.rk, r.nbr_id, r.approx_cosine)
            for r in pq_topk(emb, q, k=5, m=4, ksub=4).collect()
        )
        want = sorted(self._replica(mat, [0, 1, 2], k=5, m=4, ksub=4))
        assert [(a, b, c) for a, b, c, _ in got] == [(a, b, c) for a, b, c, _ in want]
        for (_, _, _, g), (_, _, _, w) in zip(got, want):
            assert abs(g - w) < 1e-9

    def test_exact_when_vectors_are_codebook_entries(self, spark):
        """Vectors drawn FROM the sampled codebook reconstruct exactly,
        so PQ ranking equals exact cosine ranking."""
        import numpy as np

        from stock_indicators_etl_spark.llmdata.similarity import (
            cosine_topk,
            pq_topk,
        )

        rng = np.random.default_rng(7)
        protos = rng.normal(size=(4, 8)).round(2)
        # 16 vectors cycling over 4 prototypes: any 4+ sample covers
        # duplicates of each, and every vector hits a zero-distance code
        mat = np.stack([protos[i % 4] for i in range(16)])
        emb = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": range(16), "embedding": [list(map(float, r)) for r in mat]}
            )
        )
        q = emb.filter(F.col("vec_id") < 2)
        got = {
            (r.qid, r.rk): (r.nbr_id, round(r.approx_cosine, 9))
            for r in pq_topk(emb, q, k=4, m=2, ksub=16).collect()
        }
        exact = {
            (r.qid, r.rk): (r.nbr_id, round(r.cosine, 9))
            for r in cosine_topk(emb, q, k=4).collect()
        }
        assert got == exact

    def test_dim_not_divisible_raises(self, spark):
        from stock_indicators_etl_spark.llmdata.similarity import pq_topk

        emb, _ = self._emb(spark, dim=10)
        with pytest.raises(ValueError):
            pq_topk(emb, emb.limit(1), m=4)


class TestCorpusStats:
    def test_frequent_ngrams_known_answer(self, spark):
        from stock_indicators_etl_spark.llmdata.text import frequent_ngrams

        docs = _docs(
            spark,
            [
                (1, "all rights reserved here"),
                (2, "all rights reserved there"),
                (3, "something else entirely now"),
            ],
        )
        out = frequent_ngrams(docs, n=3, top=2).collect()
        assert (out[0].ngram, out[0].n_occurrences, out[0].n_docs) == (
            "all rights reserved", 2, 2,
        )
        # rank 2 resolves ties by gram asc
        assert out[1].n_occurrences == 1

    def test_frequent_ngrams_short_docs_contribute_nothing(self, spark):
        from stock_indicators_etl_spark.llmdata.text import frequent_ngrams

        docs = _docs(spark, [(1, "two words"), (2, "")])
        assert frequent_ngrams(docs, n=3, top=5).count() == 0

    def test_tfidf_rare_term_outranks_common(self, spark):
        from stock_indicators_etl_spark.llmdata.text import tfidf_keywords

        docs = _docs(
            spark,
            [
                (1, "common common common zebra"),
                (2, "common filler text"),
                (3, "common other words"),
            ],
        )
        out = {r.doc_id: r for r in tfidf_keywords(docs, top=1).collect()}
        # "common" appears in every doc -> idf ln(4/4)=0; "zebra" is
        # unique -> positive idf, wins despite tf 1 vs 3
        assert out[1].term == "zebra" and out[1].df == 1
        assert out[1].score > 0


class TestIvfPqTopk:
    def test_probe_all_cells_equals_pq(self, spark):
        """With n_probe = n_centroids the cell gate admits every
        candidate, so IVFPQ must reduce exactly to PQ/ADC."""
        import numpy as np

        from stock_indicators_etl_spark.llmdata.similarity import (
            ivfpq_topk,
            pq_topk,
        )

        rng = np.random.default_rng(5)
        mat = rng.normal(size=(30, 16)).round(3)
        emb = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": range(30), "embedding": [list(map(float, r)) for r in mat]}
            )
        )
        q = emb.filter(F.col("vec_id") < 3)
        full = {
            (r.qid, r.rk): (r.nbr_id, round(r.approx_cosine, 9))
            for r in ivfpq_topk(
                emb, q, k=5, n_centroids=4, n_probe=4, m=4, ksub=4
            ).collect()
        }
        pq = {
            (r.qid, r.rk): (r.nbr_id, round(r.approx_cosine, 9))
            for r in pq_topk(emb, q, k=5, m=4, ksub=4).collect()
        }
        assert full == pq

    def test_pruning_reduces_candidates_but_keeps_output_shape(self, spark):
        import numpy as np

        from stock_indicators_etl_spark.llmdata.similarity import ivfpq_topk

        rng = np.random.default_rng(9)
        mat = rng.normal(size=(40, 16)).round(3)
        emb = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": range(40), "embedding": [list(map(float, r)) for r in mat]}
            )
        )
        q = emb.filter(F.col("vec_id") < 2)
        out = ivfpq_topk(emb, q, k=5, n_centroids=8, n_probe=2, m=4, ksub=4)
        rows = out.collect()
        assert set(out.columns) == {"qid", "rk", "nbr_id", "approx_cosine"}
        by_q = {}
        for r in rows:
            by_q.setdefault(r.qid, []).append(r.rk)
        for rks in by_q.values():
            assert sorted(rks) == list(range(1, len(rks) + 1))


class TestPqRerank:
    def test_rerank_full_shortlist_equals_exact(self, spark):
        """rerank with a corpus-wide shortlist must reproduce exact
        cosine top-k bit-for-bit (stage two IS exact scoring)."""
        import numpy as np

        from stock_indicators_etl_spark.llmdata.similarity import (
            cosine_topk,
            pq_topk,
        )

        rng = np.random.default_rng(11)
        mat = rng.normal(size=(30, 16)).round(3)
        emb = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": range(30), "embedding": [list(map(float, r)) for r in mat]}
            )
        )
        q = emb.filter(F.col("vec_id") < 3)
        two_stage = {
            (r.qid, r.rk): (r.nbr_id, round(r.cosine, 9))
            for r in pq_topk(emb, q, k=5, m=4, ksub=4, rerank=29).collect()
        }
        exact = {
            (r.qid, r.rk): (r.nbr_id, round(r.cosine, 9))
            for r in cosine_topk(emb, q, k=5).collect()
        }
        assert two_stage == exact

    def test_rerank_recovers_within_cluster_ranking(self, spark):
        """Same-cluster vectors share PQ codes (ADC ties); the exact
        rerank stage must still rank them correctly."""
        import numpy as np

        from stock_indicators_etl_spark.llmdata.similarity import (
            cosine_topk,
            pq_topk,
        )

        rng = np.random.default_rng(13)
        centers = rng.normal(size=(4, 16))
        mat = np.stack(
            [centers[i % 4] + 0.01 * rng.normal(size=16) for i in range(40)]
        ).round(4)
        emb = spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": range(40), "embedding": [list(map(float, r)) for r in mat]}
            )
        )
        q = emb.filter(F.col("vec_id") < 2)
        plain = {
            (r.qid, r.rk): r.nbr_id
            for r in pq_topk(emb, q, k=5, m=4, ksub=8).collect()
        }
        reranked = {
            (r.qid, r.rk): r.nbr_id
            for r in pq_topk(emb, q, k=5, m=4, ksub=8, rerank=20).collect()
        }
        exact = {
            (r.qid, r.rk): r.nbr_id for r in cosine_topk(emb, q, k=5).collect()
        }
        # the reranked top-k agrees with exact far better than raw ADC
        agree = lambda d: sum(d[key] == exact[key] for key in exact if key in d)
        assert agree(reranked) > agree(plain)
        assert agree(reranked) >= int(0.8 * len(exact))


class TestClusterKeywords:
    def test_labels_separate_topic_clusters(self, spark):
        """Two well-separated embedding clusters whose docs use
        disjoint vocabularies: each cluster's top keyword must come
        from its own vocabulary, and cluster-ubiquitous filler must
        rank below (idf ln(3/3)=0... ln((2+1)/(2+1))=0 for df=2)."""
        import numpy as np

        from stock_indicators_etl_spark.llmdata.clustering import (
            cluster_keywords,
            kmeans_assign,
        )

        emb_rows, doc_rows = [], []
        for i in range(8):
            topic = i % 2
            base = [5.0, 0.0] if topic == 0 else [0.0, 5.0]
            emb_rows.append((i, [base[0] + 0.01 * i, base[1], 0.0, 0.0]))
            word = "finance" if topic == 0 else "biology"
            doc_rows.append((i, f"filler {word} {word} common filler"))
        emb = spark.createDataFrame(
            pd.DataFrame(emb_rows, columns=["vec_id", "embedding"])
        )
        docs = spark.createDataFrame(
            pd.DataFrame(doc_rows, columns=["doc_id", "text"])
        )
        assign = kmeans_assign(emb, k=2, iters=2).select("vec_id", "cluster")
        out = cluster_keywords(docs, assign, top=1).collect()
        tops = {r.cluster: r.term for r in out}
        assert set(tops.values()) == {"finance", "biology"}
        # per-cluster tf of the topic word = 2 occurrences × 4 docs
        assert all(r.tf == 8 and r.df == 1 for r in out)


# ---------------------------------------------------------------------------
# canonicalization + compressibility
# ---------------------------------------------------------------------------


def test_canonical_text_rules(spark):
    from stock_indicators_etl_spark.llmdata.text import canonical_text

    cases = {
        "‘quo’ “dq”": "'quo' \"dq\"",
        "a – b — c": "a - b - c",
        "wait…": "wait...",
        "x\x00\x01y\x7f": "xy",
        "no!!!!!! way????? ......... ------": "no!!! way??? ... ---",
        "a  \t b": "a b",
        "unchanged text.": "unchanged text.",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(cases)), "text": list(cases)})
    )
    out = (
        df.select("doc_id", canonical_text(F.col("text")).alias("c"))
        .toPandas()
        .sort_values("doc_id")
    )
    assert list(out.c) == list(cases.values())


def test_canonicalize_qa_frame(spark):
    from stock_indicators_etl_spark.llmdata.text import canonicalize

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["plain", "a…b!!!!!"]})
    )
    out = canonicalize(df).toPandas().set_index("doc_id")
    assert out.loc[1, "changed"] == 0
    assert out.loc[2, "changed"] == 1
    assert out.loc[2, "n_chars_clean"] == len("a...b!!!")


def test_compression_ratio_orders_quality(spark):
    import numpy as np

    from stock_indicators_etl_spark.llmdata.text import compression_ratio

    rng = np.random.default_rng(17)
    diverse = " ".join(
        "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), 8))
        for _ in range(200)
    )
    boiler = "click here to subscribe now " * 200
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": [diverse, boiler, ""]})
    )
    out = compression_ratio(df).toPandas().set_index("doc_id")
    assert out.loc[2, "ratio"] < out.loc[1, "ratio"]  # boilerplate squeezes
    assert out.loc[3, "ratio"] == 1.0 and out.loc[3, "n_bytes"] == 0
    # ratio reproducible: zlib level fixed
    out2 = compression_ratio(df).toPandas().set_index("doc_id")
    assert (out.ratio == out2.ratio).all()


def test_survivors_by_quality_keeps_best_member(spark):
    import pandas as pd

    from stock_indicators_etl_spark.llmdata.dedup import survivors_by_quality

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 10, 11, 20],
                "q": [5, 9, 9, 3, 1, 7],
                "lang": ["a", "b", "c", "d", "e", "f"],
            }
        )
    )
    comps = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 10, 11, 20],
                "component": [1, 1, 1, 10, 10, 20],
            }
        )
    )
    out = survivors_by_quality(docs, comps, "q").toPandas()
    got = sorted(zip(out.doc_id, out.q))
    # group 1: q ties at 9 between 2 and 3 → min id 2; group 10: max q
    # is doc 10; singleton 20 survives
    assert got == [(2, 9), (10, 3), (20, 7)]
    assert set(out.columns) == {"doc_id", "q", "lang"}


def test_collocation_lift_known_answer(spark):
    import pandas as pd

    from stock_indicators_etl_spark.llmdata.text import collocation_lift

    # "new york" always adjacent (planted collocation); "the" everywhere
    rows = ["new york is big", "new york is old", "the new york the"]
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2, 3], "text": rows}))
    out = collocation_lift(docs, min_count=3).toPandas().set_index(["w1", "w2"])
    ny = out.loc[("new", "york")]
    # counts: new=3, york=3, (new,york)=3, N=12 → lift = 3*12/(3*3) = 4
    assert ny.c_xy == 3 and ny.c_x == 3 and ny.c_y == 3 and ny.n_tokens == 12
    assert abs(ny.lift - 4.0) < 1e-12
    # nothing below min_count leaks through
    assert out.c_xy.min() >= 3


def test_collocation_lift_matches_bruteforce(spark):
    import collections

    import pandas as pd

    from stock_indicators_etl_spark.llmdata.text import collocation_lift

    import numpy as np

    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 9)))
        for _ in range(40)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(40), "text": texts})
    )
    out = collocation_lift(docs, min_count=2).toPandas()
    uni = collections.Counter(w for t in texts for w in t.split())
    bg = collections.Counter(
        (a, b) for t in texts for a, b in zip(t.split(), t.split()[1:])
    )
    n = sum(uni.values())
    for r in out.itertuples():
        assert bg[(r.w1, r.w2)] == r.c_xy
        assert uni[r.w1] == r.c_x and uni[r.w2] == r.c_y
        assert r.n_tokens == n
        assert abs(r.lift - r.c_xy * n / (r.c_x * r.c_y)) < 1e-12
    assert len(out) == sum(1 for c in bg.values() if c >= 2)
