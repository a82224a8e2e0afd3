"""rp_topk / knn_classify / link prediction / readability tests
(r7d wave): each operator replayed against a brute-force numpy or
pure-python reference on randomized inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _emb_df(spark, n=60, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype("float32")
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": list(map(list, vecs)),
            "label": (np.arange(n) % 4).astype("int64"),
        }
    )
    return spark.createDataFrame(pdf), vecs


class TestRpTopk:
    def test_full_shortlist_equals_exact(self, spark):
        """With a shortlist covering the whole corpus, rp_topk's
        rerank must return exactly the brute-force cosine top-k."""
        from stock_indicators_etl_spark.llmdata.similarity import (
            cosine_topk,
            rp_topk,
        )

        sdf, _ = _emb_df(spark, n=40, dim=16)
        from pyspark.sql import functions as F

        q = sdf.filter(F.col("vec_id") < 5)
        exact = (
            cosine_topk(sdf, q, k=5)
            .toPandas()
            .sort_values(["qid", "rk"])
            .reset_index(drop=True)
        )
        approx = (
            rp_topk(sdf, q, k=5, r_planes=8, dim=16, shortlist_factor=40)
            .toPandas()
            .sort_values(["qid", "rk"])
            .reset_index(drop=True)
        )
        assert list(exact.nbr_id) == list(approx.nbr_id)
        np.testing.assert_allclose(exact.cosine, approx.cosine, atol=1e-12)

    def test_recall_reasonable(self, spark):
        """16-plane projection with a 3k shortlist should recover most
        of the true top-k on random data (JL preserves geometry)."""
        from stock_indicators_etl_spark.llmdata.similarity import (
            cosine_topk,
            rp_topk,
        )
        from pyspark.sql import functions as F

        sdf, _ = _emb_df(spark, n=80, dim=16, seed=9)
        q = sdf.filter(F.col("vec_id") < 8)
        exact = cosine_topk(sdf, q, k=5).toPandas()
        approx = rp_topk(sdf, q, k=5, r_planes=8, dim=16, shortlist_factor=4).toPandas()
        hits = 0
        for qid in range(8):
            t = set(exact[exact.qid == qid].nbr_id)
            a = set(approx[approx.qid == qid].nbr_id)
            hits += len(t & a)
        assert hits / (8 * 5) >= 0.5


class TestKnnClassify:
    def test_matches_numpy_reference(self, spark):
        from stock_indicators_etl_spark.llmdata.similarity import knn_classify
        from pyspark.sql import functions as F

        sdf, vecs = _emb_df(spark, n=50, dim=12, seed=5)
        labels = (np.arange(50) % 4).astype("int64")
        q = sdf.filter(F.col("vec_id") < 6)
        out = knn_classify(sdf, q, k=7).toPandas().set_index("qid")
        norms = np.linalg.norm(vecs.astype("float64"), axis=1)
        for qid in range(6):
            cos = vecs.astype("float64") @ vecs[qid].astype("float64") / (
                norms * norms[qid]
            )
            order = sorted(
                (i for i in range(50) if i != qid),
                key=lambda i: (-cos[i], i),
            )[:7]
            votes: dict[int, int] = {}
            for i in order:
                votes[labels[i]] = votes.get(labels[i], 0) + 1
            pred = sorted(votes, key=lambda l: (-votes[l], l))[0]
            assert out.loc[qid, "pred_label"] == pred
            assert out.loc[qid, "votes"] == votes[pred]


class TestLinkPrediction:
    def test_matches_brute_python(self, spark):
        from stock_indicators_etl_spark.operators.graph import (
            link_prediction_scores,
        )

        rng = np.random.default_rng(17)
        edges = set()
        while len(edges) < 60:
            a, b = rng.integers(0, 25, size=2)
            if a != b:
                edges.add((min(int(a), int(b)), max(int(a), int(b))))
        df = spark.createDataFrame(
            [(a, b) for a, b in sorted(edges)], "src long, dst long"
        )
        got = link_prediction_scores(df, top_n=10).toPandas()

        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        cand = []
        nodes = sorted(adj)
        for i, u in enumerate(nodes):
            for v in nodes[i + 1 :]:
                if v in adj[u]:
                    continue
                cn = len(adj[u] & adj[v])
                if cn:
                    j = cn / (len(adj[u]) + len(adj[v]) - cn)
                    cand.append((cn, j, u, v))
        cand.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
        want = cand[:10]
        assert len(got) == len(want)
        for row, (cn, j, u, v) in zip(got.itertuples(), want):
            assert (row.u, row.v, row.cn) == (u, v, cn)
            assert row.jaccard == pytest.approx(j, abs=1e-12)

    def test_no_cartesian_in_plan(self, spark):
        from stock_indicators_etl_spark.operators.graph import (
            link_prediction_scores,
        )

        df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        plan = (
            link_prediction_scores(df, top_n=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "TakeOrderedAndProject" in plan


class TestReadability:
    def test_counts_and_score(self, spark):
        import __spark_entry__  # noqa: F401  (conf side effects not needed here)
        from stock_indicators_etl_spark.queries_llm import q_readability

        # build a tiny documents.parquet-shaped frame via a temp dir
        import tempfile

        pdf = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "The cat sat. The dog ran!",
                    "word",
                    "",
                ],
                "lang": ["en"] * 3,
                "source": ["t"] * 3,
                "n_chars": [25, 4, 0],
            }
        )
        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
            out = q_readability(spark, d).toPandas().set_index("doc_id")
        assert out.loc[0, "n_words"] == 6
        assert out.loc[0, "n_sentences"] == 2
        # "the cat sat. the dog ran!" vowel runs: e,a,a,e,o,a = 6
        assert out.loc[0, "n_syllables"] == 6
        w, s, sy = 6.0, 2.0, 6.0
        want = 206.835 - 1.015 * (w / s) - 84.6 * (sy / w)
        assert out.loc[0, "flesch"] == pytest.approx(want, abs=1e-6)
        assert out.loc[1, "n_sentences"] == 0  # fragment, floored to 1 in score
        assert out.loc[2, "n_words"] == 0 and pd.isna(out.loc[2, "flesch"])


class TestPerceptron:
    def test_matches_numpy_replica(self, spark):
        """Fixed-epoch batch perceptron == a numpy replay over the
        same int8 codes (quantizer included)."""
        from stock_indicators_etl_spark.llmdata.classifier import (
            perceptron_train,
        )

        sdf, vecs = _emb_df(spark, n=60, dim=16, seed=7)
        epochs, pos_min = 4, 2
        out = (
            perceptron_train(
                sdf, epochs=epochs, positive_min=pos_min, dim=16
            )
            .toPandas()
            .sort_values("j")
            .reset_index(drop=True)
        )
        v = vecs.astype("float64")
        nrm = np.linalg.norm(v, axis=1, keepdims=True)
        codes = np.where(
            nrm == 0, 0, np.floor(v / np.where(nrm == 0, 1, nrm) * 127.0 + 0.5)
        ).astype("int64")
        labels = (np.arange(60) % 4).astype("int64")
        y = np.where(labels >= pos_min, 1, -1).astype("int64")
        w = np.zeros(16, dtype="int64")
        n_mis = 0
        for _ in range(epochs):
            margin = y * (codes @ w)
            mis = margin <= 0
            w = w + (codes[mis] * y[mis, None]).sum(axis=0)
            n_mis = int(mis.sum())
        assert list(out.w) == list(w)
        assert (out.n_mis == n_mis).all()

    def test_converges_on_separable_fixture(self, spark):
        """A linearly separable corpus must reach 0 misclassified
        within a few epochs (perceptron convergence theorem)."""
        import pandas as pd

        from stock_indicators_etl_spark.llmdata.classifier import (
            perceptron_train,
        )

        rng = np.random.default_rng(15)
        n, dim = 80, 8
        direction = rng.normal(size=dim)
        xs, ys = [], []
        for i in range(n):
            x = rng.normal(size=dim)
            side = 1 if x @ direction > 0 else -1
            x = x + 2.0 * side * direction / np.linalg.norm(direction)
            xs.append(x.astype("float32"))
            ys.append(9 if side > 0 else 0)
        pdf = pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype="int64"),
                "embedding": [list(map(float, x)) for x in xs],
                "label": np.array(ys, dtype="int64"),
            }
        )
        stats: dict = {}
        sdf = spark.createDataFrame(pdf)
        out = perceptron_train(
            sdf, epochs=20, positive_min=5, dim=dim, _stats=stats
        ).toPandas()
        assert (out.n_mis == 0).all()
        # convergence early-exit (VERDICT r8 next #5): once n_mis
        # hits 0 the remaining epochs are no-ops and must be skipped
        assert stats["epochs_run"] < 20
        # ...and the early exit is bit-identical to a fixed run of
        # exactly that many epochs (the no-op-update argument)
        fixed = perceptron_train(
            sdf, epochs=stats["epochs_run"], positive_min=5, dim=dim
        ).toPandas()
        merged = out.sort_values("j").reset_index(drop=True)
        fixedm = fixed.sort_values("j").reset_index(drop=True)
        assert list(merged.w) == list(fixedm.w)
        assert list(merged.n_mis) == list(fixedm.n_mis)


class TestMultiprobeLsh:
    def test_recall_dominates_single_probe(self, spark):
        """Probing the 8 flip buckets can only ADD candidates, so
        multi-probe recall >= single-probe recall, query by query."""
        from pyspark.sql import functions as F

        from stock_indicators_etl_spark.llmdata.similarity import (
            cosine_topk,
            lsh_bucketed_topk,
            multiprobe_lsh_topk,
        )

        sdf, _ = _emb_df(spark, n=120, dim=16, seed=21)
        q = sdf.filter(F.col("vec_id") < 10)
        exact = cosine_topk(sdf, q, k=5).toPandas()
        single = lsh_bucketed_topk(sdf, q, k=5, dim=16).toPandas()
        multi = multiprobe_lsh_topk(sdf, q, k=5, dim=16).toPandas()
        s_hits = m_hits = 0
        for qid in range(10):
            t = set(exact[exact.qid == qid].nbr_id)
            s_hits += len(set(single[single.qid == qid].nbr_id) & t)
            m_hits += len(set(multi[multi.qid == qid].nbr_id) & t)
        assert m_hits >= s_hits
        assert m_hits > 0

    def test_nflip_zero_equals_single_probe(self, spark):
        from pyspark.sql import functions as F

        from stock_indicators_etl_spark.llmdata.similarity import (
            lsh_bucketed_topk,
            multiprobe_lsh_topk,
        )

        sdf, _ = _emb_df(spark, n=60, dim=16, seed=2)
        q = sdf.filter(F.col("vec_id") < 5)
        a = lsh_bucketed_topk(sdf, q, k=5, dim=16).toPandas()
        b = multiprobe_lsh_topk(sdf, q, k=5, dim=16, n_flip=0).toPandas()
        key = lambda d: sorted(map(tuple, d[["qid", "rk", "nbr_id"]].values))
        assert key(a) == key(b)


class TestPerceptronScore:
    def test_train_then_score_consistency(self, spark):
        """Scoring the training set with the final weights reproduces
        the final epoch's margin signs — and works unchanged as a
        stream-static join on a readStream frame."""
        from stock_indicators_etl_spark.llmdata.classifier import (
            perceptron_score,
            perceptron_train,
        )

        sdf, vecs = _emb_df(spark, n=50, dim=16, seed=33)
        w = perceptron_train(sdf, epochs=6, positive_min=2, dim=16)
        scored = perceptron_score(sdf, w, dim=16).toPandas()
        assert len(scored) == 50
        # replicate margins in numpy
        v = vecs.astype("float64")
        nrm = np.linalg.norm(v, axis=1, keepdims=True)
        codes = np.where(
            nrm == 0, 0, np.floor(v / np.where(nrm == 0, 1, nrm) * 127.0 + 0.5)
        ).astype("int64")
        wv = (
            w.toPandas().sort_values("j").w.values.astype("int64")
        )
        margins = codes @ wv
        got = scored.sort_values("id").reset_index(drop=True)
        assert list(got.margin) == list(margins)
        assert list(got.pred) == list(margins > 0)

    def test_streaming_inference(self, spark, tmp_path):
        import pandas as pd

        from stock_indicators_etl_spark.llmdata.classifier import (
            perceptron_score,
            perceptron_train,
        )

        sdf, _ = _emb_df(spark, n=30, dim=16, seed=4)
        w = perceptron_train(sdf, epochs=3, positive_min=2, dim=16)
        src = tmp_path / "emb_stream"
        src.mkdir()
        sdf.toPandas().to_parquet(str(src / "a.parquet"))
        stream = spark.readStream.schema(
            "vec_id bigint, embedding array<float>, label bigint"
        ).parquet(str(src))
        out = perceptron_score(stream, w, dim=16)
        q = (
            out.writeStream.format("memory")
            .queryName("pscore")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_ps"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select * from pscore").toPandas()
        batch = perceptron_score(sdf, w, dim=16).toPandas()
        assert sorted(got.margin) == sorted(batch.margin)
