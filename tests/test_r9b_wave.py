"""Exact KS drift / modularity / blocklist gate / CCNet line-dedup /
Naive Bayes (r9b wave) tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestKsDrift:
    def _ks(self, spark, a_vals, b_vals):
        from stock_indicators_etl_spark.operators.dq import ks_drift

        a = spark.createDataFrame([("k", v) for v in a_vals], "key string, value double")
        b = spark.createDataFrame([("k", v) for v in b_vals], "key string, value double")
        return ks_drift(a, b, ("key",), "value").toPandas().iloc[0]

    def test_identical_samples_zero(self, spark):
        vals = [1.0, 2.0, 3.0, 4.0]
        r = self._ks(spark, vals, vals)
        assert r.ks == 0.0 and r.d_num == 0.0

    def test_disjoint_supports_one(self, spark):
        r = self._ks(spark, [1.0, 2.0], [10.0, 11.0])
        assert r.ks == 1.0

    def test_known_statistic(self, spark):
        # a = {1,2,3,4}, b = {3,4,5,6}: max CDF gap at x=2 → |2/4 − 0/4| = 0.5
        r = self._ks(spark, [1.0, 2.0, 3.0, 4.0], [3.0, 4.0, 5.0, 6.0])
        assert abs(r.ks - 0.5) < 1e-12
        assert r.n_a == 4 and r.n_b == 4 and r.n_values == 6

    def test_scipy_free_replica_random(self, spark):
        # numpy-free exact replica over a deterministic pseudo-sample
        a = [((i * 37) % 101) / 7.0 for i in range(40)]
        b = [((i * 53 + 11) % 97) / 5.0 for i in range(60)]

        def cents(v):
            return math.floor(v * 100 + 0.5)

        ca = sorted(cents(v) for v in a)
        cb = sorted(cents(v) for v in b)
        xs = sorted(set(ca) | set(cb))
        best = 0
        for x in xs:
            fa = sum(1 for v in ca if v <= x)
            fb = sum(1 for v in cb if v <= x)
            best = max(best, abs(fa * len(cb) - fb * len(ca)))
        expect = best / (len(ca) * len(cb))
        r = self._ks(spark, a, b)
        assert abs(r.ks - expect) < 1e-12

    def test_absent_side_key_reports_one(self, spark):
        from stock_indicators_etl_spark.operators.dq import ks_drift

        a = spark.createDataFrame(
            [("k", 1.0), ("only_a", 2.0)], "key string, value double"
        )
        b = spark.createDataFrame([("k", 1.0)], "key string, value double")
        out = {
            r["key"]: r["ks"]
            for r in ks_drift(a, b, ("key",), "value").collect()
        }
        assert out["only_a"] == 1.0 and out["k"] == 0.0


class TestModularity:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src long, dst long")

    def test_two_cliques_positive_q(self, spark):
        from stock_indicators_etl_spark.operators.graph import modularity

        # two triangles bridged by one edge; communities = the triangles
        pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
        labels = spark.createDataFrame(
            [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3)], "v long, label long"
        )
        out = modularity(self._edges(spark, pairs), labels).toPandas()
        m = 7
        # community 0: e_in=3, deg_sum = 2+2+3 = 7 → (4·7·3 − 49)/(4·49)
        row0 = out[out.label == 0].iloc[0]
        assert row0.e_in == 3 and row0.deg_sum == 7 and row0.m == m
        assert abs(row0.q_contrib - (4 * m * 3 - 49) / (4 * m * m)) < 1e-12
        q = out.q_contrib.sum()
        assert 0.3 < q < 0.5  # real block structure

    def test_single_community_zero_q(self, spark):
        from stock_indicators_etl_spark.operators.graph import modularity

        # all vertices one community: e_in = m, deg_sum = 2m → Q = 0
        pairs = [(0, 1), (1, 2), (0, 2)]
        labels = spark.createDataFrame(
            [(0, 9), (1, 9), (2, 9)], "v long, label long"
        )
        out = modularity(self._edges(spark, pairs), labels).toPandas()
        assert len(out) == 1
        assert abs(out.iloc[0].q_contrib) < 1e-12

    def test_canonicalization_dedups_edges(self, spark):
        from stock_indicators_etl_spark.operators.graph import modularity

        # duplicate + reversed + self-loop edges collapse to one edge
        pairs = [(0, 1), (1, 0), (0, 1), (1, 1)]
        labels = spark.createDataFrame([(0, 0), (1, 0)], "v long, label long")
        out = modularity(self._edges(spark, pairs), labels).toPandas()
        assert out.iloc[0].m == 1 and out.iloc[0].e_in == 1


class TestBlocklistFilter:
    def test_hits_and_keep(self, spark):
        from stock_indicators_etl_spark.llmdata.text import blocklist_filter

        docs = _docs(
            spark,
            [
                (1, "clean words only here"),
                (2, "this doc is slow and slow again"),
                (3, "dup and slow both appear"),
            ],
        )
        out = {
            r["doc_id"]: r
            for r in blocklist_filter(docs, ("dup", "slow", "absent")).collect()
        }
        assert out[1]["keep"] and out[1]["n_hits"] == 0
        assert out[1]["matched_terms"] == []
        assert not out[2]["keep"] and out[2]["n_hits"] == 2
        assert out[2]["matched_terms"] == ["slow"]
        assert out[3]["matched_terms"] == ["dup", "slow"]

    def test_word_not_substring(self, spark):
        from stock_indicators_etl_spark.llmdata.text import blocklist_filter

        docs = _docs(spark, [(1, "scrapbook therapy")])
        r = blocklist_filter(docs, ("rap",)).collect()[0]
        assert r["keep"] and r["n_hits"] == 0

    def test_pure_scan_plan(self, spark):
        from stock_indicators_etl_spark.llmdata.text import blocklist_filter

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            blocklist_filter(docs, ("dup",))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestLineDedup:
    def test_boilerplate_dropped_everywhere(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import line_dedup

        boiler = " ".join(f"b{i}" for i in range(16))
        uniq = [" ".join(f"u{d}x{i}" for i in range(16)) for d in range(3)]
        docs = _docs(
            spark, [(d, boiler + " " + uniq[d]) for d in range(3)]
        )
        out = {
            r["doc_id"]: r
            for r in line_dedup(docs, max_doc_freq=1, block_words=16).collect()
        }
        for d in range(3):
            assert out[d]["n_spans"] == 2
            assert out[d]["n_spans_kept"] == 1
            assert out[d]["clean_text"] == uniq[d]

    def test_unique_content_untouched(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import line_dedup

        docs = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon zeta")])
        out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
        assert out[1]["clean_text"] == "alpha beta gamma"
        assert out[1]["n_spans_kept"] == 1

    def test_doc_freq_not_occurrence_freq(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import line_dedup

        # same 16-word block TWICE within one doc: doc-freq is 1 → kept
        blk = " ".join(f"w{i}" for i in range(16))
        docs = _docs(spark, [(1, blk + " " + blk)])
        r = line_dedup(docs, max_doc_freq=1, block_words=16).collect()[0]
        assert r["n_spans_kept"] == 2

    def test_empty_doc_survives(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import line_dedup

        docs = _docs(spark, [(1, ""), (2, "alpha beta")])
        out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
        assert out[1]["clean_text"] == "" and out[1]["n_spans"] == 0

    def test_threshold_two(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import line_dedup

        blk = " ".join(f"c{i}" for i in range(16))
        docs = _docs(spark, [(1, blk), (2, blk), (3, blk)])
        kept2 = {
            r["doc_id"]: r["n_spans_kept"]
            for r in line_dedup(docs, max_doc_freq=2, block_words=16).collect()
        }
        assert kept2 == {1: 0, 2: 0, 3: 0}
        docs2 = _docs(spark, [(1, blk), (2, blk)])
        kept3 = {
            r["doc_id"]: r["n_spans_kept"]
            for r in line_dedup(docs2, max_doc_freq=2, block_words=16).collect()
        }
        assert kept3 == {1: 1, 2: 1}


class TestNaiveBayes:
    def _train_score(self, spark, rows, score_rows=None):
        from stock_indicators_etl_spark.llmdata.classifier import nb_score, nb_train

        docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        classes, priors, weights = nb_train(docs)
        target = docs if score_rows is None else spark.createDataFrame(
            score_rows, "doc_id long, lang string, text string"
        )
        return classes, nb_score(target, classes, priors, weights)

    def test_separable_vocab_perfect(self, spark):
        rows = [
            (1, "en", "cat dog cat dog bird"),
            (2, "en", "dog cat bird dog"),
            (3, "fr", "chat chien chat oiseau"),
            (4, "fr", "chien chat chien"),
        ]
        classes, out = self._train_score(spark, rows)
        assert classes == ["en", "fr"]
        res = out.toPandas()
        assert bool(res.correct.all())

    def test_python_replica_exact(self, spark):
        rows = [
            (1, "a", "x x y"),
            (2, "a", "x z"),
            (3, "b", "y y z z z"),
            (4, "b", "z y"),
        ]
        _, out = self._train_score(spark, rows)
        got = {r["doc_id"]: (r["predicted"], r["score"]) for r in out.collect()}

        # replica: counts, micro-nat weights, priors
        toks = {"a": "x x y x z".split(), "b": "y y z z z z y".split()}
        vocab = sorted({w for t in toks.values() for w in t})
        v = len(vocab)
        classes = ["a", "b"]

        def unats(x):
            return math.floor(x * 1e6 + 0.5)

        wt = {
            (w, c): unats(
                math.log((toks[c].count(w) + 1) / float(len(toks[c]) + v))
            )
            for w in vocab
            for c in classes
        }
        prior = {c: unats(math.log(2 / 4)) for c in classes}
        for doc_id, _, text in rows:
            ws = text.split()
            best = max(
                ((sum(wt[(w, c)] for w in ws) + prior[c], -i, c)
                 for i, c in enumerate(classes)),
            )
            assert got[doc_id] == (best[2], best[0])

    def test_empty_doc_falls_back_to_max_prior(self, spark):
        rows = [
            (1, "en", "cat dog"),
            (2, "en", "dog bird"),
            (3, "fr", "chat chien"),
        ]
        _, out = self._train_score(
            spark, rows, score_rows=[(9, "fr", "")]
        )
        r = out.collect()[0]
        assert r["predicted"] == "en"  # majority-prior class
        assert not r["correct"]

    def test_one_pass_training_no_epoch_loop(self, spark):
        # train is a counting pass: the weights frame plan contains no
        # iterative localCheckpoint scans (contrast: perceptron epochs)
        from stock_indicators_etl_spark.llmdata.classifier import nb_train

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        _, _, weights = nb_train(docs)
        plan = weights._jdf.queryExecution().executedPlan().toString()
        assert "Checkpoint" not in plan


class TestStreamingNaiveBayes:
    def test_cross_micro_batch_batch_parity(self, spark, tmp_path):
        """Union of per-micro-batch predictions over a 3-shard stream
        == the batch nb_score on all docs at once (21st streaming
        twin; maxFilesPerTrigger=1 pins >=3 micro-batches)."""
        from stock_indicators_etl_spark.llmdata.classifier import (
            nb_score,
            nb_train,
        )
        from stock_indicators_etl_spark.streaming.nb_stream import (
            streaming_nb_classify,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "lang", "text")
        pdf = docs.toPandas()
        src = tmp_path / "docs"
        src.mkdir()
        for i in range(3):
            shard = pdf[pdf.doc_id % 3 == i]
            spark.createDataFrame(shard).coalesce(1).write.parquet(
                str(src / f"shard_{i}"), mode="overwrite"
            )
        classes, priors, weights = nb_train(docs)
        priors = priors.persist()
        weights = weights.persist()
        try:
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true")
                .parquet(str(src))
            )
            results = str(tmp_path / "preds")
            q = streaming_nb_classify(
                classes,
                priors,
                weights,
                stream,
                results_path=results,
                checkpoint_path=str(tmp_path / "ckpt_nb"),
            )
            q.awaitTermination(180)
            assert q.lastProgress is not None and q.lastProgress["batchId"] >= 2

            key = ["doc_id", "actual", "predicted", "score", "correct"]
            got = sorted(
                tuple(r[k] for k in key)
                for r in spark.read.parquet(results).collect()
            )
            want = sorted(
                tuple(r[k] for k in key)
                for r in nb_score(docs, classes, priors, weights).collect()
            )
            assert len(got) == len(pdf)
            assert got == want
        finally:
            priors.unpersist()
            weights.unpersist()


class TestBlocklistOnStream:
    def test_pure_scan_runs_unchanged_on_readstream(self, spark, tmp_path):
        """blocklist_filter is a zero-Exchange per-row gate, so the
        SAME operator runs on a readStream frame with no watermark —
        the perceptron_score deployment shape."""
        from stock_indicators_etl_spark.llmdata.text import blocklist_filter

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        src = str(tmp_path / "bl_docs")
        docs.write.parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        out = blocklist_filter(stream, ("dup", "slow"))
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("bl_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["doc_id"]: (r["n_hits"], r["keep"])
            for r in spark.sql("select * from bl_stream").collect()
        }
        want = {
            r["doc_id"]: (r["n_hits"], r["keep"])
            for r in blocklist_filter(docs, ("dup", "slow")).collect()
        }
        assert got == want


class TestContainmentJoin:
    def test_excerpt_found_where_jaccard_misses(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import (
            containment_pairs,
            ngram_jaccard_pairs,
        )

        long = " ".join(f"w{i}" for i in range(100))
        excerpt = " ".join(f"w{i}" for i in range(40, 52))
        docs = _docs(spark, [(1, long), (2, excerpt)])
        c = containment_pairs(docs, threshold=0.9).collect()
        assert len(c) == 1
        r = c[0]
        assert (r["doc_a"], r["doc_b"]) == (1, 2)
        assert r["containment"] == 1.0  # every excerpt shingle is in the long doc
        # the same pair's Jaccard is tiny — below any sane dedup threshold
        j = ngram_jaccard_pairs(docs, threshold=0.3).collect()
        assert j == []

    def test_disjoint_docs_emit_nothing(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import containment_pairs

        docs = _docs(spark, [(1, "a b c d e f"), (2, "x y z p q r")])
        assert containment_pairs(docs).collect() == []

    def test_denominator_is_smaller_side(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import containment_pairs

        # doc 2 shares half its shingles with doc 1
        docs = _docs(
            spark,
            [
                (1, "a b c d e f g h i j"),
                (2, "e f g h i j k l m n o p q r s t u v"),
            ],
        )
        r = containment_pairs(docs).collect()[0]
        assert r["n_a"] == 8 and r["n_b"] == 16
        assert abs(r["containment"] - r["n_inter"] / 8) < 1e-12

    def test_doc_freq_cap_drops_hot_shingles(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import containment_pairs

        hot = "x y z"
        docs = _docs(
            spark,
            [(i, hot + f" tail{i} a{i} b{i}") for i in range(10)],
        )
        # uncapped: the shared "x y z" shingle links all 45 pairs
        assert len(containment_pairs(docs).collect()) == 45
        # cap 4 < 10 docs sharing the hot shingle: no pairs survive
        assert containment_pairs(docs, max_doc_freq=4).collect() == []


class TestAucByKey:
    def _auc(self, spark, rows):
        from stock_indicators_etl_spark.operators.stats import auc_by_key

        df = spark.createDataFrame(rows, "label boolean, score double")
        return auc_by_key(df, "label", "score").toPandas().iloc[0]

    def test_perfect_separation(self, spark):
        rows = [(True, float(10 + i)) for i in range(5)] + [
            (False, float(i)) for i in range(5)
        ]
        r = self._auc(spark, rows)
        assert r.auc == 1.0 and r.n_pos == 5 and r.n_neg == 5

    def test_reversed_ranking_zero(self, spark):
        rows = [(False, float(10 + i)) for i in range(5)] + [
            (True, float(i)) for i in range(5)
        ]
        assert self._auc(spark, rows).auc == 0.0

    def test_all_tied_half(self, spark):
        rows = [(True, 7.0)] * 4 + [(False, 7.0)] * 6
        assert self._auc(spark, rows).auc == 0.5

    def test_python_replica_with_ties(self, spark):
        rows = [
            (((i * 7) % 3) == 0, float((i * 13) % 5)) for i in range(60)
        ]
        r = self._auc(spark, rows)
        pos = sorted(s for l, s in rows if l)
        neg = sorted(s for l, s in rows if not l)
        wins = sum(1 for p in pos for n in neg if p > n)
        ties = sum(1 for p in pos for n in neg if p == n)
        expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
        assert abs(r.auc - expect) < 1e-12
        assert r.n_pos == len(pos) and r.n_neg == len(neg)

    def test_single_class_key_null(self, spark):
        from stock_indicators_etl_spark.operators.stats import auc_by_key

        df = spark.createDataFrame(
            [("k1", True, 1.0), ("k1", False, 2.0), ("k2", True, 3.0)],
            "key string, label boolean, score double",
        )
        out = {
            r["key"]: r["auc"]
            for r in auc_by_key(df, "label", "score", ("key",)).collect()
        }
        assert out["k2"] is None and out["k1"] == 0.0

    def test_score_scale_quantization(self, spark):
        from stock_indicators_etl_spark.operators.stats import auc_by_key

        # at scale=1, 0.4 and 0.6 both round to nearest int (0 and 1);
        # at scale=10 they stay distinct
        df = spark.createDataFrame(
            [(True, 0.6), (False, 0.4)], "label boolean, score double"
        )
        coarse = auc_by_key(df, "label", "score", score_scale=1).collect()[0]
        fine = auc_by_key(df, "label", "score", score_scale=10).collect()[0]
        assert coarse["n_values"] == 2 and fine["auc"] == 1.0


class TestCalibration:
    def test_known_buckets(self, spark):
        from stock_indicators_etl_spark.operators.stats import calibration_by_key

        # scores 0..9, positives exactly at 5..9 → low bins rate 0, high 1e6
        rows = [(i >= 5, float(i)) for i in range(10)]
        df = spark.createDataFrame(rows, "label boolean, score double")
        out = {
            r["bin"]: r
            for r in calibration_by_key(df, "label", "score", n_bins=2).collect()
        }
        assert out[0]["n"] == 5 and out[0]["pos_rate_ppm"] == 0
        assert out[1]["n"] == 5 and out[1]["pos_rate_ppm"] == 1_000_000
        assert out[0]["score_lo"] == 0 and out[1]["score_hi"] == 10

    def test_integer_only_schema(self, spark):
        from stock_indicators_etl_spark.operators.stats import calibration_by_key

        df = spark.createDataFrame(
            [(True, 1.0), (False, 2.0), (True, 3.0)],
            "label boolean, score double",
        )
        out = calibration_by_key(df, "label", "score", n_bins=3)
        assert all(f.dataType.typeName() == "long" for f in out.schema.fields)

    def test_negative_scores_bounds_exact(self, spark):
        from stock_indicators_etl_spark.operators.stats import calibration_by_key

        df = spark.createDataFrame(
            [(False, -10.0), (True, -1.0)], "label boolean, score double"
        )
        rows = calibration_by_key(df, "label", "score", n_bins=2).collect()
        los = sorted(r["score_lo"] for r in rows)
        assert los[0] == -10
        # bucket edges partition [-10, 0): lo + hi chain is contiguous
        m = {r["bin"]: r for r in rows}
        assert m[0]["score_hi"] == m[1]["score_lo"]

    def test_monotone_rate_for_separable(self, spark):
        from stock_indicators_etl_spark.operators.stats import calibration_by_key

        rows = [(i % 10 < i // 10, float(i)) for i in range(100)]
        df = spark.createDataFrame(rows, "label boolean, score double")
        out = sorted(
            calibration_by_key(df, "label", "score", n_bins=5).collect(),
            key=lambda r: r["bin"],
        )
        rates = [r["pos_rate_ppm"] for r in out]
        assert rates == sorted(rates)


class TestSkewReport:
    def _report(self, spark, counts, top_n=3):
        from stock_indicators_etl_spark.operators.dq import skew_report

        rows = [(f"k{i}",) for i, c in enumerate(counts) for _ in range(c)]
        df = spark.createDataFrame(rows, "key string")
        out = skew_report(df, ("key",), top_n=top_n).collect()
        summary = [r for r in out if r["kind"] == "summary"][0]
        top = sorted(
            (r for r in out if r["kind"] == "top"), key=lambda r: r["rank"]
        )
        return top, summary

    def test_uniform_keys_gini_zero(self, spark):
        top, s = self._report(spark, [4, 4, 4, 4])
        assert s["gini_ppm"] == 0
        assert s["n_keys"] == 4 and s["n_rows"] == 16
        assert s["max_over_mean_ppm"] == 1_000_000
        assert top[0]["share_ppm"] == 250_000

    def test_hot_key_dominates(self, spark):
        top, s = self._report(spark, [97, 1, 1, 1])
        assert top[0]["key"] == "k0" and top[0]["n_rows"] == 97
        assert top[0]["share_ppm"] == 970_000
        assert s["max_over_mean_ppm"] == 3_880_000  # 97/(100/4)
        # python replica of the exact Gini
        xs = sorted([97, 1, 1, 1])
        k, n = len(xs), sum(xs)
        gnum = sum((2 * (i + 1) - k - 1) * x for i, x in enumerate(xs))
        import math

        assert s["gini_ppm"] == math.floor(gnum * 1e6 / (k * n))

    def test_top_n_bounded_and_ranked(self, spark):
        top, s = self._report(spark, [5, 4, 3, 2, 1], top_n=2)
        assert len(top) == 2
        assert [r["key"] for r in top] == ["k0", "k1"]


def test_drift_monitoring_example(spark):
    """examples/drift_monitoring.py end-to-end on sf0.001: the three
    drift statistics join onto one row per event type, the KS alarm
    column evaluates, and the skew pre-flight carries its summary."""
    import sys

    sys.path.insert(0, "examples")
    from drift_monitoring import drift_report

    drift, skew = drift_report(spark, "/root/testdata/sf0.001")
    rows = drift.collect()
    assert len(rows) == 5  # one per event type
    for r in rows:
        assert 0.0 <= r["tvd"] <= 1.0
        assert r["kl"] >= 0.0
        assert 0.0 <= r["ks"] <= 1.0
        assert r["ks_alarm"] in (True, False)
    summary = [r for r in skew.collect() if r["kind"] == "summary"]
    assert summary and summary[0]["gini_ppm"] >= 0


class TestWelchDrift:
    def _welch(self, spark, a_vals, b_vals):
        from stock_indicators_etl_spark.operators.stats import welch_drift

        a = spark.createDataFrame([("k", v) for v in a_vals], "key string, value double")
        b = spark.createDataFrame([("k", v) for v in b_vals], "key string, value double")
        return welch_drift(a, b, ("key",), "value").toPandas().iloc[0]

    def test_identical_samples_t_zero(self, spark):
        vals = [1.0, 2.0, 3.0, 4.0]
        r = self._welch(spark, vals, vals)
        assert r.t_stat == 0.0 and r.mean_shift_cents == 0.0

    def test_python_replica(self, spark):
        a = [1.0, 2.0, 3.0, 4.0, 5.0]
        b = [3.5, 4.5, 5.5, 8.0]
        r = self._welch(spark, a, b)
        ca = [round(v * 100) for v in a]
        cb = [round(v * 100) for v in b]
        na, nb = float(len(ca)), float(len(cb))
        ma, mb = sum(ca) / na, sum(cb) / nb
        va = (na * sum(c * c for c in ca) - sum(ca) ** 2) / (na * (na - 1))
        vb = (nb * sum(c * c for c in cb) - sum(cb) ** 2) / (nb * (nb - 1))
        se2 = va / na + vb / nb
        t = (ma - mb) / math.sqrt(se2)
        assert abs(r.t_stat - t) < 2e-6  # 6dp quantization
        assert abs(r.mean_shift_cents - (ma - mb)) < 2e-6

    def test_degenerate_null(self, spark):
        r = self._welch(spark, [1.0], [2.0, 3.0])
        assert r.t_stat is None or (r.t_stat != r.t_stat)  # NULL/NaN
        r2 = self._welch(spark, [5.0, 5.0], [5.0, 5.0])
        assert r2.t_stat is None or (r2.t_stat != r2.t_stat)

    def test_obvious_shift_large_t(self, spark):
        a = [float(i % 3) for i in range(60)]
        b = [10.0 + float(i % 3) for i in range(60)]
        r = self._welch(spark, a, b)
        assert r.t_stat < -50  # mean moved ~10 units vs tiny noise


class TestMutualInfo:
    def _mi(self, spark, pairs):
        from stock_indicators_etl_spark.operators.stats import mutual_info

        df = spark.createDataFrame(pairs, "x string, y string")
        return mutual_info(df, "x", "y").toPandas().iloc[0]

    def test_independent_zero(self, spark):
        pairs = [(f"x{i % 2}", f"y{j % 3}") for i in range(2) for j in range(3)]
        r = self._mi(spark, pairs * 5)
        assert r.mi_unats == 0

    def test_deterministic_map_equals_entropy(self, spark):
        # y = f(x), uniform over 4 classes: MI = H(X) = ln 4
        pairs = [(f"x{i}", f"y{i}") for i in range(4)] * 3
        r = self._mi(spark, pairs)
        assert abs(r.mi_unats / 1e6 - math.log(4)) < 1e-5
        assert r.n_x == 4 and r.n_y == 4 and r.n_cells == 4

    def test_python_replica(self, spark):
        pairs = [
            (f"x{(i * 3) % 4}", f"y{(i * 7) % 3}") for i in range(60)
        ] + [("x0", "y0")] * 10
        r = self._mi(spark, pairs)
        from collections import Counter

        cxy = Counter(pairs)
        cx = Counter(x for x, _ in pairs)
        cy = Counter(y for _, y in pairs)
        n = len(pairs)
        mi = sum(
            (c / n) * math.log(c * n / (cx[x] * cy[y]))
            for (x, y), c in cxy.items()
        )
        assert abs(r.mi_unats / 1e6 - mi) < 1e-5


def test_streaming_welch_drift_batch_parity(spark, tmp_path):
    """22nd streaming twin: the freshest streaming Welch emission
    EQUALS the batch welch_drift on (baseline, full prefix) — exact
    equality (same fixed IEEE sequence over the same exact
    integers), two keys, state = three ints per key."""
    import os

    import numpy as np
    import pandas as pd

    from stock_indicators_etl_spark.operators.stats import welch_drift
    from stock_indicators_etl_spark.streaming.welch import (
        streaming_welch_drift,
        welch_baseline,
    )

    rng = np.random.default_rng(17)
    base_rows = pd.DataFrame(
        {
            "event_type": ["x"] * 100 + ["y"] * 80,
            "value": list(rng.uniform(10, 20, 100)) + list(rng.uniform(5, 9, 80)),
        }
    )
    stream_rows = pd.DataFrame(
        {
            "doc_id": range(150),
            "event_type": ["x"] * 70 + ["y"] * 80,
            "value": list(rng.uniform(12, 24, 70))  # x mean shifted up
            + list(rng.uniform(5, 9, 80)),          # y unchanged
        }
    )
    base_df = spark.createDataFrame(base_rows)
    prof = welch_baseline(base_df, "event_type", "value")

    src = tmp_path / "welch_src"
    src.mkdir()
    f0, f1, f2 = (str(src / f"p{i}.parquet") for i in range(3))
    stream_rows.iloc[:50].to_parquet(f0)
    stream_rows.iloc[50:100].to_parquet(f1)
    stream_rows.iloc[100:].to_parquet(f2)
    for i, f in enumerate((f0, f1, f2)):
        os.utime(f, (1_000_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema("doc_id bigint, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_welch_drift(stream, prof, "event_type", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("swelch")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_swelch"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from swelch").toPandas()
    last = {
        k: got[(got.key == k) & (got.n_b == got[got.key == k].n_b.max())].iloc[0]
        for k in ("x", "y")
    }
    batch = {
        r["event_type"]: r
        for r in welch_drift(
            base_df, spark.createDataFrame(stream_rows), ("event_type",), "value"
        ).collect()
    }
    for k in ("x", "y"):
        assert int(last[k].n_b) == batch[k]["n_b"]
        assert float(last[k].t_stat) == batch[k]["t_stat"]
        assert float(last[k].mean_shift_cents) == batch[k]["mean_shift_cents"]
        assert float(last[k].dof) == batch[k]["dof"]
    assert float(last["x"].t_stat) < -3  # the planted x shift alarms
    assert abs(float(last["y"].t_stat)) < 3


class TestEquidepthBins:
    def test_near_equal_depths_no_ties(self, spark):
        from stock_indicators_etl_spark.operators.stats import equidepth_bins

        rows = [("k", float(i)) for i in range(80)]
        df = spark.createDataFrame(rows, "key string, value double")
        out = equidepth_bins(df, ("key",), "value", n_bins=8).collect()
        depths = sorted((r["bin"], r["n"]) for r in out)
        assert [d for _, d in depths] == [10] * 8
        # bins partition the range in order
        assert [b for b, _ in depths] == list(range(8))

    def test_ties_share_a_bin(self, spark):
        from stock_indicators_etl_spark.operators.stats import equidepth_bins

        # one massive tie: every equal value lands in ONE bin
        rows = [("k", 5.0)] * 50 + [("k", float(100 + i)) for i in range(30)]
        df = spark.createDataFrame(rows, "key string, value double")
        out = equidepth_bins(df, ("key",), "value", n_bins=4).collect()
        tie_bins = [r for r in out if r["min_cents"] == 500]
        assert len(tie_bins) == 1 and tie_bins[0]["n"] == 50

    def test_no_sort_in_assignment_plan(self, spark):
        import sys

        sys.path.insert(0, "tests")
        from test_plans import count_nodes, plan_of

        from stock_indicators_etl_spark.operators.stats import equidepth_bins

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        plan = plan_of(equidepth_bins(ev, ("event_type",), "value"))
        # every Sort/Window sits over a HISTOGRAM-BIN frame (one cum
        # branch per cut in exact_quantiles_hist) — bounded by the
        # value range / bin_width, never a corpus-row NTILE sort; the
        # row-sized side of the plan (assignment) is scan + broadcast
        # join + aggregate only
        assert count_nodes(plan, "Sort") <= 7, plan
        assert count_nodes(plan, "Window") <= 7, plan
        assert count_nodes(plan, "SortMergeJoin") == 0, plan


class TestSimhashNeardup:
    def _pairs(self, spark, rows, max_hamming=3):
        from stock_indicators_etl_spark.llmdata.dedup import (
            simhash_fingerprints,
            simhash_neardup,
        )

        fp = simhash_fingerprints(_docs(spark, rows))
        return simhash_neardup(fp, max_hamming=max_hamming).collect()

    def test_identical_docs_pair_at_zero(self, spark):
        t = "alpha beta gamma delta epsilon zeta eta theta"
        out = self._pairs(spark, [(1, t), (2, t), (3, "totally different words here")])
        assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in out] == [(1, 2, 0)]

    def test_pigeonhole_guarantee_exhaustive(self, spark):
        # every pair within hamming <= 3 MUST be emitted (4 bands of 7
        # bits: <=3 flipped bits leave >=1 band intact) — verify against
        # the brute-force all-pairs on real fingerprints
        from stock_indicators_etl_spark.llmdata.dedup import (
            simhash_fingerprints,
            simhash_neardup,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(200)
        fp = simhash_fingerprints(docs).collect()
        want = set()
        for i in range(len(fp)):
            for j in range(i + 1, len(fp)):
                a, b = fp[i], fp[j]
                h = bin(a["simhash"] ^ b["simhash"]).count("1")
                if h <= 3:
                    key = (min(a["doc_id"], b["doc_id"]), max(a["doc_id"], b["doc_id"]))
                    want.add(key)
        got = {
            (r["doc_a"], r["doc_b"])
            for r in simhash_neardup(
                simhash_fingerprints(docs), max_hamming=3
            ).collect()
        }
        assert want <= got or want == got
        assert want == got  # at <=bands-1 the band join is EXACT, both ways

    def test_threshold_respected(self, spark):
        rows = [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "p q r s t u v w")]
        out = self._pairs(spark, rows, max_hamming=0)
        assert all(r["hamming"] == 0 for r in out)

    def test_hot_band_cap_bounds_pairs(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import (
            simhash_fingerprints,
            simhash_neardup,
        )

        # 40 identical docs: every band bucket has 40 members
        rows = [(i, "same words everywhere always") for i in range(40)]
        fp = simhash_fingerprints(_docs(spark, rows))
        assert len(simhash_neardup(fp).collect()) == 40 * 39 // 2
        assert simhash_neardup(fp, max_band_size=10).collect() == []


class TestDupFraction:
    def test_replica_vs_unique(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import dup_fraction

        shared = " ".join(f"s{i}" for i in range(10))
        docs = _docs(
            spark,
            [
                (1, shared),                      # full replica of 2
                (2, shared),
                (3, " ".join(f"u{i}" for i in range(10))),  # unique
            ],
        )
        out = {r["doc_id"]: r for r in dup_fraction(docs, k=4).collect()}
        assert out[1]["dup_frac"] == 1.0 and out[2]["dup_frac"] == 1.0
        assert out[3]["dup_frac"] == 0.0
        assert out[3]["n_grams"] == 7  # 10 words, k=4 → 7 grams

    def test_partial_overlap_fraction(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import dup_fraction

        # doc 1: 8 words; doc 2 shares its first 4-gram only
        docs = _docs(
            spark,
            [
                (1, "a b c d e f g h"),
                (2, "a b c d x y z w"),
            ],
        )
        out = {r["doc_id"]: r for r in dup_fraction(docs, k=4).collect()}
        assert out[1]["n_grams"] == 5 and out[1]["n_dup"] == 1
        assert abs(out[1]["dup_frac"] - 0.2) < 1e-9

    def test_empty_doc_null_fraction(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import dup_fraction

        docs = _docs(spark, [(1, ""), (2, "alpha beta gamma delta")])
        out = {r["doc_id"]: r for r in dup_fraction(docs).collect()}
        assert out[1]["n_grams"] == 0 and out[1]["dup_frac"] is None


def test_zipf_fit_slope_on_synthetic_zipf(spark):
    """zipf_fit recovers the exponent of a planted rank-frequency
    law: counts c_r = floor(3000/r) give ln c ≈ ln 3000 − 1·ln r —
    slope ≈ −1 in micro-nat units (slope is y-unats per x-unat, so
    the ratio is dimensionless)."""
    import sys

    sys.path.insert(0, ".")
    from stock_indicators_etl_spark.queries_llm import q_zipf_fit
    import pandas as pd

    # synthesize docs whose vocab follows Zipf exactly: word w_r
    # appears floor(3000/r) times, r = 1..60
    rows, doc_id = [], 0
    words_stream = []
    for r in range(1, 61):
        words_stream += [f"w{r:03d}"] * (3000 // r)
    # chunk into docs of 200 words
    for i in range(0, len(words_stream), 200):
        rows.append((doc_id, " ".join(words_stream[i : i + 200])))
        doc_id += 1
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            os.path.join(td, "documents.parquet")
        )
        out = q_zipf_fit(spark, td).collect()[0]
    assert out["n"] == 60
    assert -1.05 < out["slope"] < -0.95
    assert out["r"] < -0.99  # near-perfect log-log line


class TestTargetEncodeLoo:
    def test_known_answer_loo(self, spark):
        from stock_indicators_etl_spark.operators.stats import target_encode_loo

        rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)]
        df = spark.createDataFrame(rows, "id long, cat string, y double")
        out = {
            r["id"]: r
            for r in target_encode_loo(df, "cat", "y", smoothing=2).collect()
        }
        gmean = (1000 + 2000 + 3000) / 3  # cents
        # row 1: category sum minus itself = 2000; n-1 = 1
        want1 = (2000 + 2 * gmean) / (1 + 2)
        assert abs(out[1]["te"] - round(want1, 4)) < 1e-6 or abs(
            out[1]["te"] - want1
        ) < 1e-4
        # row 3 is a singleton: pure smoothed prior
        want3 = (0 + 2 * gmean) / (0 + 2)
        assert abs(out[3]["te"] - want3) < 1e-4
        assert out[3]["n_cat"] == 1

    def test_own_label_excluded(self, spark):
        from stock_indicators_etl_spark.operators.stats import target_encode_loo

        # two categories with same composition; bump ONE row's target:
        # its own te must move only via the GLOBAL mean, its
        # category-mate's te moves via the category sum
        base = [(1, "a", 10.0), (2, "a", 10.0), (3, "b", 10.0), (4, "b", 10.0)]
        bumped = [(1, "a", 110.0), (2, "a", 10.0), (3, "b", 10.0), (4, "b", 10.0)]
        s = "id long, cat string, y double"
        te0 = {
            r["id"]: r["te"]
            for r in target_encode_loo(
                spark.createDataFrame(base, s), "cat", "y", smoothing=0
            ).collect()
        }
        te1 = {
            r["id"]: r["te"]
            for r in target_encode_loo(
                spark.createDataFrame(bumped, s), "cat", "y", smoothing=0
            ).collect()
        }
        # smoothing=0: row 1's LOO encoding is exactly its mate's y —
        # unchanged by its OWN bump (the no-leak property)
        assert te1[1] == te0[1] == 1000.0
        # but its mate row 2 sees the bump
        assert te1[2] == 11000.0 and te0[2] == 1000.0

    def test_base_table_not_shuffled(self, spark):
        import sys

        sys.path.insert(0, "tests")
        from test_plans import count_nodes, plan_of

        from stock_indicators_etl_spark.operators.stats import target_encode_loo

        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        plan = plan_of(target_encode_loo(o, "o_custkey", "o_totalprice"))
        # the only exchanges feed the two broadcast aggregates; the
        # encoding itself is scan + broadcast joins
        assert count_nodes(plan, "SortMergeJoin") == 0, plan
        assert count_nodes(plan, "Sort") == 0, plan


class TestTemporalSplit:
    def test_boundary_and_embargo_tags(self, spark):
        from stock_indicators_etl_spark.llmdata.sampling import temporal_split

        rows = [(i, i * 100) for i in range(10)]
        df = spark.createDataFrame(rows, "id long, ns long")
        out = {
            r["id"]: r["split"]
            for r in temporal_split(df, "ns", train_end_ns=500, embargo_ns=200).collect()
        }
        assert out[4] == "train"       # 400 < 500
        assert out[5] == "embargo"     # 500 in [500, 700)
        assert out[6] == "embargo"     # 600
        assert out[7] == "test"        # 700 >= 700
        assert out[0] == "train" and out[9] == "test"

    def test_zero_embargo_two_way(self, spark):
        from stock_indicators_etl_spark.llmdata.sampling import temporal_split

        df = spark.createDataFrame([(1, 10), (2, 20)], "id long, ns long")
        tags = {
            r["split"]
            for r in temporal_split(df, "ns", train_end_ns=15).collect()
        }
        assert tags == {"train", "test"}

    def test_pure_scan(self, spark):
        import sys

        sys.path.insert(0, "tests")
        from test_plans import count_nodes, plan_of

        from stock_indicators_etl_spark.llmdata.sampling import temporal_split

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        plan = plan_of(temporal_split(ev, "event_id", 100, 10))
        assert count_nodes(plan, "Exchange") == 0, plan


class TestColumnProfile:
    def test_counts_and_top_values(self, spark):
        from stock_indicators_etl_spark.operators.dq import column_profile

        rows = [
            ("a", 1), ("a", 1), ("a", 2), ("b", None), ("b", 3), (None, 3)
        ]
        df = spark.createDataFrame(rows, "s string, x int")
        out = column_profile(df, ("s", "x"), top_n=2).collect()
        summ = {r["col"]: r for r in out if r["kind"] == "summary"}
        assert summ["s"]["n_rows"] == 6 and summ["s"]["n_null"] == 1
        assert summ["s"]["n_distinct"] == 2
        assert summ["x"]["n_null"] == 1 and summ["x"]["n_distinct"] == 3
        top_s = sorted(
            ((r["rank"], r["value"], r["n"]) for r in out
             if r["kind"] == "top" and r["col"] == "s")
        )
        assert top_s[0] == (1, "a", 3) and top_s[1] == (2, "b", 2)

    def test_top_n_bound(self, spark):
        from stock_indicators_etl_spark.operators.dq import column_profile

        df = spark.createDataFrame([(i % 7,) for i in range(70)], "v int")
        out = [r for r in column_profile(df, ("v",), top_n=3).collect()
               if r["kind"] == "top"]
        assert len(out) == 3

    def test_quantile_leg_exact(self, spark):
        """Discrete quantiles from the value-count frame: rank target
        t = max(1, ceil(q·n/10⁶)), value = the element whose
        cumulative count covers t. On 1..10 that's min=1, q25=3
        (t=ceil(2.5)=3), median=5, q75=8, max=10; ordering must be
        NUMERIC (strings would put "10" before "2")."""
        from stock_indicators_etl_spark.operators.dq import column_profile

        df = spark.createDataFrame([(i,) for i in range(1, 11)], "v int")
        qs = {
            r["rank"]: r["value"]
            for r in column_profile(df, ("v",), num_cols=("v",)).collect()
            if r["kind"] == "quantile"
        }
        assert qs == {
            0: "1", 250000: "3", 500000: "5", 750000: "8", 1000000: "10"
        }

    def test_quantile_leg_weighted_and_default_off(self, spark):
        """Repeated values weight the rank (counts, not distincts);
        no num_cols → no quantile rows (backward compatible)."""
        from stock_indicators_etl_spark.operators.dq import column_profile

        rows = [(1,)] * 8 + [(100,)] * 2
        df = spark.createDataFrame(rows, "v int")
        out = column_profile(df, ("v",), num_cols=("v",)).collect()
        qs = {r["rank"]: r["value"] for r in out if r["kind"] == "quantile"}
        # t(500000) = 5 ≤ cum(1)=8 → median is 1; t(1000000)=10 → 100
        assert qs[500000] == "1" and qs[1000000] == "100"
        plain = column_profile(df, ("v",)).collect()
        assert not [r for r in plain if r["kind"] == "quantile"]


def test_json_props_parse(spark):
    from stock_indicators_etl_spark.queries import q_json_props
    import json

    out = q_json_props(spark, "/root/testdata/sf0.001").collect()
    assert all(r["n_unparsed"] == 0 for r in out)  # testdata is clean JSON
    # cross-check one type against a driver-side parse
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").collect()
    want = sum(
        json.loads(r["props"])["k"] for r in ev if r["event_type"] == out[0]["event_type"]
    )
    assert out[0]["sum_k"] == want
