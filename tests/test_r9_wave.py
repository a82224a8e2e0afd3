"""DSIR selection / Gopher rule gate / duplicated-span audit
(r9 wave) tests."""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestGopherRules:
    def _one(self, spark, text):
        from stock_indicators_etl_spark.llmdata.text import gopher_rules

        return gopher_rules(_docs(spark, [(1, text)])).toPandas().iloc[0]

    def test_clean_doc_passes(self, spark):
        text = (
            "the quick brown fox jumps over that lazy dog and runs to "
            "the river of gold with great speed " * 6
        )
        r = self._one(spark, text)
        assert bool(r.passes)
        assert r.n_words >= 50
        assert r.n_stopwords >= 2

    def test_short_doc_fails_wordcount_only(self, spark):
        r = self._one(spark, "the cat sat on that mat with all of them")
        assert not bool(r.r_wordcount)
        assert bool(r.r_meanwlen) and bool(r.r_alpha) and bool(r.r_stop)
        assert not bool(r.passes)

    def test_long_words_fail_meanwlen(self, spark):
        r = self._one(spark, "extraordinarily incomprehensible " * 30)
        assert not bool(r.r_meanwlen)

    def test_hash_symbols_fail_symbol_rule(self, spark):
        r = self._one(spark, "alpha # beta # gamma # delta # " * 20)
        assert not bool(r.r_symbol)

    def test_ellipsis_symbol_counted(self, spark):
        # one '...' per 4 words -> ratio 0.25 > 0.1
        r = self._one(spark, "alpha beta... gamma delta " * 20)
        assert not bool(r.r_symbol)

    def test_bullet_lines_fail(self, spark):
        text = "\n".join("- item %d" % i for i in range(20))
        r = self._one(spark, text)
        assert not bool(r.r_bullets)

    def test_ellipsis_lines_fail(self, spark):
        text = "\n".join("line %d..." % i for i in range(10))
        r = self._one(spark, text)
        assert not bool(r.r_ellipsis)

    def test_numeric_words_fail_alpha(self, spark):
        r = self._one(spark, "123 456 789 000 111 " * 20)
        assert not bool(r.r_alpha)
        assert not bool(r.r_stop)

    def test_empty_doc_no_crash(self, spark):
        r = self._one(spark, "")
        assert r.n_words == 0
        assert not bool(r.r_meanwlen)
        assert not bool(r.r_alpha)
        assert not bool(r.passes)

    def test_integer_only_schema(self, spark):
        """The report must contain no float columns at all."""
        from stock_indicators_etl_spark.llmdata.text import gopher_rules

        df = gopher_rules(_docs(spark, [(1, "the cat")]))
        kinds = {f.dataType.simpleString() for f in df.schema.fields}
        assert not any(k in ("double", "float") for k in kinds)


class TestDsir:
    def test_target_like_docs_rank_higher(self, spark):
        from stock_indicators_etl_spark.llmdata.dsir import dsir_weights

        target = _docs(
            spark, [(100 + i, "alpha beta gamma delta " * 5) for i in range(4)]
        )
        raw = _docs(
            spark,
            [(1, "alpha beta gamma delta alpha beta"),
             (2, "zeta eta theta iota kappa mu")],
        )
        w = (
            dsir_weights(raw, target)
            .toPandas()
            .set_index("doc_id")["w_unats"]
        )
        assert w[1] > w[2]

    def test_select_returns_k_and_is_deterministic(self, spark):
        from stock_indicators_etl_spark.llmdata.dsir import dsir_select

        rows = [
            (i, ("alpha beta " if i % 2 else "zeta eta ") * (3 + i % 5))
            for i in range(40)
        ]
        raw = _docs(spark, rows)
        target = _docs(spark, [(999, "alpha beta alpha beta gamma")])
        a = dsir_select(raw, target, k=10).toPandas()
        b = dsir_select(raw, target, k=10).toPandas()
        assert len(a) == 10
        assert list(a.doc_id) == list(b.doc_id)
        assert list(a.key_unats) == list(b.key_unats)
        # keys ordered descending
        assert list(a.key_unats) == sorted(a.key_unats, reverse=True)

    def test_gramless_doc_gets_zero_weight(self, spark):
        from stock_indicators_etl_spark.llmdata.dsir import dsir_weights

        raw = _docs(spark, [(1, "alpha beta"), (2, "")])
        target = _docs(spark, [(9, "alpha")])
        w = dsir_weights(raw, target).toPandas().set_index("doc_id")
        assert w.loc[2, "n_grams"] == 0
        assert w.loc[2, "w_unats"] == 0

    def test_weights_are_integers(self, spark):
        from stock_indicators_etl_spark.llmdata.dsir import dsir_select

        raw = _docs(spark, [(1, "alpha beta gamma"), (2, "delta eta")])
        target = _docs(spark, [(9, "alpha beta")])
        df = dsir_select(raw, target, k=2)
        kinds = {f.dataType.simpleString() for f in df.schema.fields}
        assert not any(k in ("double", "float") for k in kinds)


class TestDupSpanAudit:
    def test_shared_phrase_reported_in_all_copies(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import dup_span_audit

        phrase = "one two three four five six seven eight nine ten"
        rows = [
            (1, "intro words here %s tail words" % phrase),
            (2, "%s completely different ending text" % phrase),
            (3, "unrelated content with no repeats at all whatsoever"),
        ]
        got = (
            dup_span_audit(_docs(spark, rows), k=4, min_words=8)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert set(got.doc_id) == {1, 2}
        d1 = got[got.doc_id == 1].iloc[0]
        # doc 1: phrase occupies word offsets 3..12 (end-exclusive 13)
        assert d1.span_start == 3 and d1.span_end == 13 and d1.span_words == 10
        d2 = got[got.doc_id == 2].iloc[0]
        assert d2.span_start == 0 and d2.span_end == 10 and d2.span_words == 10

    def test_min_words_filters_short_repeats(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import dup_span_audit

        phrase = "aa bb cc dd ee"  # 5-word repeat
        rows = [(1, phrase + " xx yy zz"), (2, phrase + " pp qq rr")]
        short = dup_span_audit(_docs(spark, rows), k=4, min_words=8).toPandas()
        assert len(short) == 0
        loose = dup_span_audit(_docs(spark, rows), k=4, min_words=5).toPandas()
        assert set(loose.span_words) == {5}

    def test_two_separate_islands(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import dup_span_audit

        p1 = "aa bb cc dd ee ff gg hh"
        p2 = "qq rr ss tt uu vv ww xx"
        rows = [
            (1, "%s gap1x gap2x gap3x gap4x %s" % (p1, p2)),
            (2, "%s other words entirely here %s" % (p1, p2)),
        ]
        got = dup_span_audit(_docs(spark, rows), k=4, min_words=8).toPandas()
        # two islands per doc
        assert len(got) == 4
        assert set(got.span_words) == {8}

    def test_no_duplicates_no_rows(self, spark):
        from stock_indicators_etl_spark.llmdata.dedup import dup_span_audit

        rows = [(1, "purely unique words in this document body")]
        got = dup_span_audit(_docs(spark, rows), k=4, min_words=8).toPandas()
        assert len(got) == 0


class TestStreamingDsir:
    def test_cross_micro_batch_batch_parity(self, spark, tmp_path):
        """Union of per-micro-batch scores over a 3-shard stream ==
        the batch dsir_weights on all docs at once (20th streaming
        twin; maxFilesPerTrigger=1 pins >=3 micro-batches)."""
        from pyspark.sql import functions as F

        from stock_indicators_etl_spark.llmdata.dsir import (
            dsir_model,
            dsir_weights,
        )
        from stock_indicators_etl_spark.streaming.dsir_stream import (
            streaming_dsir_score,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text", "lang")
        pdf = docs.toPandas()
        src = tmp_path / "docs"
        src.mkdir()
        for i in range(3):
            shard = pdf[pdf.doc_id % 3 == i]
            spark.createDataFrame(shard).coalesce(1).write.parquet(
                str(src / f"shard_{i}"), mode="overwrite"
            )
        model = dsir_model(
            docs, docs.filter(F.col("lang") == "en")
        ).persist()
        try:
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true")
                .parquet(str(src))
            )
            results = str(tmp_path / "scores")
            q = streaming_dsir_score(
                model,
                stream,
                results_path=results,
                checkpoint_path=str(tmp_path / "ckpt_dsir"),
            )
            q.awaitTermination(180)
            assert q.lastProgress is not None and q.lastProgress["batchId"] >= 2

            got = sorted(
                (r["doc_id"], r["n_grams"], r["w_unats"])
                for r in spark.read.parquet(results).collect()
            )
            want = sorted(
                (r["doc_id"], r["n_grams"], r["w_unats"])
                for r in dsir_weights(
                    docs, docs.filter(F.col("lang") == "en")
                ).collect()
            )
            assert len(got) == len(pdf)
            assert got == want
        finally:
            model.unpersist()


class TestCountMin:
    def test_never_underestimates_and_exact_when_sparse(self, spark):
        from pyspark.sql import functions as F

        from stock_indicators_etl_spark.llmdata.sketches import (
            cms_estimate,
            cms_sketch,
        )

        rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1
        toks = spark.createDataFrame(rows, "word string")
        sk = cms_sketch(toks, "word")
        probes = spark.createDataFrame(
            [("a",), ("b",), ("c",), ("zz",)], "word string"
        )
        est = (
            cms_estimate(sk, probes, "word")
            .toPandas()
            .set_index("word")["est"]
        )
        # 3 distinct keys in a 4x256 table: collisions impossible to
        # matter at depth 4 -> estimates are exact; absent key is the
        # min over its cells, which may alias but never under-counts
        assert est["a"] == 7 and est["b"] == 3 and est["c"] == 1
        assert est["zz"] >= 0

    def test_overestimate_bound_under_collisions(self, spark):
        from stock_indicators_etl_spark.llmdata.sketches import (
            cms_estimate,
            cms_sketch,
        )

        # 2000 distinct keys into a tiny 2x16 table: heavy aliasing,
        # but est >= exact must hold for EVERY probed key
        rows = [(f"k{i}",) for i in range(2000)]
        toks = spark.createDataFrame(rows, "word string")
        sk = cms_sketch(toks, "word", d=2, w=16)
        probes = spark.createDataFrame(rows[:50], "word string")
        est = cms_estimate(sk, probes, "word", d=2, w=16).toPandas()
        assert (est["est"] >= 1).all()

    def test_sketch_is_mergeable(self, spark):
        """CM tables merge by cellwise sum: sketch(A ++ B) ==
        sum-merge of sketch(A) and sketch(B) — the property that
        makes the summary shard-parallel at any scale."""
        from pyspark.sql import functions as F

        from stock_indicators_etl_spark.llmdata.sketches import cms_sketch

        a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, "word string")
        b = spark.createDataFrame([("x",)] * 1 + [("z",)] * 4, "word string")
        whole = cms_sketch(a.union(b), "word").toPandas()
        merged = (
            cms_sketch(a, "word")
            .union(cms_sketch(b, "word"))
            .groupBy("r", "b")
            .agg(F.sum("c").alias("c"))
            .toPandas()
        )
        key = lambda df: sorted(map(tuple, df[["r", "b", "c"]].values))
        assert key(whole) == key(merged)

    def test_weighted_build(self, spark):
        from stock_indicators_etl_spark.llmdata.sketches import (
            cms_estimate,
            cms_sketch,
        )

        toks = spark.createDataFrame(
            [("a", 10), ("a", 5), ("b", 2)], "word string, n long"
        )
        sk = cms_sketch(toks, "word", weight_col="n")
        probes = spark.createDataFrame([("a",), ("b",)], "word string")
        est = (
            cms_estimate(sk, probes, "word")
            .toPandas()
            .set_index("word")["est"]
        )
        assert est["a"] == 15 and est["b"] == 2


class TestDataSelectionExample:
    def test_funnel_and_selection_consistency(self, spark):
        """examples/data_selection.py end-to-end on sf0.001: the
        funnel is monotone per source (docs >= gated >= deduped-kept
        >= selected), the selection is exactly k (or every eligible
        doc), deterministic across runs, and selected docs all passed
        the gate and survived dedup."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path("examples").resolve()))
        from data_selection import select_training_data

        sel1, rep1 = select_training_data(
            spark, "/root/testdata/sf0.001", k=20
        )
        s1 = sel1.toPandas().sort_values("doc_id").reset_index(drop=True)
        r1 = rep1.toPandas()
        assert ((r1.n_docs >= r1.n_gated)
                & (r1.n_gated >= r1.n_deduped)
                & (r1.n_deduped >= r1.n_selected)).all()
        assert r1.n_selected.sum() == min(20, int(r1.n_deduped.sum()))
        assert len(s1) == r1.n_selected.sum()
        sel2, _ = select_training_data(spark, "/root/testdata/sf0.001", k=20)
        s2 = sel2.toPandas().sort_values("doc_id").reset_index(drop=True)
        assert list(s1.doc_id) == list(s2.doc_id)
        assert list(s1.key_unats) == list(s2.key_unats)


class TestPhashNeardup:
    def _hashes(self, spark, rows):
        from stock_indicators_etl_spark.llmdata.multimodal import (
            doc_image_dhash,
        )

        return doc_image_dhash(_docs(spark, rows)).toPandas().set_index(
            "doc_id"
        )

    def test_identical_docs_hash_equal_and_pair_at_zero(self, spark):
        from stock_indicators_etl_spark.llmdata.multimodal import (
            dhash_neardup,
            doc_image_dhash,
        )

        text = "the quick brown fox jumps over the lazy dog " * 4
        h = doc_image_dhash(_docs(spark, [(1, text), (2, text)]))
        pdf = h.toPandas().set_index("doc_id")
        assert pdf.loc[1, "dhash_hex"] == pdf.loc[2, "dhash_hex"]
        pairs = dhash_neardup(h).toPandas()
        assert len(pairs) == 1
        assert pairs.iloc[0].hamming == 0

    def test_small_edit_small_distance_large_edit_no_pair(self, spark):
        from stock_indicators_etl_spark.llmdata.multimodal import (
            dhash_neardup,
            doc_image_dhash,
        )

        base = "alpha beta gamma delta epsilon zeta eta theta " * 3
        rows = [
            (1, base),
            (2, base + " tailmarker"),          # near-dup: one word
            (3, "completely different words entirely unrelated corpus "
                "content with nothing shared at all " * 2),
        ]
        h = doc_image_dhash(_docs(spark, rows))
        pairs = dhash_neardup(h).toPandas()
        got = {(a, b): d for a, b, d in pairs.itertuples(index=False)}
        # one appended word touches one cell -> at most 2 bits
        assert (1, 2) in got and got[(1, 2)] <= 2
        assert (1, 3) not in got and (2, 3) not in got

    def test_hash_is_deterministic(self, spark):
        rows = [(7, "some words for hashing determinism checks here")]
        a = self._hashes(spark, rows)
        b = self._hashes(spark, rows)
        assert a.loc[7, "dhash_hex"] == b.loc[7, "dhash_hex"]

    def test_empty_doc_hashes_without_crash(self, spark):
        h = self._hashes(spark, [(1, "")])
        assert len(h.loc[1, "dhash_hex"]) == 16


class TestTemperatureMix:
    def _mk(self, spark, sizes):
        rows = []
        i = 0
        for src, n in sizes.items():
            for _ in range(n):
                rows.append((i, "text %d" % i, src))
                i += 1
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )

    def test_tail_domain_overrepresented_vs_proportional(self, spark):
        """sqrt temperature lifts the tail: the small domain's output
        share must exceed its corpus share."""
        from pyspark.sql import functions as F

        from stock_indicators_etl_spark.llmdata.sampling import (
            temperature_mix,
        )

        df = self._mk(spark, {"head": 900, "tail": 100})
        out = (
            temperature_mix(df, 200)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .toPandas()
            .set_index("source")["n"]
        )
        total = out.sum()
        assert out.get("tail", 0) / total > 100 / 1000
        # sqrt weights: tail share should approach sqrt(100)/(sqrt(900)
        # + sqrt(100)) = 0.25; allow hash-rounding slack
        assert 0.15 < out.get("tail", 0) / total < 0.40

    def test_deterministic_and_availability_capped(self, spark):
        from stock_indicators_etl_spark.llmdata.sampling import (
            temperature_mix,
        )

        df = self._mk(spark, {"a": 30, "b": 4})
        o1 = sorted(r.doc_id for r in temperature_mix(df, 500).collect())
        o2 = sorted(r.doc_id for r in temperature_mix(df, 500).collect())
        assert o1 == o2
        # quota above availability: every row survives (cap at n_s)
        assert len(o1) == 34
