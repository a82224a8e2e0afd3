"""pit_join / dedup_eval / balanced_sample (r7e wave) tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestPitJoin:
    def test_asof_version_selection(self, spark):
        """SCD2 + as-of composition: each fact gets the version in
        effect at its timestamp; facts before the first version get
        NULL (the leakage-safe contract: never a future version)."""
        from stock_indicators_etl_spark.operators.asof import asof_join
        from stock_indicators_etl_spark.operators.scd import scd2_history

        changes = spark.createDataFrame(
            [(1, "A", 10), (1, "A", 15), (1, "B", 20), (1, "C", 30)],
            "k long, attr string, ts long",
        )
        hist = scd2_history(changes, "k", "attr", "ts")
        dim = hist.select(
            "k",
            hist.valid_from.alias("d"),
            hist.attr.alias("attr_asof"),
            "version",
        )
        facts = spark.createDataFrame(
            [(1, 5), (1, 10), (1, 19), (1, 20), (1, 99)], "k long, d long"
        )
        out = (
            asof_join(facts, dim, on="d", by=("k",), value_cols=["attr_asof"])
            .toPandas()
            .sort_values("d")
            .reset_index(drop=True)
        )
        # t=5: before first version -> NULL; t=10/19 -> A; t=20 -> B; t=99 -> C
        assert pd.isna(out.attr_asof_r.iloc[0])
        assert list(out.attr_asof_r.iloc[1:]) == ["A", "A", "B", "C"]

    def test_query_partitions_all_lines(self, spark):
        """The aggregate must cover every lineitem row exactly once."""
        from stock_indicators_etl_spark.queries import q_pit_join

        out = q_pit_join(spark, "/root/testdata/sf0.001").toPandas()
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        assert out.n_lines.sum() == li.count()
        # changed-priority counts are a subset of each group
        assert (out.n_shipped_under_changed_priority <= out.n_lines).all()


class TestBalancedSample:
    def test_equal_class_counts_at_min(self, spark):
        from stock_indicators_etl_spark.llmdata.sampling import balanced_sample

        rows = []
        sizes = {0: 20, 1: 7, 2: 13}
        i = 0
        for lbl, n in sizes.items():
            for _ in range(n):
                rows.append((i, lbl))
                i += 1
        df = spark.createDataFrame(rows, "doc_id long, label long")
        out = balanced_sample(df, label_col="label", id_col="doc_id").toPandas()
        counts = out.groupby("label").size()
        assert set(counts.index) == {0, 1, 2}
        assert (counts == 7).all()

    def test_deterministic_and_subset_of_stratified(self, spark):
        from stock_indicators_etl_spark.llmdata.sampling import (
            balanced_sample,
            stratified_sample,
        )

        rows = [(i, i % 3) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, label long")
        a = balanced_sample(df, "label", "doc_id").toPandas()
        b = balanced_sample(df, "label", "doc_id").toPandas()
        key = lambda d: sorted(map(tuple, d[["doc_id", "label"]].values))
        assert key(a) == key(b)
        # explicit per_class delegates to stratified_sample
        c = balanced_sample(df, "label", "doc_id", per_class=5).toPandas()
        d = stratified_sample(df, "label", 5, "doc_id").toPandas()
        assert key(c) == key(d)


class TestDedupEval:
    def test_confusion_counts_consistent(self, spark):
        """tp+fn = |truth|, tp+fp = |pred| — and on this corpus the
        LSH banding should recover most true pairs (recall sanity)."""
        from stock_indicators_etl_spark.llmdata.dedup import (
            minhash_lsh_candidates,
            ngram_jaccard_pairs,
        )
        from stock_indicators_etl_spark.queries_llm import (
            DEDUP_EVAL_T,
            _docs,
            q_dedup_eval,
        )

        sf = "/root/testdata/sf0.001"
        out = q_dedup_eval(spark, sf).toPandas().iloc[0]
        docs = _docs(spark, sf)
        n_truth = ngram_jaccard_pairs(docs, threshold=DEDUP_EVAL_T).count()
        n_pred = minhash_lsh_candidates(docs).count()
        assert out.tp + out.fn == n_truth
        assert out.tp + out.fp == n_pred
        if n_truth:
            assert out.recall == pytest.approx(out.tp / n_truth, abs=1e-6)
