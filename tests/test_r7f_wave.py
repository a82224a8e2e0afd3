"""agg_delta_apply / contrastive pairs / streaming temporal join
(r7f wave) tests."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest


class TestAggDeltaApply:
    def test_incremental_equals_recompute(self, spark):
        """Maintained aggregate == recomputation for a changelog that
        inserts new rows and retracts existing ones."""
        from pyspark.sql import functions as F

        from stock_indicators_etl_spark.operators.scd import agg_delta_apply

        rng = np.random.default_rng(31)
        base_rows = [(int(k), int(rng.integers(1, 100))) for k in range(8) for _ in range(5)]
        base_df = spark.createDataFrame(base_rows, "k long, cents long")
        snap = base_df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents")
        )
        # retract two rows of key 0, all five rows of key 1 (drops out),
        # insert rows for key 7 and a brand-new key 99
        k0 = [r for r in base_rows if r[0] == 0][:2]
        k1 = [r for r in base_rows if r[0] == 1]
        log_rows = (
            [(k, "D", c) for k, c in k0 + k1]
            + [(7, "I", 11), (99, "I", 5), (99, "I", 6)]
        )
        log = spark.createDataFrame(log_rows, "k long, op string, cents long")
        got = (
            agg_delta_apply(snap, log, key_col="k")
            .toPandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        # recompute from scratch
        survivors = base_rows.copy()
        for k, c in k0 + k1:
            survivors.remove((k, c))
        survivors += [(7, 11), (99, 5), (99, 6)]
        want = (
            pd.DataFrame(survivors, columns=["k", "cents"])
            .groupby("k")
            .agg(n=("cents", "size"), cents=("cents", "sum"))
            .reset_index()
        )
        assert list(got.k) == list(want.k)
        assert list(got.n) == list(want.n)
        assert list(got.cents) == list(want.cents)
        assert 1 not in set(got.k)  # fully-retracted key dropped

    def test_untouched_keys_pass_through(self, spark):
        from pyspark.sql import functions as F

        from stock_indicators_etl_spark.operators.scd import agg_delta_apply

        snap = spark.createDataFrame([(1, 3, 300), (2, 2, 200)], "k long, n long, cents long")
        log = spark.createDataFrame([(1, "I", 50)], "k long, op string, cents long")
        got = agg_delta_apply(snap, log, "k").toPandas().set_index("k")
        assert got.loc[2, "n"] == 2 and got.loc[2, "cents"] == 200
        assert got.loc[1, "n"] == 4 and got.loc[1, "cents"] == 350


class TestContrastivePairs:
    def test_structure_and_determinism(self, spark):
        from stock_indicators_etl_spark.queries_llm import (
            CONTRAST_NEG_K,
            q_contrastive_pairs,
        )

        sf = "/root/testdata/sf0.001"
        a = q_contrastive_pairs(spark, sf).toPandas()
        b = q_contrastive_pairs(spark, sf).toPandas()
        key = lambda d: sorted(
            map(tuple, d[["anchor", "role", "slot", "other"]].astype(object).values)
        )
        assert key(a) == key(b)  # fully deterministic
        pos = a[a.role == "pos"]
        neg = a[a.role == "neg"]
        # exactly one positive per anchor; ≤ K negatives; no self-pairs
        assert pos.anchor.is_unique
        assert (neg.groupby("anchor").size() <= CONTRAST_NEG_K).all()
        assert (a.anchor != a.other).all()
        assert pos.jaccard.notna().all() and neg.jaccard.isna().all()
        # negatives are never the anchor's positive partner
        pos_pairs = set(zip(pos.anchor, pos.other))
        assert not (set(zip(neg.anchor, neg.other)) & pos_pairs)


class TestStreamingTemporalJoin:
    def test_matches_batch_asof_across_batches(self, spark, tmp_path):
        """Facts enriched by the streaming twin equal the batch
        scd2+asof composition on the ordered prefix — across a
        micro-batch seam that splits a version's dim row from its
        facts."""
        from stock_indicators_etl_spark.operators.asof import asof_join
        from stock_indicators_etl_spark.operators.scd import scd2_history
        from stock_indicators_etl_spark.streaming.temporal import (
            streaming_temporal_join,
        )

        rows = [
            # key 1: dim A@10, facts 12/15; dim B@20 (batch 2), fact 25
            (1, 10, "dim", "A", 0),
            (1, 12, "fact", None, 7),
            (1, 15, "fact", None, 8),
            (1, 20, "dim", "B", 0),
            (1, 25, "fact", None, 9),
            # key 2: fact BEFORE any dim -> NULL attr, version 0
            (2, 5, "fact", None, 1),
            (2, 8, "dim", "X", 0),
            (2, 8, "fact", None, 2),  # same-ts fact sees the dim (inclusive)
            # repeated same-attr dim must not bump version
            (2, 9, "dim", "X", 0),
            (2, 11, "fact", None, 3),
        ]
        pdf = pd.DataFrame(rows, columns=["key", "ts", "kind", "attr", "val"])
        src = tmp_path / "temporal_src"
        src.mkdir()
        f0, f1 = str(src / "p0.parquet"), str(src / "p1.parquet")
        pdf[pdf.ts < 18].to_parquet(f0)
        pdf[pdf.ts >= 18].to_parquet(f1)
        os.utime(f0, (1_000_000_000, 1_000_000_000))
        os.utime(f1, (1_000_000_100, 1_000_000_100))

        stream = (
            spark.readStream.schema(
                "key bigint, ts bigint, kind string, attr string, val bigint"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = streaming_temporal_join(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("stemp")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_stemp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = (
            spark.sql("select * from stemp")
            .toPandas()
            .sort_values(["key", "ts", "val"])
            .reset_index(drop=True)
        )
        assert list(got.attr_asof) == ["A", "A", "B", None, "X", "X"]
        assert list(got.version) == [1, 1, 2, 0, 1, 1]

        # batch composition on the same data agrees
        dims = pdf[pdf.kind == "dim"][["key", "attr", "ts"]]
        hist = scd2_history(spark.createDataFrame(dims), "key", "attr", "ts")
        dim_v = hist.select(
            "key", hist.valid_from.alias("ts"), hist.attr.alias("attr_asof"), "version"
        )
        facts = spark.createDataFrame(pdf[pdf.kind == "fact"][["key", "ts", "val"]])
        batch = (
            asof_join(facts, dim_v, on="ts", by=("key",), value_cols=["attr_asof", "version"])
            .toPandas()
            .sort_values(["key", "ts", "val"])
            .reset_index(drop=True)
        )
        assert list(batch.attr_asof_r.fillna("~")) == [
            x if x is not None else "~" for x in got.attr_asof
        ]
        assert list(batch.version_r.fillna(0).astype(int)) == list(got.version)


class TestAllPairsJoin:
    def test_completeness_on_random_corpora(self, spark):
        """Prefix + length filtering must lose NOTHING: output equals
        the unpruned exact join at the same threshold."""
        from stock_indicators_etl_spark.llmdata.dedup import (
            allpairs_jaccard_join,
            ngram_jaccard_pairs,
        )

        rng = np.random.default_rng(41)
        vocab = [f"w{i}" for i in range(30)]
        docs = []
        for i in range(60):
            n = int(rng.integers(5, 25))
            docs.append((i, " ".join(rng.choice(vocab, size=n))))
        # plant exact and near duplicates
        docs.append((1000, docs[0][1]))
        docs.append((1001, docs[1][1] + " extra token here"))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        for t in (0.3, 0.6, 0.9):
            a = (
                allpairs_jaccard_join(df, threshold=t)
                .toPandas()
                .sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True)
            )
            b = (
                ngram_jaccard_pairs(df, threshold=t)
                .toPandas()
                .sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
        # the planted exact dup must be found at the highest threshold
        got = allpairs_jaccard_join(df, threshold=0.9).toPandas()
        assert ((got.doc_a == 0) & (got.doc_b == 1000)).any()

    def test_prefix_prunes_hot_shingles(self, spark):
        """A boilerplate shingle shared by EVERY doc must not drive
        candidate generation: with high threshold, candidate pairs
        stay near the true-pair count, not near N²/2."""
        from pyspark.sql import functions as F

        from stock_indicators_etl_spark.llmdata.dedup import (
            _bucket_pairs,
            allpairs_jaccard_join,
        )

        boiler = "terms of service apply to all content"
        docs = [
            (i, f"{boiler} unique body {i} alpha beta gamma delta {i}")
            for i in range(80)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = allpairs_jaccard_join(df, threshold=0.8).toPandas()
        # bodies differ -> few/no pairs survive; mainly: the join must
        # FINISH without the N²/2 pair explosion the hot shingle implies
        assert len(out) < 80


class TestKlDrift:
    def test_matches_numpy_replica(self, spark):
        from stock_indicators_etl_spark.operators.dq import kl_drift

        rng = np.random.default_rng(29)
        a_rows = [("k1", float(v)) for v in rng.normal(50, 5, 300)]
        b_rows = [("k1", float(v)) for v in rng.normal(55, 8, 280)]
        a = spark.createDataFrame(a_rows, "event_type string, value double")
        b = spark.createDataFrame(b_rows, "event_type string, value double")
        out = kl_drift(a, b, ("event_type",), "value", n_bins=8).toPandas().iloc[0]

        ca_ = np.floor(np.array([v for _, v in a_rows]) * 100 + 0.5).astype("int64")
        cb_ = np.floor(np.array([v for _, v in b_rows]) * 100 + 0.5).astype("int64")
        allc = np.concatenate([ca_, cb_])
        mn, mx = allc.min(), allc.max()
        bins_a = (ca_ - mn) * 8 // (mx - mn + 1)
        bins_b = (cb_ - mn) * 8 // (mx - mn + 1)
        kl = 0.0
        na, nb = len(ca_), len(cb_)
        for j in range(8):
            pa = ((bins_a == j).sum() + 1.0) / (na + 8.0)
            pb = ((bins_b == j).sum() + 1.0) / (nb + 8.0)
            kl += pb * np.log(pb / pa)
        assert out.kl == pytest.approx(kl, abs=1e-9)
        assert out.n_a == na and out.n_b == nb

    def test_identical_snapshots_near_zero(self, spark):
        from stock_indicators_etl_spark.operators.dq import kl_drift

        rows = [("k", float(i % 40)) for i in range(200)]
        df = spark.createDataFrame(rows, "event_type string, value double")
        out = kl_drift(df, df, ("event_type",), "value").toPandas().iloc[0]
        assert abs(out.kl) < 1e-12
