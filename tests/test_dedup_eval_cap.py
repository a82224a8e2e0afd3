"""VERDICT r11 wrong #1 regression: the sampled dedup-eval's truth
join must degrade gracefully on skewed duplicate clusters — a
boilerplate shingle shared by more docs than DEDUP_EVAL_TRUTH_MAX_DF
is dropped from the pair expansion (bounding fan-out by construction),
the bias is surfaced via n_capped_shingles, and the DuckDB oracle
applies the identical rule."""

from __future__ import annotations

import duckdb
import pytest


def _write_fixture(spark, tmp_path):
    """200 docs sharing one boilerplate shingle (sampled doc-freq far
    above the cap) + 5 identical-text pairs carrying real dedup
    signal with no boilerplate."""
    rows = []
    for i in range(200):
        rows.append(
            (i, "en", "web", f"common boiler plate page{i} tail{i}")
        )
    for j in range(5):
        t = f"unique duplicate cluster number {j} alpha beta gamma delta"
        rows.append((1000 + 2 * j, "en", "web", t))
        rows.append((1001 + 2 * j, "en", "web", t))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    p = str(tmp_path / "documents.parquet")
    docs.write.parquet(p)
    return docs, p


class TestDedupEvalSampledCap:
    def test_cap_binds_and_matches_oracle(self, spark, tmp_path):
        from stock_indicators_etl_spark.queries_llm import (
            SQL_DEDUP_EVAL_SAMPLED,
            q_dedup_eval_sampled,
        )

        docs, p = _write_fixture(spark, tmp_path)
        got = q_dedup_eval_sampled(spark, str(tmp_path)).collect()
        assert len(got) == 1
        row = got[0]
        # ~100 of the 200 boilerplate docs survive the 0.5 hash
        # sample, so the shared shingle's doc-freq exceeds the cap
        # and the indicator must report the bind
        assert row["n_capped_shingles"] >= 1
        # the harness itself stays well-defined under the cap
        assert row["tp"] is not None and row["fn"] is not None

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{p}/*.parquet')"
        )
        want = con.execute(SQL_DEDUP_EVAL_SAMPLED).fetchall()
        assert len(want) == 1
        assert tuple(row) == tuple(want[0])

    def test_cap_bounds_truth_pair_fanout(self, spark, tmp_path):
        """Direct fan-out bound: with the cap, the hot shingle's
        ~d²/2 pair expansion disappears; without it, the sampled
        truth population is quadratic in the cluster size."""
        from stock_indicators_etl_spark.llmdata.dedup import (
            ngram_jaccard_pairs,
        )
        from stock_indicators_etl_spark.llmdata.sampling import hash_sample
        from stock_indicators_etl_spark.queries_llm import (
            DEDUP_EVAL_SAMPLE_RATE,
            DEDUP_EVAL_TRUTH_MAX_DF,
        )

        docs, _ = _write_fixture(spark, tmp_path)
        sample = hash_sample(docs, DEDUP_EVAL_SAMPLE_RATE)
        n_sampled_boiler = sample.filter("doc_id < 1000").count()
        assert n_sampled_boiler > DEDUP_EVAL_TRUTH_MAX_DF  # cap must bind
        uncapped = ngram_jaccard_pairs(sample).count()
        capped = ngram_jaccard_pairs(
            sample, max_doc_freq=DEDUP_EVAL_TRUTH_MAX_DF
        ).count()
        # uncapped: one hot shingle alone emits d*(d-1)/2 pairs
        assert uncapped >= n_sampled_boiler * (n_sampled_boiler - 1) // 2
        # capped: only per-doc-unique shingles survive -> pair count
        # collapses to the genuine duplicate pairs (plus nothing from
        # the boilerplate cluster)
        assert capped <= 10
        assert capped < uncapped / 50
