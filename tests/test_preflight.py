"""Known-answer tests for the self-join pair-budget preflight
(``llmdata.preflight.pair_budget_report``): the budget must EQUAL the
pair emissions the family's self-join would actually produce (not
just bound them), cap semantics must match the operators' drop-the-
hot-unit rule, and the budget columns must be DECIMAL(38,0) so a
stop-shingle posting at corpus scale cannot wrap."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from stock_indicators_etl_spark.llmdata.preflight import pair_budget_report


@pytest.fixture(scope="module")
def tiny(spark):
    # 6 docs: docs 0-3 share the shingle "alpha beta gamma" (df=4),
    # docs 4-5 are singletons for every family
    texts = [
        "alpha beta gamma one",
        "alpha beta gamma two",
        "alpha beta gamma three",
        "alpha beta gamma four",
        "totally different words here",
        "another unrelated document text",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    emb = spark.createDataFrame(
        [(i, [float(i % 3) - 1.0] * 64) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    return docs, emb


def _rows(report):
    return {r["family"]: r for r in report.collect()}


class TestPairBudget:
    def test_budget_equals_actual_pair_emissions(self, spark, tiny):
        """Σ C(n_b, 2) over MinHash band buckets must equal the raw
        (pre-distinct) a<b pair count of the banded self-join — the
        exact quantity the preflight promises to predict."""
        from stock_indicators_etl_spark.llmdata.dedup import (
            band_rows,
            minhash_signatures,
        )

        docs, emb = tiny
        got = _rows(pair_budget_report(docs, emb))["minhash_lsh"]
        banded = band_rows(minhash_signatures(docs), 12, 3)
        a = banded.select("band_idx", "band_key", F.col("doc_id").alias("a"))
        b = banded.select("band_idx", "band_key", F.col("doc_id").alias("b"))
        emissions = (
            a.join(b, ["band_idx", "band_key"])
            .filter(F.col("a") < F.col("b"))
            .count()
        )
        assert got["pairs_budget"] == Decimal(emissions)
        assert emissions > 0  # the planted cluster collides somewhere

    def test_posting_family_counts_the_planted_cluster(self, spark, tiny):
        """The df=4 planted shingle contributes C(4,2)=6; a cap of 3
        drops exactly that unit's pairs (hot units DROP, matching
        ngram_jaccard_capped's max_doc_freq semantics)."""
        docs, emb = tiny
        uncapped = _rows(pair_budget_report(docs, emb))["ngram_postings"]
        capped = _rows(pair_budget_report(docs, emb, posting_cap=3))[
            "ngram_postings"
        ]
        assert uncapped["max_unit"] == 4
        # every other shingle is df=1 (contributes 0), so the whole
        # budget is the planted cluster's two shared shingles
        # ("alpha beta gamma" + "beta gamma" is k=3 → only full
        # 3-grams count; "alpha beta gamma" is the one shared unit)
        assert uncapped["pairs_budget"] == Decimal(6)
        assert capped["pairs_budget_capped"] == Decimal(0)
        assert capped["pairs_budget"] == uncapped["pairs_budget"]

    def test_cap_extremes(self, spark, tiny):
        """cap=1 zeroes every family's capped budget (singletons emit
        no pairs); cap=max_unit makes capped == uncapped."""
        docs, emb = tiny
        floor = _rows(
            pair_budget_report(
                docs, emb, lsh_cap=1, posting_cap=1, winnow_cap=1
            )
        )
        for fam, r in floor.items():
            assert r["pairs_budget_capped"] == Decimal(0), fam
        wide = _rows(
            pair_budget_report(
                docs, emb, lsh_cap=10**6, posting_cap=10**6,
                winnow_cap=10**6,
            )
        )
        for fam, r in wide.items():
            assert r["pairs_budget_capped"] == r["pairs_budget"], fam

    def test_budget_dtype_is_decimal38(self, spark, tiny):
        docs, emb = tiny
        report = pair_budget_report(docs, emb)
        dtypes = dict(report.dtypes)
        assert dtypes["pairs_budget"] == "decimal(38,0)"
        assert dtypes["pairs_budget_capped"] == "decimal(38,0)"
        assert dtypes["n_units"] == "bigint"
        assert {r["family"] for r in report.collect()} == {
            "minhash_lsh",
            "ngram_postings",
            "winnow_fp",
            "embed_lsh",
        }
