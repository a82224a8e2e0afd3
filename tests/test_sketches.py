"""Misra–Gries heavy hitters (llmdata/sketches.py): exactness vs
brute force, the capacity guarantee boundary, and plan shape."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stock_indicators_etl_spark.llmdata.sketches import (
    heavy_hitters,
    token_stream,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def _brute(spark, df, num, den):
    toks = token_stream(df)
    n = toks.count()
    thr = (n * num + den - 1) // den
    return {
        (r["token"], r["cnt"])
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= thr)
        .collect()
    }


def test_matches_brute_force_random_corpus(spark):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(60)]
    # zipf-ish: low ids much more frequent
    texts = [
        " ".join(rng.choice(vocab, p=_zipf(len(vocab)), size=40))
        for _ in range(50)
    ]
    df = _corpus(spark, texts)
    got = {
        (r["token"], r["cnt"])
        for r in heavy_hitters(df, phi=(1, 50)).collect()
    }
    assert got == _brute(spark, df, 1, 50)
    assert got  # non-trivial


def _zipf(n):
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


def test_minimal_capacity_still_exact(spark):
    # capacity exactly den/num — the guarantee boundary
    rng = np.random.default_rng(12)
    vocab = [f"t{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, p=_zipf(len(vocab)), size=25))
        for _ in range(40)
    ]
    df = _corpus(spark, texts).repartition(7)  # many partitions
    got = {
        (r["token"], r["cnt"])
        for r in heavy_hitters(df, phi=(1, 20), capacity=20).collect()
    }
    assert got == _brute(spark, df, 1, 20)


def test_adversarial_one_dominant_token(spark):
    texts = ["spam " * 50] * 5 + ["unique%d other filler" % i for i in range(20)]
    df = _corpus(spark, texts)
    rows = heavy_hitters(df, phi=(1, 10)).collect()
    by_tok = {r["token"]: r["cnt"] for r in rows}
    assert by_tok["spam"] == 250
    assert "unique3" not in by_tok


def test_empty_and_short_docs(spark):
    df = _corpus(spark, ["", "  ", "a a a a", ""])
    rows = heavy_hitters(df, phi=(1, 2)).collect()
    assert {(r["token"], r["cnt"]) for r in rows} == {("a", 4)}


def test_bad_phi_raises(spark):
    df = _corpus(spark, ["x"])
    with pytest.raises(ValueError):
        heavy_hitters(df, phi=(0, 5))


def test_plan_broadcasts_candidates(spark):
    df = _corpus(spark, ["a b c"] * 4)
    plan = heavy_hitters(df, phi=(1, 4))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the recount join must be the semi form (candidates never widen rows)
    assert "LeftSemi" in plan
