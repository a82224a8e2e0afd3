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


# ---------------------------------------------------------------------------
# streaming twin
# ---------------------------------------------------------------------------


def test_streaming_heavy_hitters_state_and_parity(spark, tmp_path):
    """Two micro-batches; state survives the boundary (n_seen covers
    the full prefix), summaries stay within capacity, and the
    candidate union + exact recount reproduces the batch operator."""
    import os

    from stock_indicators_etl_spark.streaming.sketches import (
        streaming_heavy_hitters,
    )

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, p=_zipf(len(vocab)), size=30))
        for _ in range(60)
    ]
    pdf = pd.DataFrame({"doc_id": range(60), "text": texts})
    src = tmp_path / "docs_src"
    src.mkdir()
    f0, f1 = str(src / "p0.parquet"), str(src / "p1.parquet")
    pdf.iloc[:30].to_parquet(f0)
    pdf.iloc[30:].to_parquet(f1)
    os.utime(f0, (1_000_000_000, 1_000_000_000))
    os.utime(f1, (1_000_000_100, 1_000_000_100))

    CAP, GROUPS = 25, 4
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_heavy_hitters(stream, capacity=CAP, n_groups=GROUPS)
    q = (
        out.writeStream.format("memory")
        .queryName("shh")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_shh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from shh").toPandas()

    # freshest emission per group = max n_seen
    last = got[got.n_seen == got.groupby("grp").n_seen.transform("max")]
    assert (last.groupby("grp").size() <= CAP).all()  # bounded state
    # state crossed the micro-batch boundary: total n_seen == all tokens
    df = spark.createDataFrame(pdf)
    n_total = token_stream(df).count()
    assert int(last.groupby("grp").n_seen.max().sum()) == n_total

    # candidate union ⊇ batch heavy hitters; exact recount == batch
    phi = (1, CAP)  # threshold ceil(N/CAP) > N/(CAP+1): guarantee holds
    batch = _brute(spark, df, *phi)
    cands = set(last.token)
    assert {t for t, _ in batch} <= cands
    toks = token_stream(df)
    thr = (n_total * phi[0] + phi[1] - 1) // phi[1]
    recount = {
        (r["token"], r["cnt"])
        for r in toks.filter(F.col("token").isin(list(cands)))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= thr)
        .collect()
    }
    assert recount == batch
