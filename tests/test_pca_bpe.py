"""Distributed PCA power iteration (llmdata/pca.py) and the BPE
encode path (llmdata/bpe.bpe_encode): numeric agreement with numpy,
scale/plan shape, and tokenizer invariants."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _toy_emb(spark, n=300, dim=64, seed=5):
    rng = np.random.default_rng(seed)
    # strong planted direction + noise so the top component is crisp
    u = rng.normal(0, 1, dim)
    u /= np.linalg.norm(u)
    x = rng.normal(0, 0.2, (n, dim)) + np.outer(rng.normal(0, 3, n), u)
    return (
        spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": range(n), "embedding": [r.astype(np.float32).tolist() for r in x]}
            )
        ),
        x,
        u,
    )


def test_pca_power_matches_numpy_direction(spark):
    from stock_indicators_etl_spark.llmdata.pca import pca_power

    emb, x, u = _toy_emb(spark)
    out = pca_power(emb, iters=8).orderBy("j").collect()
    v = np.array([r["loading"] for r in out])
    # compare against numpy's top eigenvector of the QUANTIZED matrix
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    q = np.floor(x / nrm * 127.0 + 0.5)
    w, vec = np.linalg.eigh(q.T @ q)
    top = vec[:, -1]
    cos = abs(float(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top)))
    assert cos > 0.999
    lam = out[0]["eigenvalue"]
    assert lam == pytest.approx(float(w[-1]), rel=0.01)
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-3)


def test_pca_power_deterministic_across_runs(spark):
    from stock_indicators_etl_spark.llmdata.pca import pca_power

    emb, _, _ = _toy_emb(spark, n=120, seed=9)
    a = pca_power(emb, iters=3).orderBy("j").collect()
    b = pca_power(emb, iters=3).orderBy("j").collect()
    assert [r["loading"] for r in a] == [r["loading"] for r in b]


def test_pca_power_validates_iters(spark):
    from stock_indicators_etl_spark.llmdata.pca import pca_power

    emb, _, _ = _toy_emb(spark, n=10)
    with pytest.raises(ValueError):
        pca_power(emb, iters=0)


def test_pca_no_python_stage_in_round_plan(spark):
    """The per-round job must stay JVM-side: literal-array dot product
    + posexplode + combinable sum — no Arrow/Python evaluation."""
    from stock_indicators_etl_spark.llmdata.pca import _int_codes

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    codes = _int_codes(emb, "embedding", "vec_id")
    v_lit = F.array(*[F.lit(1 << 20).cast("long") for _ in range(64)])
    s = F.aggregate(
        F.zip_with(F.col("cv"), v_lit, lambda c, vv: c * vv),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    w = (
        codes.select(s.alias("_s"), F.posexplode("cv").alias("j", "x"))
        .groupBy("j")
        .agg(F.sum(F.col("x") * F.col("_s")).alias("w"))
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        w.explain(True)
    txt = buf.getvalue()
    assert "Python" not in txt and "Arrow" not in txt.replace(
        "ArrowEvalPython", "Python"
    )


def test_bpe_encode_roundtrip_words(spark):
    """Encoding invariant: stripping the merge separators reconstructs
    each word + EOW exactly, whatever the merge list."""
    from stock_indicators_etl_spark.llmdata.bpe import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "the cat sat on the mat",
                    "the cats sat on the mats",
                ],
            }
        )
    )
    merges = [
        (r["left"], r["right"]) for r in bpe_train(docs, n_merges=6).collect()
    ]
    enc = bpe_encode(docs, merges).collect()
    got = {r["doc_id"]: "".join(r["tokens"]) for r in enc}
    assert got[1] == "the</w>cat</w>sat</w>on</w>the</w>mat</w>"
    assert got[2] == "the</w>cats</w>sat</w>on</w>the</w>mats</w>"
    # at least one multi-char token was actually produced
    assert any(
        len(t.replace("</w>", "")) > 1 for r in enc for t in r["tokens"]
    )


def test_bpe_encode_compresses_token_count(spark):
    """More merges → no more tokens than fewer merges (merges only
    ever join adjacent symbols)."""
    from stock_indicators_etl_spark.llmdata.bpe import bpe_encode, bpe_train

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    m8 = [(r["left"], r["right"]) for r in bpe_train(docs, n_merges=8).collect()]
    n0 = (
        bpe_encode(docs, [])
        .select(F.size("tokens").alias("k"))
        .agg(F.sum("k"))
        .collect()[0][0]
    )
    n8 = (
        bpe_encode(docs, m8)
        .select(F.size("tokens").alias("k"))
        .agg(F.sum("k"))
        .collect()[0][0]
    )
    assert n8 < n0


def test_abtt_reduces_norms_on_anisotropic_corpus(spark):
    """Removing the top component can only shrink (or keep) each
    vector's norm up to the 6dp rounding; on a corpus with a planted
    dominant direction the mean reduction is substantial."""
    from stock_indicators_etl_spark.llmdata.pca import all_but_the_top

    emb, _, _ = _toy_emb(spark, n=200, seed=3)
    out = all_but_the_top(emb, iters=6).collect()
    assert len(out) == 200
    assert all(r["norm_after"] <= r["norm_before"] + 1e-5 for r in out)
    mean_before = float(np.mean([r["norm_before"] for r in out]))
    mean_after = float(np.mean([r["norm_after"] for r in out]))
    assert mean_after < 0.7 * mean_before


def test_bpe_oracle_survives_merge_exhaustion(spark):
    """ADVICE r8: when training exhausts pairs before n_merges rounds,
    bpe_train breaks early and bpe_encode still emits tokens — the
    encode oracle's merge CTEs must pass rows through (LEFT JOIN with
    a no-op fallback), not empty the word table via a CROSS JOIN
    against the empty b{i}."""
    import duckdb

    from stock_indicators_etl_spark.llmdata.bpe import (
        bpe_encode,
        bpe_train,
        sql_bpe_encode_oracle,
    )
    from stock_indicators_etl_spark.queries_llm import DOCS_CTE

    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "lang": ["en", "en"], "text": ["a a a b", "a b"]}
    )
    docs = spark.createDataFrame(pdf)
    n_merges = 5  # only 2 are learnable: (a,</w>) then (b,</w>)
    trained = bpe_train(docs, n_merges=n_merges).collect()
    assert len(trained) == 2
    merges = [(r["left"], r["right"]) for r in trained]
    got = {
        r["token"]: r["n"]
        for r in bpe_encode(docs, merges)
        .select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    # the oracle unrolls ALL n_merges rounds; rounds past exhaustion
    # must be no-ops, not row killers
    oracle = {
        t: int(n)
        for t, n in con.execute(
            sql_bpe_encode_oracle(n_merges, DOCS_CTE)
        ).fetchall()
    }
    assert oracle == got == {"a</w>": 4, "b</w>": 2}
