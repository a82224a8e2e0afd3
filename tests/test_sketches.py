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


# ---------------------------------------------------------------------------
# KMV / HLL distinct sketches
# ---------------------------------------------------------------------------

import hashlib

from stock_indicators_etl_spark.llmdata.hashing import HASH_DOMAIN
from stock_indicators_etl_spark.llmdata.sketches import (
    HLL_M,
    HLL_NUMER,
    _HLL_R,
    _HLL_SUFFIX_BITS,
    hll_distinct,
    kmv_distinct,
)


def _h56_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def _lang_corpus(spark, rng, n_docs=80, vocab=400, lang_count=3, parts=7):
    vocab_words = [f"tok{i}" for i in range(vocab)]
    rows = pd.DataFrame(
        {
            "doc_id": range(n_docs),
            "lang": [f"l{i % lang_count}" for i in range(n_docs)],
            "text": [
                " ".join(rng.choice(vocab_words, size=30)) for _ in range(n_docs)
            ],
        }
    )
    return spark.createDataFrame(rows).repartition(parts), rows


def test_kmv_exact_below_k(spark):
    df = _corpus(spark, ["a b c a", "b c d", ""])
    res = kmv_distinct(
        df.withColumn("lang", F.lit("en")), k=16
    ).collect()
    assert len(res) == 1
    r = res[0]
    assert r["n_kept"] == 4  # a b c d
    assert r["kth_hash"] is None
    assert r["est_distinct"] == 4.0


def test_kmv_equals_global_k_minima(spark):
    rng = np.random.default_rng(21)
    df, rows = _lang_corpus(spark, rng)
    k = 32
    got = {r["lang"]: r for r in kmv_distinct(df, k=k).collect()}
    for lang, sub in rows.groupby("lang"):
        toks = set()
        for t in sub["text"]:
            toks.update(t.split())
        hs = sorted({_h56_py(t) for t in toks})
        kept = hs[:k]
        r = got[lang]
        assert r["n_kept"] == min(k, len(hs))
        if len(hs) >= k:
            assert r["kth_hash"] == kept[-1]
            assert r["est_distinct"] == float((k - 1) * HASH_DOMAIN) / float(kept[-1])
            # the estimator should land near the true distinct count
            assert abs(r["est_distinct"] - len(hs)) / len(hs) < 0.75


def test_kmv_partition_invariance(spark):
    rng = np.random.default_rng(22)
    df, _ = _lang_corpus(spark, rng, parts=1)
    one = sorted(
        (r["lang"], r["n_kept"], r["kth_hash"], r["est_distinct"])
        for r in kmv_distinct(df, k=24).collect()
    )
    many = sorted(
        (r["lang"], r["n_kept"], r["kth_hash"], r["est_distinct"])
        for r in kmv_distinct(df.repartition(13), k=24).collect()
    )
    assert one == many


def test_kmv_bad_k_raises(spark):
    df = _corpus(spark, ["a b"]).withColumn("lang", F.lit("en"))
    with pytest.raises(ValueError):
        kmv_distinct(df, k=1)


def test_hll_registers_match_python_reference(spark):
    rng = np.random.default_rng(23)
    df, rows = _lang_corpus(spark, rng)
    got = {r["lang"]: r for r in hll_distinct(df).collect()}
    sb, rmax = _HLL_SUFFIX_BITS, _HLL_R
    for lang, sub in rows.groupby("lang"):
        toks = set()
        for t in sub["text"]:
            toks.update(t.split())
        regs: dict[int, int] = {}
        for t in toks:
            h = _h56_py(t)
            idx, rest = h >> sb, h & ((1 << sb) - 1)
            rho = rmax if rest == 0 else sb + 1 - rest.bit_length()
            regs[idx] = max(regs.get(idx, 0), rho)
        s = sum(1 << (rmax - r) for r in regs.values())
        s += (HLL_M - len(regs)) * (1 << rmax)
        r = got[lang]
        assert r["zero_registers"] == HLL_M - len(regs)
        assert r["register_sum"] == s
        assert r["raw_est"] == HLL_NUMER / float(s)


def test_hll_estimate_accuracy_large_cardinality(spark):
    # ~2000 distinct values: raw HLL (m=64, σ≈13%) should land well
    # inside ±40% without any bias correction
    texts = [" ".join(f"u{i}_{j}" for j in range(50)) for i in range(40)]
    df = _corpus(spark, texts).withColumn("lang", F.lit("en"))
    r = hll_distinct(df).collect()[0]
    true = 2000
    assert abs(r["raw_est"] - true) / true < 0.40


def test_hll_plan_is_pure_jvm(spark):
    df = _corpus(spark, ["a b c"]).withColumn("lang", F.lit("en"))
    plan = hll_distinct(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "FlatMapsInPandas" not in plan and "MapInPandas" not in plan


def test_streaming_kmv_state_and_batch_parity(spark, tmp_path):
    """Two micro-batches; the freshest per-group emission EQUALS the
    batch kmv_distinct over the union (KMV mergeability is exact, so
    this is equality, not tolerance), and n_seen proves the state
    crossed the micro-batch boundary."""
    import os

    from stock_indicators_etl_spark.streaming.sketches import (
        streaming_kmv_distinct,
    )

    rng = np.random.default_rng(41)
    df_all, rows = _lang_corpus(spark, rng, n_docs=60, vocab=300)
    src = tmp_path / "kmv_src"
    src.mkdir()
    f0, f1 = str(src / "p0.parquet"), str(src / "p1.parquet")
    rows.iloc[:30].to_parquet(f0)
    rows.iloc[30:].to_parquet(f1)
    os.utime(f0, (1_000_000_000, 1_000_000_000))
    os.utime(f1, (1_000_000_100, 1_000_000_100))

    K = 24
    stream = (
        spark.readStream.schema("doc_id bigint, lang string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_kmv_distinct(stream, k=K)
    q = (
        out.writeStream.format("memory")
        .queryName("skmv")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_skmv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from skmv").toPandas()
    # two triggers → two emissions per group
    assert (got.groupby("grp").size() == 2).all()
    last = got[got.n_seen == got.groupby("grp").n_seen.transform("max")]

    batch = {
        r["lang"]: r
        for r in kmv_distinct(spark.createDataFrame(rows), k=K).collect()
    }
    assert set(last.grp) == set(batch)
    for _, r in last.iterrows():
        b = batch[r.grp]
        assert int(r.n_kept) == b["n_kept"]
        assert (None if pd.isna(r.kth_hash) else int(r.kth_hash)) == b["kth_hash"]
        assert float(r.est_distinct) == b["est_distinct"]
    # n_seen covers every gram of the full prefix
    n_grams = (
        spark.createDataFrame(rows)
        .select(F.explode(F.split(F.lower(F.col("text")), " ")))
        .count()
    )
    assert int(last.groupby("grp").n_seen.max().sum()) == n_grams


def test_streaming_hll_state_and_batch_parity(spark, tmp_path):
    """Per-register max is mergeable, so the freshest emission EQUALS
    batch hll_distinct over the union of both micro-batches."""
    import os

    from stock_indicators_etl_spark.streaming.sketches import (
        streaming_hll_distinct,
    )

    rng = np.random.default_rng(43)
    _, rows = _lang_corpus(spark, rng, n_docs=60, vocab=500)
    src = tmp_path / "hll_src"
    src.mkdir()
    f0, f1 = str(src / "p0.parquet"), str(src / "p1.parquet")
    rows.iloc[:30].to_parquet(f0)
    rows.iloc[30:].to_parquet(f1)
    os.utime(f0, (1_000_000_000, 1_000_000_000))
    os.utime(f1, (1_000_000_100, 1_000_000_100))

    stream = (
        spark.readStream.schema("doc_id bigint, lang string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_hll_distinct(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("shll")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_shll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from shll").toPandas()
    assert (got.groupby("grp").size() == 2).all()
    last = got[got.n_seen == got.groupby("grp").n_seen.transform("max")]

    batch = {
        r["lang"]: r
        for r in hll_distinct(spark.createDataFrame(rows)).collect()
    }
    assert set(last.grp) == set(batch)
    for _, r in last.iterrows():
        b = batch[r.grp]
        assert int(r.zero_registers) == b["zero_registers"]
        assert int(r.register_sum) == b["register_sum"]
        assert float(r.raw_est) == b["raw_est"]


def test_kmv_overlap_exact_regime_is_true_jaccard(spark):
    from stock_indicators_etl_spark.llmdata.sketches import kmv_pairwise_overlap

    rows = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "source": ["A", "A", "B"],
            "text": ["a b c d", "c d e", "c d e f g"],
        }
    )
    # A = {a,b,c,d,e}, B = {c,d,e,f,g}: |∩|=3, |∪|=7 → J = 3/7
    out = kmv_pairwise_overlap(
        spark.createDataFrame(rows), k=32, group_col="source"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["grp_a"], r["grp_b"]) == ("A", "B")
    assert r["n_kept"] == 7 and r["n_both"] == 3
    assert r["jaccard_est"] == 3.0 / 7.0
    assert r["containment_a_est"] == 3.0 / r["n_a"]


def test_kmv_overlap_estimates_planted_overlap(spark):
    from stock_indicators_etl_spark.llmdata.sketches import kmv_pairwise_overlap

    rng = np.random.default_rng(71)
    shared = [f"s{i}" for i in range(300)]
    only_a = [f"a{i}" for i in range(300)]
    only_b = [f"b{i}" for i in range(300)]
    texts, srcs = [], []
    for i in range(30):
        texts.append(" ".join(rng.choice(shared + only_a, size=60)))
        srcs.append("A")
        texts.append(" ".join(rng.choice(shared + only_b, size=60)))
        srcs.append("B")
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(60), "source": srcs, "text": texts})
    ).repartition(7)
    r = kmv_pairwise_overlap(df, k=64, group_col="source").collect()[0]
    # true J ≈ shared/(shared+onlyA+onlyB) ≈ 1/3 (sampling shrinks it a
    # little); KMV σ ≈ 1/√k ≈ 0.125 — accept a generous band
    assert 0.10 < r["jaccard_est"] < 0.55
    assert r["n_kept"] == 64


def test_kmv_overlap_pair_count_and_orientation(spark):
    from stock_indicators_etl_spark.llmdata.sketches import kmv_pairwise_overlap

    rows = pd.DataFrame(
        {
            "doc_id": range(4),
            "source": ["s1", "s2", "s3", "s4"],
            "text": ["x y z"] * 4,
        }
    )
    out = kmv_pairwise_overlap(
        spark.createDataFrame(rows), k=8, group_col="source"
    ).toPandas()
    assert len(out) == 6  # C(4,2)
    assert (out.grp_a < out.grp_b).all()
    # identical content: every pair is an exact full overlap
    assert (out.jaccard_est == 1.0).all()


def test_hll_cube_sets_match_direct_slices(spark):
    """Each grouping-set row of hll_distinct_cube must equal the
    plain per-slice HLL register file — the mergeability/one-pass
    equivalence that makes the operator correct."""
    from stock_indicators_etl_spark.llmdata.sketches import (
        _HLL_R,
        _HLL_SUFFIX_BITS,
        hll_distinct_cube,
    )

    rng = np.random.default_rng(91)
    rows = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], size=300),
            "b": rng.integers(0, 4, size=300),
            "uid": rng.integers(0, 120, size=300),
        }
    )
    df = spark.createDataFrame(rows).repartition(5)
    got = hll_distinct_cube(df, "a", "b", "uid").toPandas()
    assert len(got) == len(rows.groupby(["a", "b"])) + 3 + 4 + 1

    sb, rmax = _HLL_SUFFIX_BITS, _HLL_R

    def ref_sum(uids):
        regs = {}
        for u in set(int(v) for v in uids):
            h = _h56_py(str(u))
            idx, rest = h >> sb, h & ((1 << sb) - 1)
            rho = rmax if rest == 0 else sb + 1 - rest.bit_length()
            regs[idx] = max(regs.get(idx, 0), rho)
        s = sum(1 << (rmax - r) for r in regs.values())
        return s + (HLL_M - len(regs)) * (1 << rmax)

    # () set
    g = got[got.gid == 3].iloc[0]
    assert g.register_sum == ref_sum(rows.uid)
    # (a) rows
    for a, sub in rows.groupby("a"):
        r = got[(got.gid == 1) & (got.a == a)].iloc[0]
        assert r.register_sum == ref_sum(sub.uid), a
    # (b) rows
    for b, sub in rows.groupby("b"):
        r = got[(got.gid == 2) & (got.b == b)].iloc[0]
        assert r.register_sum == ref_sum(sub.uid), b
    # (a,b) rows
    for (a, b), sub in rows.groupby(["a", "b"]):
        r = got[(got.gid == 0) & (got.a == a) & (got.b == b)].iloc[0]
        assert r.register_sum == ref_sum(sub.uid), (a, b)


def test_hll_cube_single_expand_one_scan(spark):
    from stock_indicators_etl_spark.llmdata.sketches import hll_distinct_cube

    df = spark.createDataFrame(
        pd.DataFrame({"a": ["x"], "b": [1], "uid": [7]})
    )
    plan = (
        hll_distinct_cube(df, "a", "b", "uid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") == 1  # all four sets from ONE pass
    assert "MapInPandas" not in plan  # pure JVM
