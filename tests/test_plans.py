"""Plan-shape regression tests.

Correctness tests can't catch a plan that silently degrades (a lost
pushdown, a broadcast that becomes a shuffle join, a re-sort storm).
These assert the physical-plan properties DESIGN.md §3-4 claims.
"""

from __future__ import annotations

import contextlib
import io

import pandas as pd
import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
NS = 1_000_000_000


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_nodes(plan: str, name: str) -> int:
    """Count physical-plan nodes by their detail header '(N) <name>'."""
    import re

    return len(re.findall(rf"^\(\d+\) {name}\b", plan, flags=re.M))


def test_market_hours_filter_pushes_down_to_scan(spark):
    from stock_indicators_etl_spark.operators.timegrid import market_hours_filter

    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lo, hi = 1_704_100_000 * NS, 1_704_200_000 * NS
    plan = plan_of(market_hours_filter(e, lo, hi, ws_col="ts"))
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts" in plan


def test_universe_join_is_broadcast(spark):
    from stock_indicators_etl_spark.queries import q_universe_join

    plan = plan_of(q_universe_join(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pricing_summary_prunes_columns_and_combines_map_side(spark):
    from stock_indicators_etl_spark.queries import q_pricing_summary

    plan = plan_of(q_pricing_summary(spark, SF_DIR))
    # partial + final aggregate (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2
    # column pruning reaches the scan: no unused wide columns
    assert "l_comment" not in plan


def test_interpolate_sorts_once_per_direction(spark):
    from stock_indicators_etl_spark.operators.timegrid import interpolate_linear

    pdf = pd.DataFrame(
        {
            "sub_ticker": ["A"] * 4,
            "window_start": [i * 60 * NS for i in range(4)],
            "x": [1.0, None, None, 4.0],
            "y": [None, 2.0, None, None],
            "z": [1.0, 1.0, None, 1.0],
        }
    )
    df = interpolate_linear(spark.createDataFrame(pdf), ["x", "y", "z"])
    plan = plan_of(df)
    # one asc sort + one desc sort regardless of column count
    assert count_nodes(plan, "Sort") == 2


def test_pipeline_has_single_shuffle(spark):
    from stock_indicators_etl_spark.config import IndicatorConfig
    from stock_indicators_etl_spark.operators.pipeline import generate_indicators

    pdf = pd.DataFrame(
        {
            "ticker": ["A"] * 40,
            "window_start": [1_704_106_800 * NS + i * 60 * NS for i in range(40)],
            "adj_close": [100.0 + i for i in range(40)],
            "close": [100.0 + i for i in range(40)],
            "high": [101.0 + i for i in range(40)],
            "low": [99.0 + i for i in range(40)],
            "volume": [1.0] * 40,
        }
    )
    out = generate_indicators(
        spark.createDataFrame(pdf), IndicatorConfig(), assume_regular=True
    )
    plan = plan_of(out)
    # one hash-partitioning exchange on sub_ticker feeds every window
    # AND the pandas stage (pre_partitioned=True adds none)
    assert count_nodes(plan, "Exchange") == 1


def test_ivf_centroid_selection_has_no_global_sort(spark):
    """Centroid sampling must compile to TakeOrderedAndProject
    (per-partition top-n + driver merge), never Exchange + global Sort
    (VERDICT r1 #6)."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sel = (
        e.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(16)
    )
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_ivf_topk_no_python_stage_and_broadcast_probe(spark):
    """ivf_topk is pure Column expressions (no mapInPandas / Arrow
    stage) and the probed query side joins via broadcast."""
    from stock_indicators_etl_spark.llmdata.similarity import ivf_topk

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 4)
    plan = plan_of(ivf_topk(e, q, k=5, n_centroids=4, n_probe=2))
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan


def test_bucketed_bars_window_needs_no_shuffle(spark, tmp_path):
    from stock_indicators_etl_spark.operators.rolling import with_rocp
    from stock_indicators_etl_spark.sources.io import write_bucketed_bars

    pdf = pd.DataFrame(
        {
            "ticker": ["A"] * 30 + ["B"] * 30,
            "window_start": [1_704_106_800 * NS + i * 60 * NS for i in range(30)] * 2,
            "adj_close": [100.0 + i for i in range(60)],
        }
    )
    spark.sql("DROP TABLE IF EXISTS bars_bucketed_test")
    write_bucketed_bars(
        spark.createDataFrame(pdf),
        "bars_bucketed_test",
        str(tmp_path / "bars_bucketed"),
        n_buckets=4,
    )
    out = with_rocp(spark.table("bars_bucketed_test"), "adj_close", ks=(1,))
    plan = plan_of(out)
    assert count_nodes(plan, "Exchange") == 0  # bucketing feeds the window
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    # and the values are still right
    got = out.filter(F.col("ticker") == "A").orderBy("window_start").toPandas()
    assert abs(got.rocp_1.iloc[1] - 0.01) < 1e-12


def test_hash_sample_is_scan_local(spark):
    """Deterministic sampling must compile to a pure filter over the
    scan — no Exchange, no window, no Python stage."""
    from stock_indicators_etl_spark.llmdata.sampling import hash_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(hash_sample(docs, 0.25))
    assert count_nodes(plan, "Exchange") == 0
    assert "ArrowEvalPython" not in plan and "Window" not in plan


def test_simhash_single_narrow_shuffle(spark):
    """SimHash: map-side collect_set dedup + partitioning-preserving
    explode means exactly ONE hash exchange (the doc groupBy); the
    bit-sum groupBy must not add a second one."""
    from stock_indicators_etl_spark.llmdata.dedup import simhash_fingerprints

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(simhash_fingerprints(docs))
    import re

    # formatted mode lists each Exchange's partitioning on its own
    # Arguments line; _spread's RoundRobin fan-out is allowed, but
    # exactly one hashpartitioning may exist
    hash_exchanges = len(re.findall(r"^Arguments: hashpartitioning", plan, flags=re.M))
    assert hash_exchanges == 1


def test_embedding_neardup_no_cartesian(spark):
    """Banded-LSH near-dup must block via equi-joins — an OR-of-bands
    join condition would compile to a nested-loop cartesian."""
    from stock_indicators_etl_spark.llmdata.similarity import embedding_neardup_pairs

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = plan_of(embedding_neardup_pairs(emb, threshold=0.5))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_neardup_salt_gate(spark):
    """r12 key-space-deficit salt, r13 unconditional probe spread:
    the band self-join's pair scoring must spread across tasks at ANY
    parallelism. When shuffle parallelism exceeds the blocking's
    static key space (bands × 2^band_size) side a is salted and
    repartitioned on the salted key (the 16-key default previously
    scored every candidate pair in one task — 15.6 → 2.4 s at sf0.1);
    when par <= n_keys (VERDICT r12 wrong #1: embedding_neardup was
    15.45 s at cpus=8 because the gate stayed off and the broadcast
    probe kept the scan's 1-partition layout) no salt is needed but
    the probe must STILL be hash-repartitioned on the band keys. The
    output rows must be bit-identical in both regimes — each pair
    still meets exactly once per band, at side a's salt."""
    from stock_indicators_etl_spark.llmdata.similarity import embedding_neardup_pairs

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # fixture default (4) <= 16 keys: salt off — but the probe is
        # still spread on the raw band keys (the r13 low-par case)
        plan_off = plan_of(embedding_neardup_pairs(emb, threshold=0.5))
        rows_off = sorted(
            embedding_neardup_pairs(emb, threshold=0.5).collect()
        )
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        plan_on = plan_of(embedding_neardup_pairs(emb, threshold=0.5))
        rows_on = sorted(
            embedding_neardup_pairs(emb, threshold=0.5).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert "_sj" in plan_on and "_sj" not in plan_off
    # both regimes carry the probe-spread exchange: salted keys when
    # the key space is deficient, raw band keys otherwise
    assert re.search(
        r"hashpartitioning\(band.*?bk.*?_sj", plan_on
    ), "salted probe repartition missing from the deficit plan"
    assert re.search(
        r"hashpartitioning\(band.*?bk", plan_off
    ), "probe repartition missing from the par<=n_keys plan"
    assert count_nodes(plan_on, "Exchange") == count_nodes(plan_off, "Exchange")
    assert rows_on == rows_off


def test_chunk_documents_is_scan_local(spark):
    """Context packing must compile to per-row generators over the
    scan — no Exchange, no Window, no Python stage."""
    from stock_indicators_etl_spark.llmdata.retrieval import chunk_documents

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(chunk_documents(docs))
    assert count_nodes(plan, "Exchange") == 0
    assert "ArrowEvalPython" not in plan and "Window" not in plan


def test_bm25_broadcasts_query_side(spark):
    """BM25's inverted-index joins must broadcast the query-term and
    idf tables (never shuffle the postings for them), and never fall
    back to a nested-loop join."""
    from stock_indicators_etl_spark.llmdata.retrieval import bm25_topk
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    plan = plan_of(bm25_topk(docs, queries))
    assert count_nodes(plan, "BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_shipping_priority_pushes_filters_to_all_scans(spark):
    """Q3-shape: segment/date predicates must reach all three parquet
    scans; the big-big joins must not degenerate to nested loops."""
    from stock_indicators_etl_spark.queries import q_shipping_priority

    plan = plan_of(q_shipping_priority(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan
    assert plan.count("PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate") == 1
    assert plan.count("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_rollup_is_one_expand_one_shuffle(spark):
    """ROLLUP must evaluate all grouping levels in a single pass: one
    Expand node feeding one hash exchange — not one aggregation per
    level."""
    from stock_indicators_etl_spark.queries import q_rollup_aggregate

    plan = plan_of(q_rollup_aggregate(spark, SF_DIR))
    assert count_nodes(plan, "Expand") == 1
    import re

    hash_exchanges = len(re.findall(r"^Arguments: hashpartitioning", plan, flags=re.M))
    assert hash_exchanges == 1


def test_span_dedup_one_hash_shuffle_no_joins_before_rebuild(spark):
    """span_dedup's keep-first pass must be ONE shuffle on the span
    hash (a window rank), plus the doc_id rebuild aggregation and the
    final restore join — never a join or Python stage in the dedup
    path itself."""
    from stock_indicators_etl_spark.llmdata.dedup import span_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(span_dedup(docs))
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # dedup path: hash-partition exchange for the window + one for the
    # doc_id groupBy + the left-join restore; nothing quadratic
    assert count_nodes(plan, "Window") == 1


def test_pq_topk_join_carries_codes_not_vectors(spark):
    """The PQ scale claim: the corpus side of the scoring join ships
    codes + a reconstructed norm, never the embedding array. The
    query side (with its LUT) is the broadcast."""
    from stock_indicators_etl_spark.llmdata.similarity import pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 2)
    plan = plan_of(pq_topk(emb, q, k=3))
    # the base-side projection feeding the join carries codes + rnrm,
    # never the embedding array
    proj_lines = [
        ln for ln in plan.splitlines() if "codes" in ln and "rnrm" in ln
    ]
    assert proj_lines, "no codes+rnrm projection found"
    assert not any("embedding" in ln for ln in proj_lines)
    # and the query side (the LUT) is what gets broadcast
    assert "BroadcastExchange" in plan


def test_weighted_sample_is_combinable_top_n(spark):
    """Top-n by sample key must compile to TakeOrderedAndProject
    (per-partition heads + driver merge), never a global Sort."""
    from stock_indicators_etl_spark.llmdata.sampling import weighted_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "w", F.length("text").cast("double")
    )
    plan = plan_of(weighted_sample(docs, "w", 10))
    assert "TakeOrderedAndProject" in plan
    assert count_nodes(plan, "Sort") == 0


def test_frequent_ngrams_combinable_top_n(spark):
    from stock_indicators_etl_spark.llmdata.text import frequent_ngrams

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(frequent_ngrams(docs))
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" not in plan


def test_jaccard_posting_path_has_no_joins(spark):
    """VERDICT r8 weak #1 regression guard: the posting-list path of
    ngram_jaccard_pairs must have NO join at all — sizes ride the
    posting entries (the AllPairs carry-counts pattern), so there is
    no per-doc sizes table to broadcast (the r8 forced broadcast was
    one row per DOCUMENT — billions of rows at 100 TB) and no
    mis-estimated pair stream for the planner to pick as a build
    side (the sf1 OOM the r8 hint papered over)."""
    from stock_indicators_etl_spark.llmdata.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for kw in ({}, {"max_doc_freq": 50}):
        plan = plan_of(ngram_jaccard_pairs(docs, threshold=0.2, **kw))
        joins = (
            count_nodes(plan, "BroadcastHashJoin")
            + count_nodes(plan, "SortMergeJoin")
            + count_nodes(plan, "ShuffledHashJoin")
            + count_nodes(plan, "BroadcastNestedLoopJoin")
            + count_nodes(plan, "CartesianProduct")
        )
        assert joins == 0, plan
        assert count_nodes(plan, "BroadcastExchange") == 0, plan


def test_bucketed_corpus_doc_joins_need_no_exchange(spark, tmp_path):
    """DESIGN's 'both sides bucketable on doc_id' made real: a corpus
    table and a per-doc state table written with the same bucketing
    join (leakage_safe_split's shape) with ZERO Exchange — the
    curation-pass join cost at 100 TB is scan + zip, not shuffle."""
    from stock_indicators_etl_spark.llmdata.sampling import leakage_safe_split
    from stock_indicators_etl_spark.sources.corpus import write_bucketed_corpus

    docs = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [f"doc {i} body" for i in range(40)],
            "lang": ["en"] * 40,
        }
    )
    comps = pd.DataFrame({"doc_id": range(40), "component": [i // 4 for i in range(40)]})
    spark.sql("DROP TABLE IF EXISTS corpus_bucketed_test")
    spark.sql("DROP TABLE IF EXISTS comps_bucketed_test")
    write_bucketed_corpus(
        spark.createDataFrame(docs),
        "corpus_bucketed_test",
        str(tmp_path / "corpus_bucketed"),
        n_buckets=4,
    )
    write_bucketed_corpus(
        spark.createDataFrame(comps),
        "comps_bucketed_test",
        str(tmp_path / "comps_bucketed"),
        n_buckets=4,
    )
    # bucketed joins need AQE's broadcast preference out of the way
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = leakage_safe_split(
            spark.table("corpus_bucketed_test").select("doc_id", "lang"),
            spark.table("comps_bucketed_test"),
        )
        plan = plan_of(out)
        assert count_nodes(plan, "Exchange") == 0, plan
        assert out.count() == 40
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_exists_decorrelates_to_semi_join(spark):
    """Q4's correlated EXISTS must plan as one LEFT SEMI join with the
    date comparison in the join condition — not a per-row subquery."""
    from stock_indicators_etl_spark.queries import q_order_priority_check

    plan = plan_of(q_order_priority_check(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "PushedFilters" in plan  # date range reaches the orders scan


def test_not_exists_decorrelates_to_anti_join(spark):
    """Q22's NOT EXISTS must plan as a LEFT ANTI join; the scalar
    average-balance subquery becomes a reusable broadcast, not a
    recomputation per row."""
    from stock_indicators_etl_spark.queries import q_dormant_customers

    plan = plan_of(q_dormant_customers(spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "Subquery" in plan or "ReusedSubquery" in plan


# --------------------------------------------------------------------------
# Golden-plan regression gate (VERDICT r6 #9): normalized physical-plan
# fingerprints for the heaviest LAZY-construction queries. A lost
# broadcast, an extra shuffle, a Python stage creeping into a JVM-only
# plan, or a new cartesian fails pytest here instead of surfacing as a
# silent bench regression. Node-type counts are partition-count
# independent; PLANS.md holds the full formatted plans these compress.
# (Eager-construction operators — pagerank, dedup_incremental, the CC
# family — return checkpoint-backed frames whose final plan is a scan,
# so a fingerprint there would pin nothing; their guarantees live in
# the dedicated shape tests above.)

def plan_fingerprint(plan: str) -> dict:
    return {
        "exchange": count_nodes(plan, "Exchange"),
        "bexchange": count_nodes(plan, "BroadcastExchange"),
        "bhj": count_nodes(plan, "BroadcastHashJoin"),
        "smj": count_nodes(plan, "SortMergeJoin"),
        "shj": count_nodes(plan, "ShuffledHashJoin"),
        "python": (
            count_nodes(plan, "MapInPandas")
            + count_nodes(plan, "ArrowEvalPython")
            + count_nodes(plan, "FlatMapGroupsInPandas")
        ),
        # BroadcastNestedLoopJoin counts too: intended only where a
        # bounded side is broadcast (bm25 query side, pq literal
        # codebooks, fuzzy length-band) — a data-sized NL join would
        # show up as a count bump here
        "nl": (
            count_nodes(plan, "CartesianProduct")
            + count_nodes(plan, "BroadcastNestedLoopJoin")
        ),
        "sort": count_nodes(plan, "Sort"),
    }


GOLDEN_FINGERPRINTS = {
    # r9: the LSH candidate set is corpus-scaling (cap x n_buckets —
    # per-bucket caps bound skew, not totals), so the candidate-path
    # joins are merge-pinned like allpairs (bhj 4 -> 0, smj 0 -> 4):
    # the forced broadcast OOM'd neardup_components at the sf10
    # decade. AQE re-broadcasts at runtime when genuinely small.
    "dedup_pipeline": {"exchange": 14, "bexchange": 0, "bhj": 0, "smj": 4, "shj": 0, "python": 0, "nl": 0, "sort": 8},
    # r9: sizes ride the posting entries (AllPairs carry-counts
    # pattern) — the two forced-broadcast sizes joins are gone and the
    # whole posting path is three groupBys, zero joins (exchange
    # 9 → 4, bhj 2 → 0); asserted join-free above in
    # test_jaccard_posting_path_has_no_joins
    "ngram_jaccard_capped": {"exchange": 4, "bexchange": 0, "bhj": 0, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 0},
    "ngram_jaccard": {"exchange": 4, "bexchange": 0, "bhj": 0, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 0},
    "minhash_lsh_candidates": {"exchange": 4, "bexchange": 0, "bhj": 0, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 0},
    "bm25_topk": {"exchange": 10, "bexchange": 5, "bhj": 3, "smj": 0, "shj": 0, "python": 0, "nl": 2, "sort": 2},
    "ivfpq_topk": {"exchange": 1, "bexchange": 1, "bhj": 1, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 2},
    "pq_topk": {"exchange": 1, "bexchange": 1, "bhj": 0, "smj": 0, "shj": 0, "python": 0, "nl": 1, "sort": 2},
    # r9: verify-at-the-band-join — vectors ride the banded stream
    # (linear in N), the scored pair stream stays in codegen until
    # the threshold filter, and only survivors shuffle for the dedup
    # (the old join-vectors-back shape spilled ~230 GB at sf10);
    # bexchange 3 -> 1: the one broadcast left is the banded
    # self-join side at tiny SF (AQE-size-appropriate).
    # r12 note: under a session whose shuffle parallelism exceeds the
    # blocking's 16-key space, a key-space-deficit salt salts the
    # probe repartition — see test_embedding_neardup_salt_gate.
    # r13 (VERDICT r12 wrong #1): the probe-side repartition is now
    # UNCONDITIONAL (exchange 1 → 2) — at par <= n_keys the broadcast
    # probe kept the scan's 1-partition layout and one task scored
    # every candidate pair (15.45 s at cpus=8 vs 2.28 at 32).
    "embedding_neardup": {"exchange": 2, "bexchange": 1, "bhj": 1, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 0},
    "fuzzy_join": {"exchange": 9, "bexchange": 4, "bhj": 3, "smj": 0, "shj": 0, "python": 0, "nl": 1, "sort": 2},
    # r9b: the containment join inherits the AllPairs carry-counts
    # posting path verbatim — zero joins/broadcasts after expansion
    "containment_join": {"exchange": 4, "bexchange": 0, "bhj": 0, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 0},
    # r9b: a per-row literal gate is a PURE SCAN — the all-zeros row
    "blocklist": {"exchange": 0, "bexchange": 0, "bhj": 0, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 0},
    # r9b: exact KS = one (key, cents) count shuffle + the per-key
    # running-sum window (the single Sort) + a bounded totals
    # broadcast
    "ks_drift": {"exchange": 4, "bexchange": 1, "bhj": 1, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 1},
    # r9b: CCNet line dedup — one doc-freq count shuffle, the boiler
    # left join, the reassembly groupBy, the empty-doc restore join
    "line_dedup": {"exchange": 5, "bexchange": 2, "bhj": 2, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 0},
    # r9b: modularity over the pinned (localCheckpoint) edge+label
    # frames — without the pins the LSH+LPA lineage replays per
    # consumer (58 exchanges measured; 6 pinned)
    "modularity": {"exchange": 6, "bexchange": 3, "bhj": 2, "smj": 3, "shj": 0, "python": 0, "nl": 1, "sort": 5},
    # r9b: NB scoring — tf shuffle + weight equi-join; the nl joins
    # are the three 1-row bounded crossJoins (total, fallback)
    "nb_classify": {"exchange": 13, "bexchange": 5, "bhj": 2, "smj": 1, "shj": 0, "python": 0, "nl": 3, "sort": 3},
    # r9b: Welch t drift is ONE combinable aggregate over the union —
    # the cheapest drift monitor's plan is the proof
    "welch_drift": {"exchange": 1, "bexchange": 0, "bhj": 0, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 0},
    # r9b: MI — one (x, y) cell shuffle + two CELL-frame marginal
    # re-aggs (broadcast) + the bounded packed fold
    "mutual_info": {"exchange": 7, "bexchange": 2, "bhj": 2, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 0},
    # r9b: equi-depth cuts — every Sort/Window over histogram-BIN
    # frames (7 cut branches), assignment a broadcast join + scan
    "equidepth_bins": {"exchange": 24, "bexchange": 9, "bhj": 9, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 7},
    # r9b: skew pre-flight — one key-count shuffle; everything after
    # is KEY-frame-sized (rank window = the 1 sort; totals = the nl
    # bounded crossJoins)
    "skew_report": {"exchange": 7, "bexchange": 2, "bhj": 0, "smj": 0, "shj": 0, "python": 0, "nl": 2, "sort": 1},
    # r9b: TPC-H Q5 — broadcast dim chain + the one big-big SMJ spine
    "local_supplier_volume": {"exchange": 3, "bexchange": 4, "bhj": 4, "smj": 1, "shj": 0, "python": 0, "nl": 0, "sort": 2},
    # r9b: duplication scalar — one doc-freq shuffle, merge-pinned
    # left join (the smj), per-doc agg + restore join
    "dup_fraction": {"exchange": 7, "bexchange": 1, "bhj": 1, "smj": 1, "shj": 0, "python": 0, "nl": 0, "sort": 2},
    # r9b: Zipf fit — vocab count shuffle + the vocabulary-bounded
    # rank window (the 1 sort) feeding ols_by_key's one aggregate
    "zipf_fit": {"exchange": 2, "bexchange": 0, "bhj": 0, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 1},
    # r9b: LOO target encoding — category + 1-row global aggregates
    # broadcast onto the scan; the base table never shuffles
    "target_encode": {"exchange": 2, "bexchange": 2, "bhj": 1, "smj": 0, "shj": 0, "python": 0, "nl": 1, "sort": 0},
    # r9b: purged split audit — pure scan + ONE combinable aggregate
    "temporal_split": {"exchange": 1, "bexchange": 0, "bhj": 0, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 0},
    # r9b: banded SimHash pairs — fingerprint shuffle + capped band
    # join (merge-pinned ok-semi = the smj) + DISTINCT
    "simhash_neardup": {"exchange": 9, "bexchange": 1, "bhj": 1, "smj": 1, "shj": 0, "python": 0, "nl": 0, "sort": 2},
    "indicator_pipeline_grid": {"exchange": 6, "bexchange": 0, "bhj": 0, "smj": 0, "shj": 0, "python": 1, "nl": 0, "sort": 8},
    "pipeline_wilder": {"exchange": 6, "bexchange": 0, "bhj": 0, "smj": 0, "shj": 0, "python": 1, "nl": 0, "sort": 8},
    "corpus_prep": {"exchange": 3, "bexchange": 7, "bhj": 7, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 0},
    # r7d-f wave: the one NL join in rp_topk is the intended broadcast
    # brute-force scoring stage; link_predict's bucket equi-join keeps
    # nl at 0 (a cross-join graph build would bump it — the regression
    # this row exists to catch, DESIGN 4.22)
    "rp_topk": {"exchange": 1, "bexchange": 1, "bhj": 0, "smj": 0, "shj": 0, "python": 0, "nl": 1, "sort": 3},
    "link_predict": {"exchange": 13, "bexchange": 1, "bhj": 1, "smj": 4, "shj": 0, "python": 0, "nl": 0, "sort": 10},
    # r8: allpairs_join carries _n on the posting structs — the two
    # corpus-sized broadcast joins of r7 are gone. r9: EVERY join in
    # the unbounded-candidate path is hint("merge")-pinned (bhj 5 → 0,
    # smj 0 → 5 with their sorts): the static planner's garbage
    # estimates for the HOF/persisted lineages kept picking broadcast
    # builds that OOM'd at sf1 in a fresh JVM — the candidate pairs
    # (30.9M rows at sf1/t=0.5), the per-candidate-doc set table, and
    # the per-distinct-shingle df table are all corpus/vocabulary-
    # scaling frames. AQE re-broadcasts at runtime from REAL sizes
    # when a side is actually small (sf0.01/0.1 stay fast); the
    # static plan stays safe at any scale.
    "allpairs_join": {"exchange": 19, "bexchange": 0, "bhj": 0, "smj": 5, "shj": 0, "python": 0, "nl": 0, "sort": 11},
    "pit_join": {"exchange": 3, "bexchange": 1, "bhj": 1, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 4},
    "agg_delta": {"exchange": 2, "bexchange": 0, "bhj": 0, "smj": 1, "shj": 0, "python": 0, "nl": 0, "sort": 2},
    # r8: the corpus-wide unpartitioned row_number became the
    # two-level prefix-sum rank — the only SinglePartition exchanges
    # left feed 1-row/bucket-count aggregates (asserted in
    # test_contrastive_rank_no_corpus_global_sort); node counts rose
    # because the rank adds a bucket groupBy + broadcast join back
    # r9: its jaccard verify inherits the merge-pinned candidate
    # path (bhj 30 -> 6, smj 0 -> 24 with their sorts) — same OOM
    # class as dedup_pipeline above
    # r12: jac / pos / ranked each feed two consumers and are now
    # persist()-pinned — the duplicated LSH→verify / window / rank
    # subtrees collapse to InMemoryTableScans (exchange 74 → 19,
    # smj 24 → 4, sort 56 → 12; 99 AQE stage-jobs before the pins)
    "contrastive_pairs": {"exchange": 19, "bexchange": 6, "bhj": 4, "smj": 4, "shj": 0, "python": 0, "nl": 2, "sort": 12},
    # r8: global top-10 via TakeOrderedAndProject (sort: 0 — a global
    # window would pin a single-partition Sort here)
    "shipping_priority": {"exchange": 1, "bexchange": 2, "bhj": 2, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 0},
    # r8: vocabulary rank through the two-level prefix sum — the one
    # unpartitioned window runs over the distinct-(n, prefix)
    # bucket-count frame, never the vocabulary
    "vocab_index": {"exchange": 7, "bexchange": 1, "bhj": 1, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 2},
    # r8 new operators: bloom probe rides the scan filter (2 exchanges
    # = month agg + the key-side semi reduction; the filter-build
    # aggregate runs at CONSTRUCTION, bounded by filter size);
    # bpe_encode's serving pass is shuffle-free per word (2 exchanges
    # = word explode groupBys), zero Python stages in both
    "bloom_join": {"exchange": 2, "bexchange": 1, "bhj": 1, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 1},
    "bpe_encode": {"exchange": 2, "bexchange": 0, "bhj": 0, "smj": 0, "shj": 0, "python": 0, "nl": 0, "sort": 0},
    "benford_check": {"exchange": 4, "bexchange": 1, "bhj": 0, "smj": 0, "shj": 0, "python": 0, "nl": 1, "sort": 1},
}


def _tree_lines(plan: str) -> list[str]:
    """The ASCII tree section of an explain('formatted') dump."""
    out = []
    for line in plan.splitlines()[1:]:
        if not line.strip():
            break
        out.append(line)
    return out


def _indent(line: str) -> int:
    i = 0
    while i < len(line) and line[i] in " :+-*":
        i += 1
    return i


def _node_detail(plan: str, nid: str) -> str:
    import re

    m = re.search(
        rf"^\({nid}\) .*?(?=^\(\d+\) |\Z)", plan, flags=re.M | re.S
    )
    return m.group(0) if m else ""


def _subtrees(
    plan: str, name_prefix: str, detail_filter=None, prune_below=()
) -> list[str]:
    """Text of every subtree rooted at a node whose name starts with
    ``name_prefix``; ``detail_filter(detail_block) -> bool`` narrows
    by the node's detail section (e.g. Exchange arguments).
    ``prune_below``: node-name prefixes whose CHILDREN are dropped
    from the subtree (the node itself stays) — e.g. stop at
    ``InMemoryRelation`` so a cached frame's build lineage is not
    attributed to the operator that merely scans the cache."""
    import re

    lines = _tree_lines(plan)
    res = []
    for idx, line in enumerate(lines):
        stripped = line[_indent(line):]
        if not stripped.startswith(name_prefix):
            continue
        if detail_filter is not None:
            m = re.search(r"\((\d+)\)", stripped)
            if not m or not detail_filter(_node_detail(plan, m.group(1))):
                continue
        d = _indent(line)
        sub = [stripped]
        prune_depth = None
        for l2 in lines[idx + 1:]:
            d2 = _indent(l2)
            if d2 <= d:
                break
            if prune_depth is not None:
                if d2 > prune_depth:
                    continue
                prune_depth = None
            s2 = l2[d2:]
            sub.append(s2)
            if any(s2.startswith(p) for p in prune_below):
                prune_depth = d2
        res.append("\n".join(sub))
    return res


def test_allpairs_no_corpus_broadcast(spark):
    """VERDICT r7 weak #2: allpairs_jaccard_join must never broadcast
    a corpus-sized frame. The r7 shape broadcast the per-doc shingle
    count table (one row per DOCUMENT — billions at 100 TB) for the
    length filter; the r8 shape carries ``_n`` on the posting structs
    instead. The per-doc table is distinguishable in-plan: it is the
    only broadcast side built through a Window (the per-doc rank /
    count), so no BroadcastExchange subtree may contain a Window.
    Subtrees stop at ``InMemoryRelation``: the candidate-pair cache
    is a SEPARATELY-bounded frame (LSH/prefix output, pair-count-
    sized, its own design contract) — the Window in ITS build lineage
    is the per-doc prefix rank that runs once as a shuffle, never as
    a broadcast side."""
    from stock_indicators_etl_spark.llmdata.dedup import allpairs_jaccard_join

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = plan_of(allpairs_jaccard_join(docs, threshold=0.5))
    for sub in _subtrees(
        plan, "BroadcastExchange", prune_below=("InMemoryRelation",)
    ):
        assert "Window" not in sub, (
            "corpus-sized (per-document, Window-derived) frame behind a "
            "broadcast hint:\n" + sub
        )


def test_contrastive_rank_no_corpus_global_sort(spark):
    """VERDICT r7 weak #1: the corpus shuffle rank must be the
    two-level prefix sum — every SinglePartition exchange left in the
    plan has to carry an AGGREGATE output (1-row counts / ≤4096-row
    bucket-count frames), never a projection of the document scan
    (which is what the r7 unpartitioned row_number dragged through
    one task)."""
    import __spark_entry__ as entry_mod

    spark.catalog.clearCache()
    qs = entry_mod.queries()  # rotated into the registry in r8
    qs.update(entry_mod.extra_queries())
    plan = plan_of(qs["contrastive_pairs"](spark, SF_DIR))
    subs = _subtrees(
        plan, "Exchange", detail_filter=lambda d: "SinglePartition" in d
    )
    assert subs, "expected bounded single-partition aggregate frames"
    for sub in subs:
        first = sub.splitlines()[1] if "\n" in sub else ""
        assert "HashAggregate" in sub and "Scan parquet" not in sub.split(
            "HashAggregate"
        )[0], (
            "SinglePartition exchange fed by non-aggregated data "
            f"(first child: {first}):\n" + sub
        )


@pytest.mark.parametrize("name", sorted(GOLDEN_FINGERPRINTS))
def test_golden_plan_fingerprint(spark, name):
    import __spark_entry__ as entry_mod

    # earlier tests may leave persisted lineage fragments registered;
    # the CacheManager would substitute InMemoryTableScan into these
    # plans and shift the node counts
    spark.catalog.clearCache()
    qs = entry_mod.queries()
    if name not in qs:
        for n, f in entry_mod.extra_queries().items():
            qs.setdefault(n, f)
    got = plan_fingerprint(plan_of(qs[name](spark, SF_DIR)))
    assert got == GOLDEN_FINGERPRINTS[name], (
        f"{name}: plan fingerprint drifted (regenerate PLANS.md and, if "
        f"the new plan is intentional, update GOLDEN_FINGERPRINTS)\n"
        f"  expected {GOLDEN_FINGERPRINTS[name]}\n  got      {got}"
    )


def test_correlated_scalar_aggregate_decorrelates(spark):
    """Q17's correlated scalar count/sum must plan as a grouped
    aggregate joined back — not a per-row subquery (no more than the
    expected joins, and an Aggregate on the correlated side)."""
    from stock_indicators_etl_spark.queries import q_small_qty_revenue

    plan = plan_of(q_small_qty_revenue(spark, SF_DIR))
    assert "HashAggregate" in plan
    # decorrelation produced join(s), not repeated scalar-subquery tags
    assert count_nodes(plan, "Subquery") == 0
    assert "CartesianProduct" not in plan


def test_exists_plus_not_exists_decorrelate_to_semi_and_anti(spark):
    """Q21's EXISTS + NOT EXISTS on the same table must plan as one
    LEFT SEMI and one LEFT ANTI join with the inequality riding in
    the anti-join condition."""
    from stock_indicators_etl_spark.queries import q_waiting_suppliers

    plan = plan_of(q_waiting_suppliers(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_semi_join_reduction_available(spark):
    """The 100 TB semi-join-reduction lever: when a big-big shuffle
    join has a SELECTIVE creation side, Spark's runtime bloom-filter
    rule injects a `bloom_filter_agg` on the selective side and a
    might-contain probe onto the big scan — rows that cannot join die
    at the scan, before the shuffle. At local SFs it never fires on
    its own (the probe side is below the 10 GB application threshold,
    and dims broadcast anyway — broadcast beats bloom when it fits),
    so this test forces the preconditions and asserts the rule CAN
    inject; production keeps the defaults."""
    from pyspark.sql import functions as F

    spark.catalog.clearCache()
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    )
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None  # unset → restore via unset()
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        sel = o.filter(F.col("o_totalprice") > 450000)
        j = (
            li.join(sel, li.l_orderkey == sel.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan.lower()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_winnow_matches_takeordered_no_global_sort(spark):
    """The winnowing overlap report's top-20 must be TakeOrdered
    (combinable per-partition top-k), never a single-partition global
    Sort; the fingerprint selection itself is scan-local HOFs, so the
    ONLY join is the r9 stop-fingerprint semi prune — merge-pinned
    (the keep set is corpus-scaling, §4.23), never a static
    broadcast. Its SMJ sorts are fp-partitioned, not global."""
    from stock_indicators_etl_spark.llmdata.dedup import winnow_matches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(winnow_matches(docs))
    assert "TakeOrderedAndProject" in plan
    assert count_nodes(plan, "MapInPandas") == 0
    assert count_nodes(plan, "BroadcastHashJoin") == 0
    assert count_nodes(plan, "SortMergeJoin") == 1
    assert count_nodes(plan, "ShuffledHashJoin") == 0


def test_decontaminate_no_cartesian_no_forced_broadcast(spark):
    """Cross-corpus decontamination must candidate via the banded
    equi-join — a train×eval cartesian (or a nested-loop fallback)
    here is the regression this pins. No forced broadcast either:
    the eval side is small by construction, but the hint is AQE's
    call (DESIGN §4.23)."""
    from stock_indicators_etl_spark.llmdata.dedup import decontaminate

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    plan = plan_of(decontaminate(train, ev))
    assert count_nodes(plan, "CartesianProduct") == 0
    assert count_nodes(plan, "BroadcastNestedLoopJoin") == 0


def test_dsir_select_bounded_broadcasts_and_takeordered(spark):
    """DSIR's only broadcasts are the ≤n_buckets log-ratio frame and
    the 1-row totals frame — both bounded BY CONSTRUCTION — and the
    final selection is TakeOrdered, never a global Sort of the corpus.
    A corpus-sized broadcast or a Python stage here is the regression
    this pins."""
    from stock_indicators_etl_spark.llmdata.dsir import dsir_select

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(
        dsir_select(docs, docs.filter(F.col("lang") == "en"), k=50)
    )
    assert "TakeOrderedAndProject" in plan
    assert count_nodes(plan, "CartesianProduct") == 0
    assert count_nodes(plan, "MapInPandas") == 0
    # scoring join rides the bounded broadcast; the only SMJ is the
    # full-outer of the two ≤n_buckets distribution frames
    assert count_nodes(plan, "BroadcastHashJoin") >= 1


def test_gopher_rules_is_pure_scan(spark):
    """The Gopher gate is a scan-local projection: zero exchanges,
    zero joins, zero Python — the property that makes it free at
    100 TB."""
    from stock_indicators_etl_spark.llmdata.text import gopher_rules

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(gopher_rules(docs))
    # the only exchange is spread()'s round-robin scan fan-out — no
    # hash shuffle anywhere (no keyed repartitioning of the corpus)
    assert count_nodes(plan, "Exchange hashpartitioning") == 0
    assert count_nodes(plan, "MapInPandas") == 0
    assert (
        count_nodes(plan, "BroadcastHashJoin")
        + count_nodes(plan, "SortMergeJoin")
        + count_nodes(plan, "ShuffledHashJoin")
    ) == 0


def test_dup_span_audit_no_forced_broadcast(spark):
    """The duplicated-gram set scales with the corpus, so its semi
    join must be merge-pinned (AQE re-broadcasts from real sizes when
    small) — a static BroadcastHashJoin on it is the OOM class the
    sf10 decade caught in neardup_components."""
    from stock_indicators_etl_spark.llmdata.dedup import dup_span_audit

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(dup_span_audit(docs))
    assert count_nodes(plan, "BroadcastHashJoin") == 0
    assert count_nodes(plan, "CartesianProduct") == 0
    assert count_nodes(plan, "MapInPandas") == 0
    assert count_nodes(plan, "SortMergeJoin") == 1


def test_cms_estimate_broadcasts_bounded_sketch(spark):
    """The CM table is d*w rows BY CONSTRUCTION — the estimate join
    must broadcast it (a shuffle of the probe stream onto a 1024-row
    frame would be a plan regression), and nothing here is Python."""
    from stock_indicators_etl_spark.llmdata.sketches import (
        cms_estimate,
        cms_sketch,
    )
    from stock_indicators_etl_spark.llmdata.text import words

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(F.explode(words(F.col("text"))).alias("word"))
    probes = spark.createDataFrame([("the",), ("of",)], "word string")
    plan = plan_of(cms_estimate(cms_sketch(toks, "word"), probes, "word"))
    assert count_nodes(plan, "BroadcastHashJoin") >= 1
    assert count_nodes(plan, "SortMergeJoin") == 0
    assert count_nodes(plan, "MapInPandas") == 0


def test_phash_neardup_band_join_shape(spark):
    """dHash near-dup must verify AT the band join (hamming from
    carried band words, no vector/hash re-join) with the banded
    stream merge-pinned — a static broadcast of the corpus-scaling
    banded frame is the sf10 OOM class. One MapInPandas (the codec
    leg), no cartesian."""
    from stock_indicators_etl_spark.llmdata.multimodal import (
        dhash_neardup,
        doc_image_dhash,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(dhash_neardup(doc_image_dhash(docs)))
    # the self-join evaluates the (pure, scan-local) codec leg once
    # per side — the same accepted recompute as every banded
    # self-join here; >2 would mean an extra Python stage crept in
    assert count_nodes(plan, "MapInPandas") == 2
    assert count_nodes(plan, "CartesianProduct") == 0
    assert count_nodes(plan, "BroadcastHashJoin") == 0
    assert count_nodes(plan, "SortMergeJoin") == 1


def test_containment_posting_path_has_no_joins(spark):
    """The containment join must inherit the Jaccard posting path's
    join-free shape: sizes ride the posting entries, so after pair
    expansion there is ONE combinable aggregate — no sizes table, no
    broadcast, nothing for the planner to mis-estimate."""
    from stock_indicators_etl_spark.llmdata.dedup import containment_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for kw in ({}, {"max_doc_freq": 50}):
        plan = plan_of(containment_pairs(docs, threshold=0.5, **kw))
        joins = (
            count_nodes(plan, "BroadcastHashJoin")
            + count_nodes(plan, "SortMergeJoin")
            + count_nodes(plan, "ShuffledHashJoin")
            + count_nodes(plan, "BroadcastNestedLoopJoin")
            + count_nodes(plan, "CartesianProduct")
        )
        assert joins == 0, plan
        assert count_nodes(plan, "BroadcastExchange") == 0, plan


def test_ks_drift_single_sort_bounded_broadcast(spark):
    """Exact KS: the only Sort is the per-key running-sum window over
    the DISTINCT-value frame, and the only broadcast is the per-key
    totals (bounded by key cardinality)."""
    from stock_indicators_etl_spark.operators.dq import ks_drift

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", F.col("value")
    )
    plan = plan_of(ks_drift(ev, ev, ("event_type",), "value"))
    assert count_nodes(plan, "Sort") == 1, plan
    assert count_nodes(plan, "MapInPandas") == 0
    assert count_nodes(plan, "CartesianProduct") == 0


def test_auc_single_sort_no_python(spark):
    """auc_by_key shares the exact-KS plan shape: one window sort over
    distinct score values, everything else combinable aggregates."""
    from stock_indicators_etl_spark.operators.stats import auc_by_key

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        (F.col("label") > 2).alias("lab"), F.col("vec_id").cast("double").alias("s")
    )
    plan = plan_of(auc_by_key(emb, "lab", "s"))
    assert count_nodes(plan, "Sort") == 1, plan
    assert count_nodes(plan, "MapInPandas") == 0
