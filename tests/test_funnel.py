"""Funnel operator semantics (`operators/funnel.py`): strict ordering,
broken chains, earliest-completion choice, duration bound."""

from __future__ import annotations

import pandas as pd
import pytest

from stock_indicators_etl_spark.operators.funnel import funnel_conversions

NS = 1_000_000_000


def _events(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type", "ns"])
    )


def test_basic_conversion_and_duration(spark):
    ev = _events(
        spark,
        [
            (1, "view", 10 * NS),
            (1, "click", 20 * NS),
            (1, "purchase", 30 * NS),
            # user 2 never purchases
            (2, "view", 10 * NS),
            (2, "click", 15 * NS),
            # user 3 clicks BEFORE viewing → chain breaks at click
            (3, "click", 5 * NS),
            (3, "view", 10 * NS),
            (3, "purchase", 20 * NS),
        ],
    )
    out = (
        funnel_conversions(ev, ("view", "click", "purchase"))
        .toPandas()
        .set_index("user_id")
    )
    assert bool(out.loc[1].converted) and out.loc[1].duration_ns == 20 * NS
    assert not out.loc[2].converted and pd.isna(out.loc[2].duration_ns)
    assert not out.loc[3].converted and pd.isna(out.loc[3].t_1)


def test_same_timestamp_does_not_count(spark):
    ev = _events(
        spark,
        [(1, "view", 10 * NS), (1, "click", 10 * NS), (1, "purchase", 20 * NS)],
    )
    out = funnel_conversions(ev, ("view", "click", "purchase")).toPandas()
    assert not out.iloc[0].converted  # click must be STRICTLY after view


def test_earliest_valid_occurrence_is_chosen(spark):
    ev = _events(
        spark,
        [
            (1, "view", 10 * NS),
            (1, "click", 5 * NS),    # before view: ignored
            (1, "click", 12 * NS),   # first valid click
            (1, "click", 14 * NS),
            (1, "purchase", 13 * NS),  # after first valid click → counts
        ],
    )
    out = funnel_conversions(ev, ("view", "click", "purchase")).toPandas().iloc[0]
    assert (out.t_0, out.t_1, out.t_2) == (10 * NS, 12 * NS, 13 * NS)


def test_within_bound_gates_conversion(spark):
    ev = _events(
        spark,
        [(1, "view", 0), (1, "click", NS), (1, "purchase", 10 * NS)],
    )
    fast = funnel_conversions(ev, ("view", "click", "purchase"), within_ns=10 * NS)
    slow = funnel_conversions(ev, ("view", "click", "purchase"), within_ns=9 * NS)
    assert bool(fast.toPandas().iloc[0].converted)
    assert not slow.toPandas().iloc[0].converted
    # duration is reported either way (funnel complete)
    assert slow.toPandas().iloc[0].duration_ns == 10 * NS


def test_users_without_step0_are_absent(spark):
    ev = _events(spark, [(9, "click", NS), (9, "purchase", 2 * NS)])
    assert funnel_conversions(ev, ("view", "click", "purchase")).count() == 0


def test_rejects_single_step(spark):
    ev = _events(spark, [(1, "view", NS)])
    with pytest.raises(ValueError):
        funnel_conversions(ev, ("view",))


def test_retention_cohorts_known_answer(spark):
    from stock_indicators_etl_spark.operators.funnel import retention_cohorts

    # buckets of 10s: u1 active buckets {0,1,2}, u2 {1,2}, u3 {2}
    ev = _events(
        spark,
        [
            (1, "view", 1 * NS), (1, "view", 12 * NS), (1, "view", 25 * NS),
            (2, "view", 15 * NS), (2, "view", 27 * NS), (2, "view", 28 * NS),
            (3, "view", 22 * NS),
        ],
    )
    out = retention_cohorts(ev, bucket_ns=10 * NS).toPandas()
    got = {(r.cohort, r.offset): r.n_users for r in out.itertuples()}
    assert got == {
        (0, 0): 1, (0, 1): 1, (0, 2): 1,   # u1
        (1, 0): 1, (1, 1): 1,              # u2
        (2, 0): 1,                         # u3
    }


def test_retention_max_offset_and_dedup_within_bucket(spark):
    from stock_indicators_etl_spark.operators.funnel import retention_cohorts

    ev = _events(
        spark,
        [(1, "view", 1), (1, "click", 2), (1, "view", 21 * NS)],  # 2 events in bucket 0
    )
    out = retention_cohorts(ev, bucket_ns=10 * NS, max_offset=1).toPandas()
    got = {(r.cohort, r.offset): r.n_users for r in out.itertuples()}
    assert got == {(0, 0): 1}  # bucket-0 dup collapsed; offset 2 filtered


def test_retention_rejects_bad_bucket(spark):
    from stock_indicators_etl_spark.operators.funnel import retention_cohorts

    ev = _events(spark, [(1, "view", 1)])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        retention_cohorts(ev, bucket_ns=0)


def test_streaming_funnel_matches_batch_across_micro_batches(spark, tmp_path):
    """Cross-micro-batch parity: the stateful streaming funnel emits
    exactly the batch operator's converted rows, with identical step
    times, even when the chain completes in a later micro-batch."""
    import os

    from stock_indicators_etl_spark.streaming.funnel import streaming_funnel

    rows = [
        # u1 completes across the batch seam (purchase in file 2)
        (1, "view", 10 * NS), (1, "click", 20 * NS),
        # u2 completes within file 1
        (2, "view", 5 * NS), (2, "click", 6 * NS), (2, "purchase", 7 * NS),
        # u3 never completes
        (3, "view", 8 * NS),
        # u4 completes but too slowly for the bound
        (4, "view", 0), (4, "click", NS),
    ]
    rows2 = [
        (1, "purchase", 30 * NS),
        (3, "click", 9 * NS),
        (4, "purchase", 100 * NS),
    ]
    pdf1 = pd.DataFrame(rows, columns=["user_id", "event_type", "ns"])
    pdf2 = pd.DataFrame(rows2, columns=["user_id", "event_type", "ns"])
    src = tmp_path / "ev_src"
    src.mkdir()
    f0, f1 = str(src / "p0.parquet"), str(src / "p1.parquet")
    pdf1.to_parquet(f0)
    pdf2.to_parquet(f1)
    os.utime(f0, (1_000_000_000, 1_000_000_000))
    os.utime(f1, (1_000_000_100, 1_000_000_100))

    stream = (
        spark.readStream.schema("user_id long, event_type string, ns long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_funnel(
        stream, ("view", "click", "purchase"), within_ns=50 * NS
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sfunnel")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sf"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sfunnel").toPandas().set_index("user_id")

    # batch twin on the union
    both = spark.createDataFrame(pd.concat([pdf1, pdf2], ignore_index=True))
    batch = (
        funnel_conversions(both, ("view", "click", "purchase"), within_ns=50 * NS)
        .toPandas()
        .set_index("user_id")
    )
    conv = batch[batch.converted]
    assert sorted(got.index) == sorted(conv.index) == [1, 2]
    for u in (1, 2):
        assert got.loc[u].t_0 == conv.loc[u].t_0
        assert got.loc[u].t_2 == conv.loc[u].t_2
        assert got.loc[u].duration_ns == conv.loc[u].duration_ns
