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
