"""Binned interval join (operators/interval.py) vs a brute-force
pandas containment scan, plus plan-shape assertions (no nested
loop)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from stock_indicators_etl_spark.operators.interval import interval_join


def _mk(spark, seed=4, n_pts=300, n_iv=40, lo=-5_000, hi=5_000):
    """Random keyed points and intervals — including NEGATIVE
    timestamps, which exercise the floor-division correction."""
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame(
        {
            "ticker": rng.choice(["A", "B"], n_pts),
            "window_start": rng.integers(lo, hi, n_pts),
            "pval": np.arange(n_pts),
        }
    )
    start = rng.integers(lo, hi, n_iv)
    length = rng.integers(-200, 2_000, n_iv)  # some inverted/empty
    iv = pd.DataFrame(
        {
            "ticker": rng.choice(["A", "B"], n_iv),
            "iv_start": start,
            "iv_end": start + length,
            "ival_id": np.arange(n_iv),
        }
    )
    return pts, iv, spark.createDataFrame(pts), spark.createDataFrame(iv)


def _brute(pts, iv):
    m = pts.merge(iv, on="ticker")
    m = m[(m.window_start >= m.iv_start) & (m.window_start < m.iv_end)]
    return (
        m.sort_values(["ticker", "pval", "ival_id"]).reset_index(drop=True)
    )


@pytest.mark.parametrize("width", [7, 100, 1024, 10_000])
def test_interval_join_matches_brute_force(spark, width):
    pts, iv, l, r = _mk(spark)
    got = (
        interval_join(
            l, r, start_col="iv_start", end_col="iv_end", bucket_width=width
        )
        .toPandas()
        .sort_values(["ticker", "pval", "ival_id"])
        .reset_index(drop=True)[["ticker", "pval", "ival_id", "window_start", "iv_start", "iv_end"]]
    )
    want = _brute(pts, iv)[["ticker", "pval", "ival_id", "window_start", "iv_start", "iv_end"]]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_interval_join_left_keeps_unmatched_and_duplicates(spark):
    pts = pd.DataFrame(
        {
            "ticker": ["A", "A", "A"],
            "window_start": [10, 10, 999],  # duplicate matched, one unmatched
            "pval": [1.0, 1.0, 2.0],
        }
    )
    iv = pd.DataFrame(
        {"ticker": ["A"], "iv_start": [0], "iv_end": [20], "ival_id": [7]}
    )
    out = (
        interval_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(iv),
            start_col="iv_start",
            end_col="iv_end",
            bucket_width=16,
            how="left",
        )
        .toPandas()
        .sort_values(["window_start"])
        .reset_index(drop=True)
    )
    assert len(out) == 3  # both duplicate rows kept, unmatched kept
    assert out["ival_id"].tolist()[:2] == [7, 7]
    assert pd.isna(out["ival_id"].iloc[2])


def test_interval_join_no_nested_loop_plan(spark):
    _, _, l, r = _mk(spark)
    plan = (
        interval_join(l, r, start_col="iv_start", end_col="iv_end", bucket_width=512)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_interval_join_validation(spark):
    _, _, l, r = _mk(spark)
    with pytest.raises(ValueError, match="how"):
        interval_join(l, r, start_col="iv_start", end_col="iv_end", how="outer")
    with pytest.raises(ValueError, match="collision"):
        interval_join(
            l.withColumn("ival_id", l.pval),
            r,
            start_col="iv_start",
            end_col="iv_end",
        )
