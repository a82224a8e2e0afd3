"""As-of join (operators/asof.py) vs pandas ``merge_asof`` — an
independent implementation of the same point-in-time semantics
(inclusive match, left-join NULLs, tolerance)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from stock_indicators_etl_spark.operators.asof import asof_join


def _mk(spark, seed=3, n_left=200, n_right=60, keys=("A", "B", "C")):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "ticker": rng.choice(keys, n_left),
            "window_start": rng.integers(0, 10_000, n_left) * 1000,
            "lval": rng.normal(size=n_left).round(3),
        }
    )
    right = pd.DataFrame(
        {
            "ticker": rng.choice(keys, n_right),
            "window_start": rng.integers(0, 10_000, n_right) * 1000,
            "quote": rng.normal(size=n_right).round(3),
        }
    )
    # unique (key, ts) on the right — the documented contract
    right = right.drop_duplicates(["ticker", "window_start"])
    return left, right, spark.createDataFrame(left), spark.createDataFrame(right)


def _pandas_asof(left, right, direction, tolerance=None):
    out = pd.merge_asof(
        left.sort_values("window_start", kind="stable"),
        right.sort_values("window_start", kind="stable").rename(
            columns={"window_start": "window_start_r", "quote": "quote_r"}
        ),
        left_on="window_start",
        right_on="window_start_r",
        by="ticker",
        direction=direction,
        tolerance=tolerance,
    )
    return out.sort_values(["ticker", "window_start", "lval"]).reset_index(drop=True)


def _spark_sorted(df):
    return (
        df.toPandas()
        .sort_values(["ticker", "window_start", "lval"])
        .reset_index(drop=True)
        .astype({"window_start_r": "float64"})
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, direction):
    left, right, l, r = _mk(spark)
    got = _spark_sorted(asof_join(l, r, by=("ticker",), direction=direction, suffix="_r"))
    want = _pandas_asof(left, right, direction)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_tolerance(spark):
    left, right, l, r = _mk(spark, seed=9)
    tol = 500_000
    got = _spark_sorted(
        asof_join(l, r, by=("ticker",), direction="backward", tolerance=tol)
    )
    want = _pandas_asof(left, right, "backward", tolerance=tol)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_exact_timestamp_inclusive(spark):
    l = spark.createDataFrame(
        pd.DataFrame({"ticker": ["A"], "window_start": [100], "lval": [1.0]})
    )
    r = spark.createDataFrame(
        pd.DataFrame({"ticker": ["A"], "window_start": [100], "quote": [9.0]})
    )
    row = asof_join(l, r, by=("ticker",)).collect()[0]
    assert row["quote_r"] == 9.0 and row["window_start_r"] == 100


def test_asof_null_value_row_still_matches(spark):
    # row semantics: a right row whose VALUE is null is still the
    # match (pandas merge_asof behaves the same) — last(ignorenulls)
    # over per-column carries would wrongly reach further back
    l = spark.createDataFrame(
        pd.DataFrame({"ticker": ["A"], "window_start": [300], "lval": [1.0]})
    )
    r = spark.createDataFrame(
        pd.DataFrame(
            {"ticker": ["A", "A"], "window_start": [100, 200], "quote": [5.0, None]}
        )
    )
    row = asof_join(l, r, by=("ticker",)).collect()[0]
    assert row["window_start_r"] == 200 and row["quote_r"] is None


def test_asof_suffix_clash_raises(spark):
    l = spark.createDataFrame(
        pd.DataFrame({"ticker": ["A"], "window_start": [1], "quote_r": [0.0]})
    )
    r = spark.createDataFrame(
        pd.DataFrame({"ticker": ["A"], "window_start": [1], "quote": [0.0]})
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(l, r, by=("ticker",))


def test_asof_one_shuffle_plan(spark):
    """Scale assertion: the union+carry plan shuffles ONCE (both sides
    through a single Exchange on the series key) — no join operator,
    no per-key nested loop."""
    _, _, l, r = _mk(spark)
    plan = asof_join(l, r, by=("ticker",))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan
