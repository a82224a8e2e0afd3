"""Bollinger / OBV / CUSUM: the r7d frame-operator wave.

Each test replays the operator against an independent pure-python/
pandas reference on randomized series — the same strategy as
``test_kernels.py`` (SURVEY.md §5): the Spark implementation must
match a loop-written oracle row for row.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import make_bars

NS = 1_000_000_000


def _bars_df(spark, n=80, tickers=("AAPL", "MSFT")):
    pdf = make_bars(tickers=tickers, n=n)
    return spark.createDataFrame(pdf), pdf


class TestBollinger:
    def test_matches_pandas_reference(self, spark):
        from stock_indicators_etl_spark.operators.rolling import with_bollinger

        sdf, pdf = _bars_df(spark, n=60)
        n, width = 10, 2.0
        out = (
            with_bollinger(sdf, n=n, width=width)
            .select("ticker", "window_start", "bb_mid", "bb_upper", "bb_lower", "bb_bandwidth")
            .toPandas()
            .sort_values(["ticker", "window_start"])
            .reset_index(drop=True)
        )
        for t, g in pdf.groupby("ticker"):
            g = g.sort_values("window_start").reset_index(drop=True)
            cents = np.floor(g["adj_close"] * 100 + 0.5).astype("int64")
            got = out[out.ticker == t].reset_index(drop=True)
            for i in range(len(g)):
                row = got.iloc[i]
                if i < n - 1:
                    assert pd.isna(row.bb_mid) and pd.isna(row.bb_upper)
                    continue
                w = cents[i - n + 1 : i + 1]
                s, ss = int(w.sum()), int((w.astype(object) ** 2).sum())
                mean = s / (n * 100)
                var = max((n * ss - s * s) / (n * (n - 1)), 0.0)
                sd = math.sqrt(var) / 100.0
                assert row.bb_mid == pytest.approx(mean, abs=1e-12)
                assert row.bb_upper == pytest.approx(mean + width * sd, abs=1e-9)
                assert row.bb_lower == pytest.approx(mean - width * sd, abs=1e-9)
                bw = 0.0 if mean == 0 else ((mean + width * sd) - (mean - width * sd)) / mean
                assert row.bb_bandwidth == pytest.approx(bw, abs=1e-9)

    def test_constant_series_zero_sigma(self, spark):
        from stock_indicators_etl_spark.operators.rolling import with_bollinger

        rows = [("T", i * 60 * NS, 50.0) for i in range(15)]
        df = spark.createDataFrame(rows, "ticker string, window_start long, adj_close double")
        out = with_bollinger(df, n=5).filter("bb_mid is not null").toPandas()
        assert (out.bb_upper == out.bb_lower).all()
        assert (out.bb_mid == 50.0).all()
        assert (out.bb_bandwidth == 0.0).all()


class TestOBV:
    def test_matches_loop_reference(self, spark):
        from stock_indicators_etl_spark.operators.rolling import with_obv

        sdf, pdf = _bars_df(spark, n=50)
        out = (
            with_obv(sdf)
            .select("ticker", "window_start", "obv")
            .toPandas()
            .sort_values(["ticker", "window_start"])
            .reset_index(drop=True)
        )
        for t, g in pdf.groupby("ticker"):
            g = g.sort_values("window_start").reset_index(drop=True)
            cents = np.floor(g["close"] * 100 + 0.5).astype("int64")
            vol = np.floor(g["volume"] + 0.5).astype("int64")
            got = out[out.ticker == t].reset_index(drop=True)
            run, prev = 0, None
            for i in range(len(g)):
                if prev is None or cents[i] > prev:
                    run += int(vol[i])
                elif cents[i] < prev:
                    run -= int(vol[i])
                prev = int(cents[i])
                assert int(got.obv.iloc[i]) == run

    def test_integer_dtype(self, spark):
        from stock_indicators_etl_spark.operators.rolling import with_obv

        sdf, _ = _bars_df(spark, n=5)
        assert dict(with_obv(sdf).dtypes)["obv"] == "bigint"


class TestCusum:
    def test_closed_form_equals_recurrence(self, spark):
        """The prefix-sum closed form must equal Page's recurrence
        s_t = max(0, s_{t-1} + x_t - k) on randomized integer series."""
        from stock_indicators_etl_spark.operators.stats import cusum

        rng = np.random.default_rng(11)
        rows = []
        for key in range(6):
            for t in range(200):
                rows.append((key, t, int(rng.integers(-50, 60))))
        df = spark.createDataFrame(rows, "k long, t long, x long")
        k_ref, h = 5, 100
        out = (
            cusum(df, key_cols=("k",), ts_col="t", x_col="x", k=k_ref, h=h)
            .toPandas()
            .sort_values(["k", "t"])
            .reset_index(drop=True)
        )
        pdf = pd.DataFrame(rows, columns=["k", "t", "x"])
        for key, g in pdf.groupby("k"):
            g = g.sort_values("t").reset_index(drop=True)
            got = out[out.k == key].reset_index(drop=True)
            s = 0
            for i in range(len(g)):
                s = max(0, s + int(g.x.iloc[i]) - k_ref)
                assert int(got.cusum.iloc[i]) == s
                assert bool(got.alarm.iloc[i]) == (s > h)

    def test_single_shuffle_plan(self, spark):
        """Both window aggregates share one partitioning — the plan
        must contain exactly one Exchange."""
        from stock_indicators_etl_spark.operators.stats import cusum

        df = spark.createDataFrame([(1, 1, 1)], "k long, t long, x long")
        out = cusum(df, key_cols=("k",), ts_col="t", x_col="x", k=0, h=1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
