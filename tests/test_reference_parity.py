"""Full-pipeline reference parity (SURVEY.md §5 item 3).

An independent pandas/numpy re-derivation of the reference pipeline
semantics (``stockdata/indicators.py:213-304``: sort → segment →
gap-fill → interpolate → TA-Lib indicators → assemble → dropna),
run on a gap+null fixture and compared bar-for-bar against the Spark
``generate_indicators`` output.

The frame-expressible indicators are re-derived here with pandas
rolling ops (a different formulation than the Spark window
expressions — real cross-validation); the recursive family reuses the
shared numpy kernels, which ``test_kernels.py`` validates against the
published TA-Lib formulas independently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from stock_indicators_etl_spark.config import IndicatorConfig
from stock_indicators_etl_spark.operators.kernels import (
    adx_kernel,
    cmo_kernel,
    macdfix_kernel,
    rsi_kernel,
)
from stock_indicators_etl_spark.operators.pipeline import generate_indicators

from conftest import NS, make_bars

VALUE_COLS = ["adj_close", "close", "high", "low", "volume", "open"]


def _segments(g: pd.DataFrame) -> list[pd.DataFrame]:
    g = g.sort_values("window_start").reset_index(drop=True)
    diffs = g["window_start"].diff() / NS
    breaks = diffs.notna() & ~diffs.isin([60.0, 120.0, 180.0])
    kept = [seg for _, seg in g.groupby(breaks.cumsum()) if len(seg) >= 2]
    return kept


def _gap_fill_interp(seg: pd.DataFrame) -> pd.DataFrame:
    full = np.arange(
        seg["window_start"].iloc[0], seg["window_start"].iloc[-1] + 1, 60 * NS
    )
    seg = seg.set_index("window_start").reindex(full)
    seg.index.name = "window_start"
    seg = seg.reset_index()
    for c in VALUE_COLS:
        if seg[c].isna().any():
            seg[c] = seg[c].interpolate(method="linear", limit_direction="both")
    return seg


def _indicators(seg: pd.DataFrame, sub: str) -> pd.DataFrame:
    ac = seg["adj_close"].to_numpy()
    h, lo, c = seg["high"].to_numpy(), seg["low"].to_numpy(), seg["close"].to_numpy()
    v = seg["volume"].to_numpy()
    m = len(seg)
    rn = np.arange(1, m + 1)  # 1-based row number
    out = {"window_start": seg["window_start"].to_numpy(), "close_price": ac}

    for k in range(1, 6):
        prev = np.concatenate([np.full(k, np.nan), ac[:-k]]) if k < m else np.full(m, np.nan)
        with np.errstate(invalid="ignore", divide="ignore"):
            out[f"rocp_{k}"] = np.where(prev == 0, 0.0, (ac - prev) / prev)

    out["rsi"] = rsi_kernel(ac, 14) / 100.0

    # MFI: signed money flow, 14-bar rolling sums (nulls skipped like
    # Spark sum); valid from row 15
    tp = (h + lo + c) / 3.0
    mf = tp * v
    prev_tp = np.concatenate([[np.nan], tp[:-1]])
    pos = pd.Series(np.where(np.isnan(prev_tp), 0.0, np.where(tp > prev_tp, mf, 0.0)))
    neg = pd.Series(np.where(np.isnan(prev_tp), 0.0, np.where(tp < prev_tp, mf, 0.0)))
    ps, ns_ = pos.rolling(14, min_periods=1).sum(), neg.rolling(14, min_periods=1).sum()
    mfi = np.where((ps + ns_) == 0, 0.0, 100.0 * ps / np.where((ps + ns_) == 0, 1.0, ps + ns_))
    out["mfi"] = np.where(rn > 14, mfi, np.nan) / 100.0

    # ULTOSC: fmin/fmax ignore the NaN prev-close like Spark least/greatest
    prev_c = np.concatenate([[np.nan], c[:-1]])
    tl, th = np.fmin(lo, prev_c), np.fmax(h, prev_c)
    bp, tr = pd.Series(c - tl), pd.Series(th - tl)
    terms = []
    for n in (7, 14, 28):
        b = bp.rolling(n, min_periods=1).sum()
        t = tr.rolling(n, min_periods=1).sum()
        terms.append(np.where(t == 0, 0.0, b / np.where(t == 0, 1.0, t)))
    ult = 100.0 * (4.0 * terms[0] + 2.0 * terms[1] + terms[2]) / 7.0
    out["ultosc"] = np.where(rn > 28, ult, np.nan) / 100.0

    out["cmo"] = cmo_kernel(ac, 14) / 100.0

    # AROONOSC over trailing 26 bars; ties -> most recent bar
    aro = np.full(m, np.nan)
    for i in range(25, m):
        wh, wl = h[i - 25 : i + 1], lo[i - 25 : i + 1]
        idx_hi = 25 - np.argmax(wh[::-1])  # last occurrence of max
        idx_lo = 25 - np.argmin(wl[::-1])  # last occurrence of min
        aro[i] = 100.0 * (idx_hi - idx_lo) / 25.0
    out["aroonosc"] = aro / 100.0

    _, _, hist = macdfix_kernel(ac, 9)
    out["macd_hist"] = hist / 10.0

    sma12 = pd.Series(ac).rolling(12, min_periods=1).mean()
    sma26 = pd.Series(ac).rolling(26, min_periods=1).mean()
    ppo = np.where(sma26 == 0, 0.0, 100.0 * (sma12 - sma26) / np.where(sma26 == 0, 1.0, sma26))
    out["ppo"] = np.where(rn >= 26, ppo, np.nan) / 100.0

    ll = pd.Series(lo).rolling(5, min_periods=1).min()
    hh = pd.Series(h).rolling(5, min_periods=1).max()
    rng = (hh - ll).to_numpy()
    raw_k = np.where(rng == 0, 0.0, 100.0 * (c - ll.to_numpy()) / np.where(rng == 0, 1.0, rng))
    raw_k = np.where(rn >= 5, raw_k, np.nan)
    sod = pd.Series(raw_k).rolling(3, min_periods=1).mean().to_numpy()
    out["sok"] = np.where(rn >= 7, raw_k, np.nan) / 100.0
    out["sok_hist"] = np.where(rn >= 7, raw_k - sod, np.nan) / 100.0

    pdi, mdi, adx = adx_kernel(h, lo, c, 14)
    out["adx"] = adx / 100.0
    out["adx_hist"] = (pdi - mdi) / 100.0

    frame = pd.DataFrame(out)
    frame["ticker"] = sub
    return frame


def pandas_reference(pdf: pd.DataFrame) -> pd.DataFrame:
    frames = []
    for ticker, g in pdf.groupby("ticker"):
        for i, seg in enumerate(_segments(g)):
            filled = _gap_fill_interp(seg)
            frames.append(_indicators(filled, f"{ticker}-{i}"))
    return pd.concat(frames, ignore_index=True).dropna().reset_index(drop=True)


def test_full_pipeline_matches_pandas_reference(spark):
    pdf = make_bars(
        tickers=("AAPL", "MSFT"),
        n=140,
        gaps={"AAPL": [(50, 120), (90, 900)], "MSFT": [(40, 180), (41, 7200), (42, 60)]},
        nulls={"AAPL": [10, 11, 60], "MSFT": [0, 139]},
    )
    expected = pandas_reference(pdf)

    got = (
        generate_indicators(spark.createDataFrame(pdf), IndicatorConfig())
        .toPandas()
        .sort_values(["ticker", "window_start"])
        .reset_index(drop=True)
    )
    expected = expected.sort_values(["ticker", "window_start"]).reset_index(drop=True)

    assert list(got.columns) == list(expected.columns)
    assert len(got) == len(expected)
    assert (got["ticker"] == expected["ticker"]).all()
    for col in got.columns:
        if col == "ticker":
            continue
        np.testing.assert_allclose(
            got[col].to_numpy(),
            expected[col].to_numpy(),
            rtol=1e-9,
            atol=1e-9,
            err_msg=col,
        )


def test_recursive_only_no_rocp_still_correct(spark):
    """num_prev_rocp=1 + no frame features means NO window expression
    runs before the recursive pandas stage — the pre_partitioned
    shortcut must not be taken, or RSI is computed over arbitrary
    partition order (ADVICE r1)."""
    from stock_indicators_etl_spark.operators.kernels import rsi_kernel

    pdf = make_bars(tickers=("AAPL", "MSFT", "GOOG", "AMZN"), n=60)
    cfg = IndicatorConfig(momentum_features=["rsi"], num_prev_rocp=1)
    got = (
        generate_indicators(spark.createDataFrame(pdf), cfg, assume_regular=True)
        .toPandas()
        .sort_values(["ticker", "window_start"])
        .reset_index(drop=True)
    )
    for ticker, g in pdf.groupby("ticker"):
        ac = g.sort_values("window_start").adj_close.to_numpy(dtype=float)
        exp = rsi_kernel(ac, 14) / 100.0
        sub = got[got.ticker == f"{ticker}-0"]
        mask = ~np.isnan(exp)
        np.testing.assert_allclose(
            sub.rsi.to_numpy(), exp[mask], rtol=1e-9, atol=1e-9, err_msg=ticker
        )


def test_rolling_robust_matches_pandas_rolling(spark):
    """with_rolling_robust vs an independent pandas re-derivation
    (sorted trailing-window order statistics at the same integer
    ranks)."""
    from stock_indicators_etl_spark.operators.rolling import with_rolling_robust

    rng = np.random.default_rng(77)
    n_bars, n = 60, 7
    bars = make_bars(tickers=("AAPL",), n=n_bars)
    out = (
        with_rolling_robust(spark.createDataFrame(bars), n=n)
        .orderBy("window_start")
        .toPandas()
    )
    cents = np.floor(bars["close"].to_numpy() * 100 + 0.5).astype(np.int64)
    for i in range(n_bars):
        wnd = np.sort(cents[max(0, i - n + 1) : i + 1])
        m = len(wnd)
        r = out.iloc[i]
        assert r.n_w == m
        assert r.med_cents == wnd[(m + 1) // 2 - 1]
        assert r.q1_cents == wnd[max(1, (m + 1) // 4) - 1]
        assert r.q3_cents == wnd[min(m, (3 * (m + 1)) // 4) - 1]
        assert r.min_cents == wnd[0] and r.max_cents == wnd[-1]
