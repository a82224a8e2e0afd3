"""Kernel parity tests (SURVEY.md §5 item 3): the vectorized
ewm-based kernels vs independent naive-loop re-derivations of the
published TA-Lib 0.4.x formulas, plus boundedness properties."""

from __future__ import annotations

import numpy as np
import pytest

from stock_indicators_etl_spark.operators.kernels import (
    adx_kernel,
    cmo_kernel,
    macdfix_kernel,
    rsi_kernel,
)

rng = np.random.default_rng(42)
X = 100.0 * np.cumprod(1 + rng.normal(0, 0.01, 200))
H = X * (1 + np.abs(rng.normal(0, 0.002, 200)))
L = X * (1 - np.abs(rng.normal(0, 0.002, 200)))


def naive_rsi(x, n=14):
    out = np.full(len(x), np.nan)
    if len(x) <= n:
        return out
    d = np.diff(x)
    g, l = np.maximum(d, 0), np.maximum(-d, 0)
    ag, al = g[:n].mean(), l[:n].mean()
    out[n] = 0.0 if ag + al == 0 else 100 * ag / (ag + al)
    for i in range(n + 1, len(x)):
        ag = (ag * (n - 1) + g[i - 1]) / n
        al = (al * (n - 1) + l[i - 1]) / n
        out[i] = 0.0 if ag + al == 0 else 100 * ag / (ag + al)
    return out


def naive_cmo(x, n=14):
    out = np.full(len(x), np.nan)
    d = np.diff(x)
    g, l = np.maximum(d, 0), np.maximum(-d, 0)
    ag, al = g[:n].mean(), l[:n].mean()
    out[n] = 0.0 if ag + al == 0 else 100 * (ag - al) / (ag + al)
    for i in range(n + 1, len(x)):
        ag = (ag * (n - 1) + g[i - 1]) / n
        al = (al * (n - 1) + l[i - 1]) / n
        out[i] = 0.0 if ag + al == 0 else 100 * (ag - al) / (ag + al)
    return out


def naive_ema(x, n, k, start):
    out = np.full(len(x), np.nan)
    out[start] = np.mean(x[start - n + 1 : start + 1])
    for i in range(start + 1, len(x)):
        out[i] = (x[i] - out[i - 1]) * k + out[i - 1]
    return out


def test_rsi_matches_naive():
    np.testing.assert_allclose(rsi_kernel(X, 14)[14:], naive_rsi(X, 14)[14:], rtol=1e-9, atol=1e-9)


def test_rsi_lookback_and_bounds():
    r = rsi_kernel(X, 14)
    assert np.isnan(r[:14]).all()
    assert ((r[14:] >= 0) & (r[14:] <= 100)).all()


def test_cmo_matches_naive():
    np.testing.assert_allclose(cmo_kernel(X, 14)[14:], naive_cmo(X, 14)[14:], rtol=1e-9, atol=1e-9)
    assert (np.abs(cmo_kernel(X, 14)[14:]) <= 100).all()


def test_macdfix_matches_naive():
    # TA_INT_MACD requests both EMAs at the slow lookback: EMA12 seeds
    # at index 25 with SMA(X[14:26]) (not at 11 as a standalone EMA12)
    ema12 = np.full(len(X), np.nan)
    ema12[25] = np.mean(X[14:26])
    for i in range(26, len(X)):
        ema12[i] = (X[i] - ema12[i - 1]) * 0.15 + ema12[i - 1]
    ema26 = naive_ema(X, 26, 0.075, 25)
    macd = ema12 - ema26
    sig = np.full(len(X), np.nan)
    sig[33] = np.mean(macd[25:34])
    for i in range(34, len(X)):
        sig[i] = (macd[i] - sig[i - 1]) * 0.2 + sig[i - 1]
    m, s, h = macdfix_kernel(X, 9)
    assert np.isnan(h[:33]).all()
    np.testing.assert_allclose(m[33:], macd[33:], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(s[33:], sig[33:], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(h[33:], (macd - sig)[33:], rtol=1e-9, atol=1e-9)


def naive_adx(h, l, c, n=14):
    m = len(h)
    pdi = np.full(m, np.nan)
    mdi = np.full(m, np.nan)
    adx = np.full(m, np.nan)
    s_tr = s_p = s_m = 0.0
    dx = np.full(m, np.nan)
    for i in range(1, m):
        up, down = h[i] - h[i - 1], l[i - 1] - l[i]
        pdm = up if (up > down and up > 0) else 0.0
        mdm = down if (down > up and down > 0) else 0.0
        tr = max(h[i], c[i - 1]) - min(l[i], c[i - 1])
        if i <= n:
            s_tr += tr
            s_p += pdm
            s_m += mdm
        else:
            s_tr = s_tr - s_tr / n + tr
            s_p = s_p - s_p / n + pdm
            s_m = s_m - s_m / n + mdm
        if i >= n:
            p = 0.0 if s_tr == 0 else 100 * s_p / s_tr
            q = 0.0 if s_tr == 0 else 100 * s_m / s_tr
            pdi[i], mdi[i] = p, q
            dx[i] = 0.0 if p + q == 0 else 100 * abs(p - q) / (p + q)
    if m >= 2 * n:
        adx[2 * n - 1] = np.mean(dx[n : 2 * n])
        for i in range(2 * n, m):
            adx[i] = (adx[i - 1] * (n - 1) + dx[i]) / n
    return pdi, mdi, adx


def test_adx_matches_naive():
    p1, m1, a1 = adx_kernel(H, L, X, 14)
    p2, m2, a2 = naive_adx(H, L, X, 14)
    assert np.isnan(p1[:14]).all() and np.isnan(a1[:27]).all()
    np.testing.assert_allclose(p1[14:], p2[14:], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(m1[14:], m2[14:], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(a1[27:], a2[27:], rtol=1e-9, atol=1e-9)
    assert ((a1[27:] >= 0) & (a1[27:] <= 100)).all()


@pytest.mark.parametrize("kern", [rsi_kernel, cmo_kernel])
def test_short_series_all_nan(kern):
    assert np.isnan(kern(X[:10], 14)).all()


def test_recursive_streaming_batches_match_single_batch(spark):
    """Series that straddle Arrow batch boundaries must produce the
    same output as a single-batch pass (the held-back-tail logic in
    with_recursive_indicators.compute_partition)."""
    import numpy as np
    import pandas as pd
    from stock_indicators_etl_spark.operators.recursive import (
        with_recursive_indicators,
    )

    NS = 1_000_000_000
    rng = np.random.default_rng(7)
    rows = []
    for t in ("A", "B", "C"):
        for i in range(50):
            p = 100.0 + rng.normal(0, 1)
            rows.append(
                {
                    "sub_ticker": t,
                    "window_start": (1_704_106_800 + 60 * i) * NS,
                    "adj_close": p,
                    "high": p + 0.1,
                    "low": p - 0.1,
                    "close": p,
                }
            )
    df = spark.createDataFrame(pd.DataFrame(rows))

    def run():
        return (
            with_recursive_indicators(df, num_partitions=2)
            .toPandas()
            .sort_values(["sub_ticker", "window_start"])
            .reset_index(drop=True)
        )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        baseline = run()  # default batches: whole partition in one
        spark.conf.set(key, "7")  # split every series across many batches
        tiny = run()
    finally:
        spark.conf.set(key, old)
    pd.testing.assert_frame_equal(baseline, tiny)
