"""NumPy re-derivations of TA-Lib's recursive indicator kernels
(SURVEY.md W7 RSI, W10 CMO, W12 MACDFIX, W15 ADX family).

TA-Lib is not installable in this environment (SURVEY.md §7 Phase 4),
so these implement the published TA-Lib 0.4.x formulas exactly:

- Wilder smoothing seeded with the SMA of the first n values, then
  ``s[i] = (1−1/n)·s[i−1] + (1/n)·x[i]`` — evaluated via pandas
  ``ewm(alpha=1/n, adjust=False)`` (C-speed, same recursion).
- TA-Lib EMA seeding (classic compatibility): seed = SMA of the first
  n values, first output at index n−1.
- MACDFIX uses the *fixed* multipliers k_fast = 0.15, k_slow = 0.075
  (TA_INT_MACD with fast/slow = 0), not 2/(n+1).
- Lookback alignment: NaN before each indicator's TA-Lib lookback.
- Zero denominators → 0.0 (TA-Lib convention).

All kernels are pure array→array functions (easily unit-tested) and
are invoked per-series inside Arrow-batched ``applyInPandas``.
"""

from __future__ import annotations

import numpy as np


def _seeded_recursion(first: float, rest: np.ndarray, alpha: float) -> np.ndarray:
    """y[0] = first; y[i] = (1−alpha)·y[i−1] + alpha·rest[i−1].

    Explicit left-fold loop (not pandas ``ewm``) so the exact IEEE
    operation sequence — ``y·(1−alpha) + x·alpha`` — can be mirrored
    verbatim by a DuckDB ``list_reduce`` lambda, giving bit-identical
    oracle values for the recursive indicators. Series are intraday-
    bounded, so the Python loop is negligible next to Arrow transfer.
    """
    a = 1.0 - alpha
    out = np.empty(len(rest) + 1)
    y = float(first)
    out[0] = y
    for i in range(len(rest)):
        y = y * a + rest[i] * alpha
        out[i + 1] = y
    return out


def _lfold_mean(x: np.ndarray) -> float:
    """Left-fold sum / n — matches SQL ``list_reduce(.., +) / n``
    exactly (numpy's pairwise summation orders differently)."""
    s = 0.0
    for v in x:
        s = s + v
    return s / len(x)


def _wilder_avgs(x: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Wilder-smoothed average gain/loss arrays aligned to x[n:]."""
    d = np.diff(x)
    gain = np.maximum(d, 0.0)
    loss = np.maximum(-d, 0.0)
    seed_g = _lfold_mean(gain[:n])
    seed_l = _lfold_mean(loss[:n])
    ag = _seeded_recursion(seed_g, gain[n:], 1.0 / n)
    al = _seeded_recursion(seed_l, loss[n:], 1.0 / n)
    return ag, al


def rsi_kernel(x: np.ndarray, n: int = 14) -> np.ndarray:
    """RSI (W7, ``stockdata/indicators.py:324-334``): 100·ag/(ag+al),
    Wilder smoothing, first output at index n."""
    m = len(x)
    out = np.full(m, np.nan)
    if m <= n:
        return out
    ag, al = _wilder_avgs(np.asarray(x, dtype=np.float64), n)
    denom = ag + al
    out[n:] = np.where(denom == 0.0, 0.0, 100.0 * ag / np.where(denom == 0.0, 1.0, denom))
    return out


def cmo_kernel(x: np.ndarray, n: int = 14) -> np.ndarray:
    """CMO (W10, ``stockdata/indicators.py:403-413``): TA-Lib computes
    it with the *same Wilder smoothing as RSI* — 100·(ag−al)/(ag+al)."""
    m = len(x)
    out = np.full(m, np.nan)
    if m <= n:
        return out
    ag, al = _wilder_avgs(np.asarray(x, dtype=np.float64), n)
    denom = ag + al
    out[n:] = np.where(denom == 0.0, 0.0, 100.0 * (ag - al) / np.where(denom == 0.0, 1.0, denom))
    return out


def _ema_talib(x: np.ndarray, n: int, k: float) -> np.ndarray:
    """TA-Lib EMA: seed = SMA(x[:n]) at index n−1, then recursion with
    multiplier k. NaN before index n−1."""
    m = len(x)
    out = np.full(m, np.nan)
    if m < n:
        return out
    seed = _lfold_mean(x[:n])
    out[n - 1 :] = _seeded_recursion(seed, x[n:], k)
    return out


def macdfix_kernel(
    x: np.ndarray, signal_n: int = 9
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """MACDFIX (W12, ``stockdata/indicators.py:432-445``): fixed
    EMA12/EMA26 with k = 0.15 / 0.075, EMA-``signal_n`` signal.

    Returns (macd, signal, hist), all aligned to TA-Lib's combined
    lookback 25 + signal_n − 1 (= 33 for the default 9).
    """
    x = np.asarray(x, dtype=np.float64)
    m = len(x)
    nan3 = (np.full(m, np.nan), np.full(m, np.nan), np.full(m, np.nan))
    slow_lb = 25  # EMA26 first valid index
    lookback = slow_lb + signal_n - 1
    if m <= lookback:
        return nan3
    # TA-Lib's TA_INT_MACD requests BOTH EMAs starting at the slow
    # lookback, and TA_INT_EMA (classic-compat) seeds at the requested
    # start: EMA12 seeds at index 25 as SMA(x[14:26]) — NOT at index
    # 11 as a standalone EMA12 would. Both recursions start at x[26].
    fast_seed = _lfold_mean(x[slow_lb - 12 + 1 : slow_lb + 1])
    ema_fast = np.full(m, np.nan)
    ema_fast[slow_lb:] = _seeded_recursion(fast_seed, x[slow_lb + 1 :], 0.15)
    ema_slow = _ema_talib(x, 26, 0.075)
    macd = ema_fast - ema_slow  # valid from slow_lb
    sig_seed = _lfold_mean(macd[slow_lb : slow_lb + signal_n])
    sig = np.full(m, np.nan)
    sig[lookback:] = _seeded_recursion(
        sig_seed, macd[lookback + 1 :], 2.0 / (signal_n + 1.0)
    )
    macd_out = np.full(m, np.nan)
    macd_out[lookback:] = macd[lookback:]
    hist = macd_out - sig
    return macd_out, sig, hist


def aroonosc_talib_kernel(
    high: np.ndarray, low: np.ndarray, n: int = 25
) -> np.ndarray:
    """AROONOSC with TA-Lib's exact path-dependent tie rule (W11,
    reference ``stockdata/indicators.py:415-430`` → TA_AROONOSC).

    TA-Lib tracks the running extreme index incrementally as the
    window slides: a new bar *replaces* a tied extreme (``>=`` /
    ``<=`` — most recent wins), but when the current extreme falls out
    of the window the rescan keeps the *earliest* tied bar (strict
    ``>`` / ``<``). The retained index therefore depends on the path
    the window took — not expressible as a per-row argmax, which is
    why the frame-expressible default
    (:func:`~stock_indicators_etl_spark.operators.rolling.with_aroonosc`)
    resolves every tie to the most recent bar instead. On untied
    inputs the two agree exactly (property-tested).

    Output: ``100·(highest_idx − lowest_idx)/n``, first valid at
    index ``n`` — identical alignment and scaling to the default.
    """
    h = np.asarray(high, dtype=np.float64)
    lo = np.asarray(low, dtype=np.float64)
    m = len(h)
    out = np.full(m, np.nan)
    if m <= n:
        return out
    factor = 100.0 / n
    lowest_idx = -1
    highest_idx = -1
    lowest = 0.0
    highest = 0.0
    trailing = 0
    for today in range(n, m):
        tmp = lo[today]
        if lowest_idx < trailing:
            lowest_idx = trailing
            lowest = lo[trailing]
            for i in range(trailing + 1, today + 1):
                t = lo[i]
                if t < lowest:  # strict: earliest tie survives a rescan
                    lowest_idx = i
                    lowest = t
        elif tmp <= lowest:  # non-strict: newest tie replaces
            lowest_idx = today
            lowest = tmp
        tmp = h[today]
        if highest_idx < trailing:
            highest_idx = trailing
            highest = h[trailing]
            for i in range(trailing + 1, today + 1):
                t = h[i]
                if t > highest:
                    highest_idx = i
                    highest = t
        elif tmp >= highest:
            highest_idx = today
            highest = tmp
        out[today] = factor * (highest_idx - lowest_idx)
        trailing += 1
    return out


def adx_kernel(
    high: np.ndarray, low: np.ndarray, close: np.ndarray, n: int = 14
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ADX family (W15, ``stockdata/indicators.py:459-487``).

    Returns (plus_di, minus_di, adx): Wilder-smoothed ±DM / TR sums →
    ±DI (first valid index n); DX → Wilder-mean ADX (first valid index
    2n−1). The reference outputs ``adx_hist = (+DI − −DI)/100`` and
    ``adx = ADX/100`` (note the name swap at ``indicators.py:294-297``).
    """
    h = np.asarray(high, dtype=np.float64)
    l = np.asarray(low, dtype=np.float64)  # noqa: E741
    c = np.asarray(close, dtype=np.float64)
    m = len(h)
    pdi = np.full(m, np.nan)
    mdi = np.full(m, np.nan)
    adx = np.full(m, np.nan)
    if m <= n:
        return pdi, mdi, adx

    up = np.diff(h)
    down = -np.diff(l)
    pdm = np.where((up > down) & (up > 0), up, 0.0)
    mdm = np.where((down > up) & (down > 0), down, 0.0)
    pc = c[:-1]
    tr = np.maximum(h[1:], pc) - np.minimum(l[1:], pc)

    # Wilder smoothed sums s[i] = s[i−1] − s[i−1]/n + cur ≡ n·ewm(1/n)
    s_tr = n * _seeded_recursion(_lfold_mean(tr[:n]), tr[n:], 1.0 / n)
    s_p = n * _seeded_recursion(_lfold_mean(pdm[:n]), pdm[n:], 1.0 / n)
    s_m = n * _seeded_recursion(_lfold_mean(mdm[:n]), mdm[n:], 1.0 / n)

    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.where(s_tr == 0.0, 0.0, 100.0 * s_p / np.where(s_tr == 0.0, 1.0, s_tr))
        q = np.where(s_tr == 0.0, 0.0, 100.0 * s_m / np.where(s_tr == 0.0, 1.0, s_tr))
        dsum = p + q
        dx = np.where(dsum == 0.0, 0.0, 100.0 * np.abs(p - q) / np.where(dsum == 0.0, 1.0, dsum))
    pdi[n:] = p
    mdi[n:] = q

    if m >= 2 * n:
        seed_adx = _lfold_mean(dx[:n])  # dx[0] ↔ index n → dx[:n] ↔ idx n..2n−1
        adx[2 * n - 1 :] = _seeded_recursion(seed_adx, dx[n:], 1.0 / n)
    return pdi, mdi, adx
