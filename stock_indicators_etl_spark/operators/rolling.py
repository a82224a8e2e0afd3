"""Frame-expressible indicators as native Spark window expressions
(SURVEY.md §2.5: W5 ROCP, W6 MOM, W8 MFI, W9 ULTOSC, W11 AROONOSC,
W13 PPO, W14 STOCHF, W16 CCI).

Each function adds indicator column(s) computed over
``Window.partitionBy(key).orderBy(time)``. Values are **raw TA-Lib
scale** (0–100 style); the pipeline applies the reference's ÷100/÷10
output scaling (``stockdata/indicators.py:332,...,485``).

TA-Lib lookback parity: TA-Lib emits NaN for the first ``lookback``
rows of each series; we null the same rows via per-series
``row_number`` guards, so outputs align bar-for-bar with the
reference's TA-Lib 0.4.x calls.

Zero-denominator convention: TA-Lib outputs 0.0 when a denominator is
0 (STOCHF, CCI) — replicated with explicit ``when`` guards so results
are engine-independent (no reliance on double ÷0 semantics).

Scale notes: window frames of ≤ 28 rows over series partitions;
everything stays in whole-stage codegen. One shuffle per distinct
partition key, shared across all indicator windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def series_window(
    key_cols: Sequence[str] = ("ticker",),
    ws_col: str = "window_start",
    tiebreak_cols: Sequence[str] = (),
) -> WindowSpec:
    """Per-series ordered window. Cumulative/lag computations over it
    are order-sensitive, so the ordering must be TOTAL: either
    ``(key, ws_col)`` is unique by construction (grid rollups emit one
    row per bar), or the caller passes a unique ``tiebreak_cols``
    (e.g. the event id) — raw event-derived series should always pass
    one, since duplicate timestamps would otherwise make lag/cumsum
    results partition-order-dependent."""
    return Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(
        ws_col, *tiebreak_cols
    )


def _rn(w: WindowSpec) -> Column:
    return F.row_number().over(w)


def _safe_div(num: Column, den: Column, on_zero: float = 0.0) -> Column:
    return F.when(den == F.lit(0.0), F.lit(on_zero)).otherwise(num / den)


def with_rocp(
    df: DataFrame,
    close_col: str = "adj_close",
    ks: Sequence[int] = (1, 2, 3, 4, 5),
    key_cols: Sequence[str] = ("ticker",),
    ws_col: str = "window_start",
    prefix: str = "rocp_",
) -> DataFrame:
    """Rate-of-change-percent ``(c - c[-k]) / c[-k]`` for each k (W5).

    Reference: ``stockdata/indicators.py:272-273,314-322`` (TA-Lib
    ROCP on adj_close, k = 1..5).
    """
    w = series_window(key_cols, ws_col)
    c = F.col(close_col)
    cols = {}
    for k in ks:
        prev = F.lag(c, k).over(w)
        cols[f"{prefix}{k}"] = _safe_div(c - prev, prev, on_zero=0.0)
    return df.withColumns(cols)


def with_mom(
    df: DataFrame,
    close_col: str = "adj_close",
    n: int = 10,
    key_cols: Sequence[str] = ("ticker",),
    ws_col: str = "window_start",
    out_col: str = "mom",
) -> DataFrame:
    """Momentum ``c - c[-n]`` (W6; dead code in the reference,
    ``stockdata/indicators.py:306-312``)."""
    w = series_window(key_cols, ws_col)
    return df.withColumn(out_col, F.col(close_col) - F.lag(close_col, n).over(w))


def with_mfi(
    df: DataFrame,
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
    vol_col: str = "volume",
    n: int = 14,
    key_cols: Sequence[str] = ("ticker",),
    ws_col: str = "window_start",
    out_col: str = "mfi",
) -> DataFrame:
    """Money Flow Index on the **unadjusted** close (W8,
    ``stockdata/indicators.py:278-279,336-351``).

    typical price → signed money flow vs previous typical price →
    n-bar rolling positive/negative sums. First valid output at the
    (n+1)-th row of each series (TA-Lib lookback n).
    """
    w = series_window(key_cols, ws_col)
    frame = w.rowsBetween(-(n - 1), 0)
    tp = (F.col(high_col) + F.col(low_col) + F.col(close_col)) / F.lit(3.0)
    mf = tp * F.col(vol_col)
    prev_tp = F.lag(tp, 1).over(w)
    pos_flow = F.when(prev_tp.isNull(), F.lit(None)).when(tp > prev_tp, mf).otherwise(F.lit(0.0))
    neg_flow = F.when(prev_tp.isNull(), F.lit(None)).when(tp < prev_tp, mf).otherwise(F.lit(0.0))
    out = df.withColumn("_pos_f", pos_flow).withColumn("_neg_f", neg_flow)
    pos = F.sum("_pos_f").over(frame)
    neg = F.sum("_neg_f").over(frame)
    valid = _rn(w) > F.lit(n)
    # TA-Lib outputs 0 whenever posSumMF + negSumMF < 1.0 (not just
    # == 0): tiny total money flow is treated as no-signal (ADVICE r1)
    total = pos + neg
    mfi = F.when(
        valid,
        F.when(total < F.lit(1.0), F.lit(0.0)).otherwise(F.lit(100.0) * pos / total),
    )
    return out.withColumn(out_col, mfi).drop("_pos_f", "_neg_f")


def with_ultosc(
    df: DataFrame,
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
    n1: int = 7,
    n2: int = 14,
    n3: int = 28,
    key_cols: Sequence[str] = ("ticker",),
    ws_col: str = "window_start",
    out_col: str = "ultosc",
) -> DataFrame:
    """Ultimate Oscillator (W9, ``stockdata/indicators.py:280-281,
    353-370``): buying-pressure / true-range rolling sums at three
    horizons, weighted 4/2/1. Unadjusted close. First valid at row
    n3 + 1 (TA-Lib lookback n3)."""
    w = series_window(key_cols, ws_col)
    prev_c = F.lag(close_col, 1).over(w)
    true_low = F.least(F.col(low_col), prev_c)
    true_high = F.greatest(F.col(high_col), prev_c)
    out = (
        df.withColumn("_bp", F.col(close_col) - true_low)
        .withColumn("_tr", true_high - true_low)
    )
    ratios = []
    for n in (n1, n2, n3):
        frame = w.rowsBetween(-(n - 1), 0)
        ratios.append(_safe_div(F.sum("_bp").over(frame), F.sum("_tr").over(frame)))
    a1, a2, a3 = ratios
    valid = _rn(w) > F.lit(n3)
    ult = F.when(valid, F.lit(100.0) * (F.lit(4.0) * a1 + F.lit(2.0) * a2 + a3) / F.lit(7.0))
    return out.withColumn(out_col, ult).drop("_bp", "_tr")


def with_aroonosc(
    df: DataFrame,
    high_col: str = "high",
    low_col: str = "low",
    n: int = 25,
    key_cols: Sequence[str] = ("ticker",),
    ws_col: str = "window_start",
    out_col: str = "aroonosc",
) -> DataFrame:
    """Aroon Oscillator (W11, ``stockdata/indicators.py:284-285,
    415-430``): ``100 · (idx_of_high − idx_of_lo) / n`` over the
    trailing n+1 bars. First valid at row n + 1.

    argmax-by via lexicographic struct max — portable, deterministic,
    no UDF.

    **Tie semantics**: this resolves every high/low tie to the most
    recent bar. TA-Lib's TA_AROON tie rule is path-dependent — the
    steady-state update uses ``>=`` (most recent wins) but the rescan
    after the old extreme leaves the window uses strict ``>`` (earliest
    wins) — which is not expressible as a per-row argmax. Untied
    inputs match TA-Lib exactly (property-tested); for strict tie
    parity on tied inputs (cent-quantized prices, flat gap-fill
    stretches) set ``IndicatorConfig.strict_talib_ties=True``, which
    routes AROONOSC through the sequential
    :func:`~stock_indicators_etl_spark.operators.kernels.aroonosc_talib_kernel`
    in the fused pandas stage instead.
    """
    w = series_window(key_cols, ws_col)
    frame = w.rowsBetween(-n, 0)
    out = df.withColumn("_rn", _rn(w))
    idx_hi = F.max(F.struct(F.col(high_col).alias("v"), F.col("_rn").alias("i"))).over(frame)["i"]
    idx_lo = F.max(F.struct((-F.col(low_col)).alias("v"), F.col("_rn").alias("i"))).over(frame)["i"]
    valid = F.col("_rn") > F.lit(n)
    osc = F.when(valid, F.lit(100.0) * (idx_hi - idx_lo).cast("double") / F.lit(float(n)))
    return out.withColumn(out_col, osc).drop("_rn")


def with_ppo(
    df: DataFrame,
    close_col: str = "adj_close",
    fast: int = 12,
    slow: int = 26,
    key_cols: Sequence[str] = ("ticker",),
    ws_col: str = "window_start",
    out_col: str = "ppo",
) -> DataFrame:
    """Percentage Price Oscillator with **SMA** moving averages (W13):
    TA-Lib default matype=0 (``stockdata/indicators.py:288-289,
    447-457``). ``100 · (SMA_fast − SMA_slow) / SMA_slow`` on
    adj_close. First valid at row slow."""
    w = series_window(key_cols, ws_col)
    sma_fast = F.avg(close_col).over(w.rowsBetween(-(fast - 1), 0))
    sma_slow = F.avg(close_col).over(w.rowsBetween(-(slow - 1), 0))
    valid = _rn(w) >= F.lit(slow)
    ppo = F.when(valid, _safe_div(F.lit(100.0) * (sma_fast - sma_slow), sma_slow, on_zero=0.0))
    return df.withColumn(out_col, ppo)


def with_stochf(
    df: DataFrame,
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
    fastk: int = 5,
    fastd: int = 3,
    key_cols: Sequence[str] = ("ticker",),
    ws_col: str = "window_start",
    k_col: str = "sok",
    d_col: str = "sod",
) -> DataFrame:
    """Fast stochastic %K / %D (W14, ``stockdata/indicators.py:
    290-293,386-401``), unadjusted close.

    ``%K = 100·(C − LL_fastk)/(HH_fastk − LL_fastk)``;
    ``%D = SMA_fastd(%K)``. TA-Lib aligns *both* outputs to lookback
    ``(fastk−1)+(fastd−1)``, so both are null before that row.
    Zero range → 0 (TA-Lib convention).
    """
    w = series_window(key_cols, ws_col)
    ll = F.min(low_col).over(w.rowsBetween(-(fastk - 1), 0))
    hh = F.max(high_col).over(w.rowsBetween(-(fastk - 1), 0))
    raw_k = _safe_div(F.lit(100.0) * (F.col(close_col) - ll), hh - ll, on_zero=0.0)
    out = df.withColumn("_raw_k", F.when(_rn(w) >= F.lit(fastk), raw_k))
    sod = F.avg("_raw_k").over(w.rowsBetween(-(fastd - 1), 0))
    valid = _rn(w) >= F.lit(fastk + fastd - 1)
    return (
        out.withColumn(k_col, F.when(valid, F.col("_raw_k")))
        .withColumn(d_col, F.when(valid, sod))
        .drop("_raw_k")
    )


def with_cci(
    df: DataFrame,
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
    n: int = 14,
    key_cols: Sequence[str] = ("ticker",),
    ws_col: str = "window_start",
    out_col: str = "cci",
) -> DataFrame:
    """Commodity Channel Index (W16; dead code in the reference,
    ``stockdata/indicators.py:372-384``, kept for completeness).

    ``(tp − SMA_n(tp)) / (0.015 · meandev)`` where ``meandev`` is the
    mean absolute deviation from the *current* window's SMA — the SMA
    is fixed per output row, so it is not a plain nested window;
    computed via ``collect_list`` over the frame + a higher-order
    ``aggregate`` (still JVM-side, no Python).
    """
    w = series_window(key_cols, ws_col)
    frame = w.rowsBetween(-(n - 1), 0)
    tp = (F.col(high_col) + F.col(low_col) + F.col(close_col)) / F.lit(3.0)
    out = df.withColumn("_tp", tp)
    sma = F.avg("_tp").over(frame)
    lst = F.collect_list("_tp").over(frame)
    out = out.withColumn("_sma", sma).withColumn("_lst", lst)
    meandev = (
        F.aggregate(
            F.col("_lst"),
            F.lit(0.0),
            lambda acc, x: acc + F.abs(x - F.col("_sma")),
        )
        / F.lit(float(n))
    )
    valid = _rn(w) >= F.lit(n)
    cci = F.when(
        valid,
        F.when(meandev == F.lit(0.0), F.lit(0.0)).otherwise(
            (F.col("_tp") - F.col("_sma")) / (F.lit(0.015) * meandev)
        ),
    )
    return out.withColumn(out_col, cci).drop("_tp", "_sma", "_lst")


def with_rolling_robust(
    df: DataFrame,
    n: int = 20,
    close_col: str = "close",
    key_cols: Sequence[str] = ("ticker",),
    ws_col: str = "window_start",
) -> DataFrame:
    """Trailing-``n`` ROBUST price stats per series: lower-median, Q1,
    Q3, min, max of integer-cents close over ``ROWS n-1 PRECEDING``
    — the outlier-insensitive band (Donchian range + quartile spread)
    that a mean/σ Bollinger band is not.

    Quantiles are ORDER STATISTICS at integer ranks of the sorted
    window list (lower-median rank ``(m+1) div 2``, Q1 ``max(1,
    (m+1) div 4)``, Q3 ``min(m, (3*(m+1)) div 4)`` over m in-frame
    rows): every output is an exact BIGINT cent value actually
    present in the window, so there is no interpolation convention to
    match and the DuckDB replay is bit-identical. Window frames stay
    ≤ n rows; one shuffle per series key, shared with every other
    frame indicator.
    """
    w = series_window(key_cols, ws_col)
    frame = w.rowsBetween(-(n - 1), 0)
    cents = F.floor(F.col(close_col) * 100 + F.lit(0.5)).cast("long")
    out = df.withColumn("_c", cents)
    arr = F.array_sort(F.collect_list("_c").over(frame))
    out = out.withColumn("_arr", arr)
    m = F.size("_arr")
    return (
        out.withColumn("n_w", m.cast("long"))
        .withColumn("med_cents", F.element_at("_arr", F.expr("CAST((size(_arr) + 1) div 2 AS INT)")))
        .withColumn(
            "q1_cents",
            F.element_at("_arr", F.expr("CAST(greatest(1, (size(_arr) + 1) div 4) AS INT)")),
        )
        .withColumn(
            "q3_cents",
            F.element_at(
                "_arr",
                F.expr("CAST(least(size(_arr), (3 * (size(_arr) + 1)) div 4) AS INT)"),
            ),
        )
        .withColumn("min_cents", F.element_at("_arr", 1))
        .withColumn("max_cents", F.element_at("_arr", F.expr("size(_arr)")))
        .drop("_c", "_arr")
    )


def with_bollinger(
    df: DataFrame,
    close_col: str = "adj_close",
    n: int = 20,
    width: float = 2.0,
    key_cols: Sequence[str] = ("ticker",),
    ws_col: str = "window_start",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Bollinger bands: trailing-``n`` SMA ± ``width``·σ per series.

    Extension of the reference's frame-indicator family (SURVEY.md
    §2.5 style; the reference's TA-Lib dependency ships BBANDS but the
    pipeline never calls it — added here as the classic mean/σ band
    next to the robust quantile band of :func:`with_rolling_robust`).

    Exactness: the window aggregates are INTEGER sums of cents
    (``s = Σc``, ``ss = Σc²`` as BIGINT — order-free, so bit-equal in
    any engine), and mean/σ are derived from them in a fixed IEEE op
    sequence: ``var = (n·ss − s²) / (n·(n−1))`` in cent² (numerator
    exact in BIGINT), ``sd = sqrt(var)/100``, ``mean = s/(n·100)``.
    Sample (n−1) variance, matching the TA-Lib ``nbdev`` convention
    over a full window. First valid output at row ``n`` of each
    series. Frames stay ≤ n rows; one shuffle per series key, shared
    with every other frame indicator. Pass ``tiebreak_cols`` (a unique
    column) when ``(key, ws_col)`` is not unique by construction —
    see :func:`series_window`.
    """
    w = series_window(key_cols, ws_col, tiebreak_cols)
    frame = w.rowsBetween(-(n - 1), 0)
    cents = F.floor(F.col(close_col) * 100 + F.lit(0.5)).cast("long")
    out = df.withColumn("_bc", cents)
    s = F.sum("_bc").over(frame)
    ss = F.sum(F.col("_bc") * F.col("_bc")).over(frame)
    out = out.withColumn("_bs", s).withColumn("_bss", ss)
    var = (
        F.lit(n) * F.col("_bss") - F.col("_bs") * F.col("_bs")
    ).cast("double") / F.lit(float(n * (n - 1)))
    sd = F.sqrt(F.greatest(var, F.lit(0.0))) / F.lit(100.0)
    mean = F.col("_bs").cast("double") / F.lit(float(n * 100))
    upper = mean + F.lit(width) * sd
    lower = mean - F.lit(width) * sd
    valid = _rn(w) >= F.lit(n)
    return (
        out.withColumn("bb_mid", F.when(valid, mean))
        .withColumn("bb_upper", F.when(valid, upper))
        .withColumn("bb_lower", F.when(valid, lower))
        .withColumn(
            "bb_bandwidth",
            F.when(valid, _safe_div(upper - lower, mean, on_zero=0.0)),
        )
        .drop("_bc", "_bs", "_bss")
    )


def with_obv(
    df: DataFrame,
    close_col: str = "close",
    vol_col: str = "volume",
    key_cols: Sequence[str] = ("ticker",),
    ws_col: str = "window_start",
    out_col: str = "obv",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """On-balance volume: cumulative ±volume by close direction.

    TA-Lib convention: the first bar of each series contributes
    ``+volume``; later bars add ``+volume`` on an up-close, ``−volume``
    on a down-close, ``0`` when unchanged. The direction compare runs
    on integer cents and the running total sums integer volume units,
    so the whole column is BIGINT-exact (no float accumulation). One
    cumulative window — a single shuffle per series key, linear state.
    ``lag``/cumsum are order-sensitive: pass ``tiebreak_cols`` when
    ``(key, ws_col)`` is not unique (see :func:`series_window`).
    """
    w = series_window(key_cols, ws_col, tiebreak_cols)
    cents = F.floor(F.col(close_col) * 100 + F.lit(0.5)).cast("long")
    vol = F.floor(F.col(vol_col) + F.lit(0.5)).cast("long")
    out = df.withColumn("_oc", cents)
    prev = F.lag("_oc", 1).over(w)
    signed = (
        F.when(prev.isNull(), vol)
        .when(F.col("_oc") > prev, vol)
        .when(F.col("_oc") < prev, -vol)
        .otherwise(F.lit(0))
    )
    out = out.withColumn("_ov", signed)
    run = F.sum("_ov").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return out.withColumn(out_col, run).drop("_oc", "_ov")
