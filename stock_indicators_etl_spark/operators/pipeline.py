"""End-to-end indicator pipeline (SURVEY.md §3 E2, §2.5 W17).

Re-expresses the reference's per-ticker Python loop
(``data_indicators.py:48-62`` → ``stockdata/indicators.py:213-304``)
as ONE lazy DataFrame program:

    read bars
      → market-hours filter (P7)           [pushed-down long predicate]
      → segmentation (W1)                   [shuffle 1: ticker]
      → gap-fill (W2) + volume cast (P8)
      → interpolate nulls (W4)              [shuffle 2: sub_ticker]
      → frame indicators (W5,W8,W9,W11,W13,W14)   [same partitioning]
      → recursive indicators (W7,W10,W12,W15)      [applyInPandas,
                                                    reuses partitioning]
      → feature assembly + scaling + dropna (W17, P9, P10)

Output schema and column order match the reference exactly
(``stockdata/indicators.py:267-304``): ``window_start`` int64-ns,
``close_price`` (= adj_close), ``rocp_1..5``, gated indicator columns,
``ticker`` = sub-ticker label ``"{ticker}-{i}"``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_indicators_etl_spark.config import IndicatorConfig
from stock_indicators_etl_spark.functions.timefns import market_bounds_ns
from stock_indicators_etl_spark.operators.recursive import with_recursive_indicators
from stock_indicators_etl_spark.operators.rolling import (
    with_aroonosc,
    with_mfi,
    with_ppo,
    with_rocp,
    with_stochf,
    with_ultosc,
)
from stock_indicators_etl_spark.operators.timegrid import (
    fill_gaps,
    interpolate_linear,
    market_hours_filter,
    segment_series,
)


def prepare_grid(
    df: DataFrame,
    cfg: IndicatorConfig,
    date: str | None = None,
    extra_segment_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Filter → segment → gap-fill → interpolate: the 60s-regular grid
    per sub-ticker, all values non-null (reference
    ``indicators.py:213-264``).

    ``extra_segment_keys``: additional columns in the segmentation
    partition key (and thus the sub_ticker label) — multi-day jobs
    pass a derived day column so segment numbering restarts per day,
    matching a sequence of single-day runs (ADVICE r1)."""
    tick, ws = cfg.ticker_column, cfg.time_column
    df = df.filter(F.col(tick).isNotNull())  # P6, data_indicators.py:49-50
    if date is not None:
        lo, hi = market_bounds_ns(date, cfg.tz, cfg.market_open, cfg.market_close)
        df = market_hours_filter(df, lo, hi, ws)
    df = segment_series(
        df,
        key_cols=(tick, *extra_segment_keys),
        ws_col=ws,
        allowed_gaps_s=cfg.allowed_gaps_s,
        min_rows=cfg.min_segment_rows,
        sub_key_col="sub_ticker",
    )
    df = fill_gaps(
        df,
        key_cols=("sub_ticker",),
        ws_col=ws,
        step_ns=cfg.step_ns,
        carry_cols=(tick, "segment_id"),
    )
    df = df.withColumn(cfg.vol_col, F.col(cfg.vol_col).cast("double"))  # P8
    value_cols = [
        c
        for c in (
            cfg.close_column,
            cfg.high_col,
            cfg.low_col,
            cfg.close_un_adj_col,
            cfg.vol_col,
            "open",
        )
        if c in df.columns
    ]
    return interpolate_linear(df, value_cols, key_cols=("sub_ticker",), ws_col=ws)


def generate_indicators(
    df: DataFrame,
    cfg: IndicatorConfig | None = None,
    date: str | None = None,
    assume_regular: bool = False,
    extra_segment_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Full reference-parity indicator pipeline (E2).

    ``date`` (YYYY-MM-DD): apply the market-hours filter for that day
    (omit for pre-filtered/backtest data).

    ``assume_regular``: skip the time-grid stages (segmentation /
    gap-fill / interpolation) and treat each ticker's series as one
    regular segment — for already-gridded or generic ordered series.

    ``extra_segment_keys``: see :func:`prepare_grid` — day-scoped
    segment numbering for multi-day (backfill) inputs.
    """
    cfg = cfg or IndicatorConfig()
    ws = cfg.time_column
    key = ("sub_ticker",)
    if assume_regular:
        grid = df.filter(F.col(cfg.ticker_column).isNotNull()).withColumn(
            "sub_ticker", F.concat_ws("-", F.col(cfg.ticker_column).cast("string"), F.lit("0"))
        )
    else:
        grid = prepare_grid(df, cfg, date, extra_segment_keys)

    feats = list(cfg.momentum_features)
    scale = F.lit(100.0) if cfg.scale else F.lit(1.0)
    macd_scale = F.lit(10.0) if cfg.scale else F.lit(1.0)

    # tracked at each dispatch site (not a parallel feature list):
    # True iff some window expression actually installed the
    # partitionBy(sub_ticker).orderBy(ws) layout the recursive pandas
    # stage may rely on
    window_ran = cfg.num_prev_rocp > 1
    out = with_rocp(
        grid,
        close_col=cfg.close_column,
        ks=range(1, cfg.num_prev_rocp),
        key_cols=key,
        ws_col=ws,
    )
    if "mfi" in feats:
        window_ran = True
        out = with_mfi(
            out, cfg.high_col, cfg.low_col, cfg.close_un_adj_col, cfg.vol_col,
            n=cfg.mfi_timeperiod, key_cols=key, ws_col=ws, out_col="_mfi_raw",
        )
    if "ultosc" in feats:
        window_ran = True
        out = with_ultosc(
            out, cfg.high_col, cfg.low_col, cfg.close_un_adj_col,
            n1=cfg.ultosc_timeperiod1, n2=cfg.ultosc_timeperiod2,
            n3=cfg.ultosc_timeperiod3, key_cols=key, ws_col=ws, out_col="_ultosc_raw",
        )
    if "aroonosc" in feats and not cfg.strict_talib_ties:
        window_ran = True
        out = with_aroonosc(
            out, cfg.high_col, cfg.low_col, n=cfg.aroonosc_timeperiod,
            key_cols=key, ws_col=ws, out_col="_aroonosc_raw",
        )
    if "ppo" in feats:
        window_ran = True
        out = with_ppo(
            out, cfg.close_column, fast=cfg.ppo_fast, slow=cfg.ppo_slow,
            key_cols=key, ws_col=ws, out_col="_ppo_raw",
        )
    if "sok" in feats:
        window_ran = True
        out = with_stochf(
            out, cfg.high_col, cfg.low_col, cfg.close_un_adj_col,
            fastk=cfg.stochf_fastk, fastd=cfg.stochf_fastd,
            key_cols=key, ws_col=ws, k_col="_sok_raw", d_col="_sod_raw",
        )
    recursive_feats = [f for f in ("rsi", "cmo", "macd", "adx") if f in feats]
    if cfg.strict_talib_ties and "aroonosc" in feats:
        # TA-Lib's path-dependent tie rule is a sequential per-series
        # scan — ride the same fused pandas stage as the Wilder family
        # (zero extra shuffles; the stage already receives whole
        # time-sorted series)
        recursive_feats.append("aroonosc")
    if recursive_feats:
        out = with_recursive_indicators(
            out,
            close_col=cfg.close_column,
            high_col=cfg.high_col,
            low_col=cfg.low_col,
            close_unadj_col=cfg.close_un_adj_col,
            key_cols=key,
            ws_col=ws,
            rsi_n=cfg.rsi_timeperiod,
            cmo_n=cfg.cmo_timeperiod,
            macd_signal=cfg.macd_signal_period,
            adx_n=cfg.adx_timeperiod,
            aroonosc_n=cfg.aroonosc_timeperiod,
            features=recursive_feats,
            # skipping the repartition avoids a second full shuffle,
            # but only when a window op above actually ran
            pre_partitioned=window_ran,
        )

    # W17 feature assembly: exact reference column order
    # (indicators.py:267-304); scaled per P10; `adx`/`adx_hist` name
    # swap per indicators.py:294-297.
    cols: list = [
        F.col(ws).alias("window_start"),
        F.col(cfg.close_column).alias("close_price"),
    ]
    cols += [F.col(f"rocp_{k}") for k in range(1, cfg.num_prev_rocp)]
    for f in feats:
        if f == "rsi":
            cols.append((F.col("rsi") / scale).alias("rsi"))
        elif f == "mfi":
            cols.append((F.col("_mfi_raw") / scale).alias("mfi"))
        elif f == "ultosc":
            cols.append((F.col("_ultosc_raw") / scale).alias("ultosc"))
        elif f == "cmo":
            cols.append((F.col("cmo") / scale).alias("cmo"))
        elif f == "aroonosc":
            src = "aroonosc_strict" if cfg.strict_talib_ties else "_aroonosc_raw"
            cols.append((F.col(src) / scale).alias("aroonosc"))
        elif f == "macd":
            cols.append((F.col("macd_hist") / macd_scale).alias("macd_hist"))
        elif f == "ppo":
            cols.append((F.col("_ppo_raw") / scale).alias("ppo"))
        elif f == "sok":
            cols.append((F.col("_sok_raw") / scale).alias("sok"))
            cols.append(((F.col("_sok_raw") - F.col("_sod_raw")) / scale).alias("sok_hist"))
        elif f == "adx":
            cols.append((F.col("adx") / scale).alias("adx"))
            cols.append((F.col("adx_di_diff") / scale).alias("adx_hist"))
    cols.append(F.col("sub_ticker").alias("ticker"))
    result = out.select(*cols)
    if cfg.skip_na:
        result = result.na.drop("any")  # P9, indicators.py:301-302
    return result
