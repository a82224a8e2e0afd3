"""Indicator pipeline configuration.

Mirrors the semantics of the reference's pydantic
``GenerateIndicatorsConfig`` (``stockdata/indicators.py:97-143``):
column-name mapping, the ``momentum_features`` gating list, and the
indicator periods. Plain dataclass — no pydantic dependency.

Reference quirks preserved intentionally:
- ``close_column`` (default ``adj_close``) feeds ROCP/RSI/CMO/MACD/PPO
  and the ``close_price`` output, while ``close_un_adj_col`` (default
  ``close``) feeds MFI/ULTOSC/STOCHF/ADX/CCI
  (``indicators.py:112,269,345,362,395,468``).
- market close bound is **16:30** ET, not 16:00
  (``stockdata/utils.py:26-36``).
- ``scale`` / ``skip_na`` / ``interval`` exist in the reference config
  but are dead there (``indicators.py:134-135,103``); here ``skip_na``
  actually controls the final ``dropna`` and ``scale`` the ÷100/÷10
  scaling, defaulting to the reference's effective behavior (both on).
"""

from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_MOMENTUM_FEATURES = [
    "rsi",
    "mfi",
    "ultosc",
    "cmo",
    "aroonosc",
    "macd",
    "ppo",
    "sok",
    "adx",
]

#: Consecutive-row time gaps (seconds) that do NOT break a segment
#: (``stockdata/indicators.py:41-66``).
DEFAULT_ALLOWED_GAPS_S = (60, 120, 180)

NS_PER_S = 1_000_000_000


@dataclass
class IndicatorConfig:
    """Configuration for :func:`~stock_indicators_etl_spark.operators.pipeline.generate_indicators`."""

    # column mapping (indicators.py:106-113)
    ticker_column: str = "ticker"
    time_column: str = "window_start"  # int64 epoch-ns
    close_column: str = "adj_close"  # adjusted close → rocp/rsi/cmo/macd/ppo
    high_col: str = "high"
    low_col: str = "low"
    close_un_adj_col: str = "close"  # unadjusted close → mfi/ultosc/stochf/adx/cci
    vol_col: str = "volume"

    # which indicator families to compute (indicators.py:119-131)
    momentum_features: list[str] = field(
        default_factory=lambda: list(DEFAULT_MOMENTUM_FEATURES)
    )

    # periods (indicators.py:117,138-143 + TA-Lib 0.4.x defaults)
    num_prev_rocp: int = 6  # rocp_1..rocp_{n-1}
    rsi_timeperiod: int = 14
    mfi_timeperiod: int = 14
    ultosc_timeperiod1: int = 7
    ultosc_timeperiod2: int = 14
    ultosc_timeperiod3: int = 28
    cmo_timeperiod: int = 14
    aroonosc_timeperiod: int = 25
    macd_signal_period: int = 9
    ppo_fast: int = 12
    ppo_slow: int = 26
    stochf_fastk: int = 5
    stochf_fastd: int = 3
    adx_timeperiod: int = 14
    cci_timeperiod: int = 14
    mom_timeperiod: int = 10

    # time-grid semantics
    allowed_gaps_s: tuple[int, ...] = DEFAULT_ALLOWED_GAPS_S
    grid_step_s: int = 60
    min_segment_rows: int = 2

    # behavior toggles (effective reference behavior: both True)
    scale: bool = True
    skip_na: bool = True

    # AROONOSC tie semantics: False (default) = frame-expressible
    # argmax (most recent tied extreme wins — pure window expression,
    # no Python stage); True = TA-Lib's exact path-dependent walk
    # (strict rescan / non-strict incremental update; see
    # ``operators.kernels.aroonosc_talib_kernel``), computed in the
    # fused per-series pandas stage alongside the Wilder family. The
    # two differ only when an extreme value is exactly tied inside the
    # trailing window (cent-quantized prices, flat gap-fill stretches).
    strict_talib_ties: bool = False

    # market session bounds, wall-clock in `tz` (utils.py:26-36; the
    # 16:30 close is a reference quirk kept for parity)
    tz: str = "US/Eastern"
    market_open: str = "09:30:00"
    market_close: str = "16:30:00"

    def __post_init__(self) -> None:
        # validation parity with the reference's pydantic config
        # (indicators.py:97-143): fail fast on nonsense instead of
        # producing silently-wrong plans
        known = set(DEFAULT_MOMENTUM_FEATURES)
        unknown = [f for f in self.momentum_features if f not in known]
        if unknown:
            raise ValueError(
                f"unknown momentum_features {unknown}; valid: {sorted(known)}"
            )
        for name in (
            "num_prev_rocp", "rsi_timeperiod", "mfi_timeperiod",
            "ultosc_timeperiod1", "ultosc_timeperiod2", "ultosc_timeperiod3",
            "cmo_timeperiod", "aroonosc_timeperiod", "macd_signal_period",
            "ppo_fast", "ppo_slow", "stochf_fastk", "stochf_fastd",
            "adx_timeperiod", "cci_timeperiod", "mom_timeperiod",
            "grid_step_s", "min_segment_rows",
        ):
            if getattr(self, name) < 1:
                raise ValueError(f"{name} must be >= 1")
        if any(g % self.grid_step_s for g in self.allowed_gaps_s):
            raise ValueError(
                f"allowed_gaps_s {self.allowed_gaps_s} must be multiples of "
                f"grid_step_s={self.grid_step_s}"
            )

    @property
    def step_ns(self) -> int:
        return self.grid_step_s * NS_PER_S
