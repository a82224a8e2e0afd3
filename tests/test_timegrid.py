"""Unit tests for W1 segmentation, W2 gap-fill, W4 interpolation
(SURVEY.md §5 item 2: hand-computed golden frames)."""

from __future__ import annotations

import pandas as pd

from stock_indicators_etl_spark.operators.timegrid import (
    fill_gaps,
    interpolate_linear,
    market_hours_filter,
    regularity_violations,
    segment_series,
)

NS = 1_000_000_000


def _bars(spark, ts_s, ticker="T", values=None):
    rows = [
        {
            "ticker": ticker,
            "window_start": int(t) * NS,
            "adj_close": None if values and values[i] is None else float(values[i] if values else i + 1),
        }
        for i, t in enumerate(ts_s)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def seg(spark, ts_s, **kw):
    df = segment_series(_bars(spark, ts_s), key_cols=("ticker",), **kw)
    return (
        df.orderBy("window_start")
        .select("window_start", "segment_id", "sub_ticker")
        .toPandas()
    )


def test_segmentation_allowed_gaps_stay_one_segment(spark):
    # gaps 60, 120, 180 do not break (indicators.py:41-66)
    out = seg(spark, [0, 60, 180, 360, 420])
    assert set(out.segment_id) == {0}
    assert set(out.sub_ticker) == {"T-0"}


def test_segmentation_break_and_renumber(spark):
    # 300s gap breaks; both halves ≥2 rows → T-0, T-1
    out = seg(spark, [0, 60, 360, 420])
    assert list(out.segment_id) == [0, 0, 1, 1]
    assert list(out.sub_ticker) == ["T-0", "T-0", "T-1", "T-1"]


def test_segmentation_irregular_gap_breaks(spark):
    # 90s is NOT in {60,120,180} → break (reference quirk)
    out = seg(spark, [0, 90, 150])
    # row0 alone (dropped), rows 1-2 form surviving segment renumbered 0
    assert list(out.window_start // NS) == [90, 150]
    assert set(out.sub_ticker) == {"T-0"}


def test_segmentation_singleton_dropped(spark):
    # middle singleton between two breaks is dropped; kept segments
    # renumbered consecutively (indicators.py:186-193)
    out = seg(spark, [0, 60, 1000, 2000, 2060])
    assert list(out.window_start // NS) == [0, 60, 2000, 2060]
    assert list(out.sub_ticker) == ["T-0", "T-0", "T-1", "T-1"]


def test_gapfill_counts(spark):
    # 120s gap → 1 synthetic row; 180s gap → 2 (indicators.py:69-94)
    df = segment_series(_bars(spark, [0, 120, 300]), key_cols=("ticker",))
    out = fill_gaps(
        df, key_cols=("sub_ticker",), carry_cols=("ticker",), synthetic_col="synth"
    )
    pdf = out.orderBy("window_start").toPandas()
    assert list(pdf.window_start // NS) == [0, 60, 120, 180, 240, 300]
    assert list(pdf.synth) == [False, True, False, True, True, False]
    # synthetic rows carry key + ticker but null values
    assert pdf[pdf.synth].adj_close.isna().all()
    assert (pdf.ticker == "T").all()


def test_interpolation_interior_and_edges(spark):
    # pandas interpolate(limit_direction="both") parity:
    # [nan, nan, 2, nan, 6, nan] → [2, 2, 2, 4, 6, 6]  (SURVEY W4)
    df = _bars(spark, [0, 60, 120, 180, 240, 300], values=[None, None, 2, None, 6, None])
    out = interpolate_linear(df, ["adj_close"], key_cols=("ticker",))
    got = list(out.orderBy("window_start").toPandas().adj_close)
    assert got == [2.0, 2.0, 2.0, 4.0, 6.0, 6.0]


def test_interpolation_time_weighted(spark):
    # non-uniform spacing: value at 180 between (60→1.0, 240→4.0)
    df = _bars(spark, [60, 180, 240], values=[1.0, None, 4.0])
    out = interpolate_linear(df, ["adj_close"], key_cols=("ticker",))
    got = list(out.orderBy("window_start").toPandas().adj_close)
    assert got == [1.0, 3.0, 4.0]


def test_market_hours_filter_halfopen(spark):
    df = _bars(spark, [100, 200, 300])
    out = market_hours_filter(df, 100 * NS, 300 * NS)
    assert sorted(r.window_start // NS for r in out.collect()) == [100, 200]


def test_regularity_violations(spark):
    df = _bars(spark, [0, 60, 180])
    bad = regularity_violations(df, key_cols=("ticker",))
    assert [r.window_start // NS for r in bad.collect()] == [180]
