"""SCD2 history build (operators/scd.py)."""

from __future__ import annotations

import pandas as pd

from stock_indicators_etl_spark.operators.scd import scd2_history


def test_scd2_collapses_runs_and_numbers_versions(spark):
    events = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 1, 2, 2],
            "a": ["x", "x", "y", "y", "x", "z", "z"],
            "ts": [10, 20, 30, 40, 50, 5, 6],
        }
    )
    out = (
        scd2_history(spark.createDataFrame(events), "k", "a", "ts")
        .toPandas()
        .sort_values(["k", "version"])
        .reset_index(drop=True)
    )
    k1 = out[out.k == 1]
    assert list(k1.a) == ["x", "y", "x"]  # x run, y run, back to x
    assert list(k1.valid_from) == [10, 30, 50]
    assert list(k1.valid_to)[:2] == [30, 50]
    assert pd.isna(k1.valid_to.iloc[2])  # live row open-ended
    assert list(k1.version) == [1, 2, 3]
    k2 = out[out.k == 2]
    assert len(k2) == 1 and k2.iloc[0].valid_from == 5


def test_scd2_intervals_partition_each_key_timeline(spark):
    import numpy as np

    rng = np.random.default_rng(9)
    events = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "a": rng.choice(["p", "q", "r"], 200),
            "ts": rng.permutation(200),
        }
    )
    out = scd2_history(spark.createDataFrame(events), "k", "a", "ts").toPandas()
    for k, grp in out.groupby("k"):
        g = grp.sort_values("version")
        # contiguous: each valid_to equals the next valid_from
        assert (
            g.valid_to.iloc[:-1].values == g.valid_from.iloc[1:].values
        ).all()
        assert pd.isna(g.valid_to.iloc[-1])
        # no two consecutive runs share the attribute
        assert (g.a.iloc[:-1].values != g.a.iloc[1:].values).all()
