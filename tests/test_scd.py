"""SCD2 history build + group-wise OLS (operators/scd.py, stats.py)."""

from __future__ import annotations

import pandas as pd
import pytest

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


# ---------------------------------------------------------------------------
# group-wise OLS (operators/stats.py)
# ---------------------------------------------------------------------------


def test_ols_by_key_matches_numpy(spark):
    import numpy as np

    from stock_indicators_etl_spark.operators.stats import ols_by_key

    rng = np.random.default_rng(23)
    rows = []
    for key, (slope, icept) in {"a": (2.5, 10.0), "b": (-1.25, 3.0)}.items():
        x = np.arange(100)
        y = slope * x + icept + rng.normal(0, 0.5, 100)
        rows += [{"k": key, "x": int(xi), "y": float(yi)} for xi, yi in zip(x, y)]
    rows += [{"k": "flat", "x": 5, "y": 1.0}] * 10  # zero x variance
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = ols_by_key(df, "k", "x", "y").toPandas().set_index("k")

    for key in ("a", "b"):
        grp = pd.DataFrame([r for r in rows if r["k"] == key])
        yq = np.floor(grp.y * 100 + 0.5)  # operator quantizes y to cents
        fit = np.polyfit(grp.x, yq, 1)
        assert out.loc[key, "slope"] == pytest.approx(fit[0], rel=1e-9)
        assert out.loc[key, "intercept"] == pytest.approx(fit[1], rel=1e-6)
        assert abs(out.loc[key, "r"]) > 0.99
    assert pd.isna(out.loc["flat", "slope"])
    assert pd.isna(out.loc["flat", "r"])


def test_winsorize_stats_known_answer(spark):
    import numpy as np

    from stock_indicators_etl_spark.operators.stats import winsorize_stats

    # 1..100 in one group: p5=5.95, p95=95.05 (linear interp at (n-1)q)
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["g"] * 100, "v": np.arange(1.0, 101.0)})
    )
    out = winsorize_stats(df, "k", "v").toPandas().iloc[0]
    assert out.n == 100
    assert out.lo_bound == pytest.approx(5.95)
    assert out.hi_bound == pytest.approx(95.05)
    assert out.n_clipped_lo == 5 and out.n_clipped_hi == 5
    # clipped sum: 5*5.95 + sum(6..95) + 5*95.05 = 5555 -> cents
    expect = round((5 * 5.95 + sum(range(6, 96)) + 5 * 95.05) * 100)
    assert out.sum_clipped_cents == expect


def test_winsorize_approx_exact_at_high_accuracy(spark):
    """With accuracy >= group size the GK sketch is rank-exact and the
    bounds are actual data elements at the quantile_disc rank — the
    convention the winsorize_approx oracle relies on. Bounds must be
    members of the data and the clip counts within the exact rank
    band."""
    import numpy as np

    from stock_indicators_etl_spark.operators.stats import (
        winsorize_stats_approx,
    )

    rng = np.random.default_rng(7)
    vals = np.round(rng.uniform(0, 1000, 997), 2)
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * 500 + ["b"] * 497, "v": vals})
    )
    out = (
        winsorize_stats_approx(df, "k", "v", accuracy=100_000)
        .toPandas()
        .set_index("k")
    )
    pdf = pd.DataFrame({"k": ["a"] * 500 + ["b"] * 497, "v": vals})
    for key, grp in pdf.groupby("k"):
        row = out.loc[key]
        assert row.n == len(grp)
        # bounds are actual elements of the group
        assert (grp.v == row.lo_bound).any()
        assert (grp.v == row.hi_bound).any()
        # rank-exact: the element count strictly below lo_bound is the
        # largest rank <= 5% (ties included on the bound itself)
        assert row.n_clipped_lo <= int(0.05 * len(grp)) + 1
        assert row.n_clipped_hi <= int(0.05 * len(grp)) + 1
        # clipped sum within the bound-clipped envelope
        clipped = grp.v.clip(row.lo_bound, row.hi_bound)
        assert row.sum_clipped_cents == round((clipped * 100).round().sum())


def test_winsorize_approx_production_accuracy_near_exact(spark):
    """At the production accuracy default the approx bounds land
    within the documented 1/accuracy rank band of the exact bounds."""
    import numpy as np

    from stock_indicators_etl_spark.operators.stats import (
        winsorize_stats,
        winsorize_stats_approx,
    )

    rng = np.random.default_rng(11)
    vals = np.round(rng.normal(500, 100, 2000), 2)
    df = spark.createDataFrame(pd.DataFrame({"k": ["g"] * 2000, "v": vals}))
    exact = winsorize_stats(df, "k", "v").toPandas().iloc[0]
    approx = winsorize_stats_approx(df, "k", "v").toPandas().iloc[0]
    s = np.sort(vals)
    # rank band: 1/accuracy of n = 2000/10000 < 1 rank → the approx
    # bound is one of the two elements bracketing the exact quantile
    rank_lo = int(np.searchsorted(s, approx.lo_bound))
    rank_hi = int(np.searchsorted(s, approx.hi_bound))
    assert abs(rank_lo - 0.05 * 2000) <= 2
    assert abs(rank_hi - 0.95 * 2000) <= 2
    assert approx.n == exact.n == 2000
    assert abs(int(approx.n_clipped_lo) - int(exact.n_clipped_lo)) <= 2
    assert abs(int(approx.n_clipped_hi) - int(exact.n_clipped_hi)) <= 2


def test_snapshot_diff_classifies_all_change_types(spark):
    from stock_indicators_etl_spark.operators.dq import (
        snapshot_diff,
        snapshot_diff_summary,
    )

    old = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"], "n": [1, 2, 3, 4]}
        )
    )
    new = spark.createDataFrame(
        pd.DataFrame(
            {"k": [2, 3, 4, 5], "v": ["b", "C", "d", "e"], "n": [2, 3, 4, 5]}
        )
    )
    got = dict(
        (r["k"], r["change"])
        for r in snapshot_diff(old, new, "k").collect()
    )
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "unchanged",
        5: "added",
    }
    summ = {
        r["change"]: r["n"]
        for r in snapshot_diff_summary(old, new, "k").collect()
    }
    assert summ == {"removed": 1, "unchanged": 2, "changed": 1, "added": 1}
    # compare_cols restriction: v-only diff ignores n
    only_n = spark.createDataFrame(
        pd.DataFrame({"k": [2], "v": ["b"], "n": [99]})
    )
    got2 = dict(
        (r["k"], r["change"])
        for r in snapshot_diff(
            old.filter("k = 2"), only_n, "k", ["v"]
        ).collect()
    )
    assert got2 == {2: "unchanged"}
    # column-boundary safety: ("ab","c") vs ("a","bc") must CHANGE
    o3 = spark.createDataFrame(pd.DataFrame({"k": [9], "a": ["ab"], "b": ["c"]}))
    n3 = spark.createDataFrame(pd.DataFrame({"k": [9], "a": ["a"], "b": ["bc"]}))
    got3 = snapshot_diff(o3, n3, "k").collect()[0]["change"]
    assert got3 == "changed"


def test_dq_summary_and_referential(spark):
    from pyspark.sql import functions as F

    from stock_indicators_etl_spark.operators.dq import (
        dq_summary,
        referential_violations,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2, 3, 4],
                "v": [5.0, -1.0, None, 100.0],
                "fk": [10, 10, 99, None],
            }
        )
    )
    rules = {
        "negative": F.col("v") < 0,
        "too_big": F.col("v") > 50,
    }
    out = dq_summary(df, rules).toPandas().set_index("rule")
    assert (out.n_rows == 4).all()
    # null v is an unevaluable expectation -> counts as violation
    assert out.loc["negative", "n_violations"] == 2
    assert out.loc["too_big", "n_violations"] == 2
    assert out.loc["negative", "violation_rate_ppm"] == 500_000

    parent = spark.createDataFrame(pd.DataFrame({"pk": [10]}))
    orphans = referential_violations(df, parent, "fk", "pk").collect()[0]
    assert orphans.n_orphans == 2  # 99 and NULL


def test_dq_summary_rejects_empty_rules(spark):
    from stock_indicators_etl_spark.operators.dq import dq_summary

    df = spark.createDataFrame(pd.DataFrame({"x": [1]}))
    with pytest.raises(ValueError):
        dq_summary(df, {})


def test_streaming_scd2_matches_batch_closed_intervals(spark, tmp_path):
    """Two micro-batches; state survives the boundary (a run that
    spans files closes with the right valid_from/version), and the
    streaming closed intervals equal the batch operator's rows with
    valid_to set."""
    import os

    from stock_indicators_etl_spark.streaming.scd import streaming_scd2

    events = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 1, 2, 2, 2],
            "a": ["x", "x", "y", "y", "x", "p", "q", "q"],
            "ts": [10, 20, 30, 40, 50, 5, 15, 25],
        }
    )
    src = tmp_path / "scd_src"
    src.mkdir()
    f0, f1 = str(src / "p0.parquet"), str(src / "p1.parquet")
    events.iloc[:4].to_parquet(f0)   # k=1 'y' run starts in file 0...
    events.iloc[4:].to_parquet(f1)   # ...and closes in file 1
    os.utime(f0, (1_000_000_000, 1_000_000_000))
    os.utime(f1, (1_000_000_100, 1_000_000_100))

    stream = (
        spark.readStream.schema("k bigint, a string, ts bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_scd2(stream, "k", "a", "ts")
    q = (
        out.writeStream.format("memory")
        .queryName("sscd")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sscd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from sscd")
        .toPandas()
        .sort_values(["k", "version"])
        .reset_index(drop=True)
    )
    batch = (
        scd2_history(spark.createDataFrame(events), "k", "a", "ts")
        .toPandas()
    )
    closed = (
        batch[batch.valid_to.notna()]
        .astype({"valid_to": "int64"})
        .sort_values(["k", "version"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "a", "valid_from", "valid_to", "version"]],
        closed[["k", "a", "valid_from", "valid_to", "version"]],
        check_dtype=False,
    )
    # the cross-file 'y' run closed with the right boundaries
    y = got[(got.k == 1) & (got.a == "y")].iloc[0]
    assert (y.valid_from, y.valid_to, y.version) == (30, 50, 2)


def test_apply_cdc_merge_semantics(spark):
    from stock_indicators_etl_spark.operators.scd import apply_cdc

    base = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]}
        )
    )
    changes = spark.createDataFrame(
        pd.DataFrame(
            {
                # k=1 updated twice (last wins), k=2 update then delete
                # (delete wins), k=5 inserted, k=3/4 untouched
                "k": [1, 1, 2, 2, 5],
                "v": ["a1", "a2", "b1", None, "e"],
                "seq": [1, 2, 1, 3, 4],
                "op": ["U", "U", "U", "D", "I"],
            }
        )
    )
    got = {
        r["k"]: r["v"]
        for r in apply_cdc(base, changes, "k", "seq").collect()
    }
    assert got == {1: "a2", 3: "c", 4: "d", 5: "e"}


def test_apply_cdc_empty_changelog_is_identity(spark):
    from stock_indicators_etl_spark.operators.scd import apply_cdc

    base = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    empty = spark.createDataFrame(
        [], schema="k bigint, v string, seq bigint, op string"
    )
    got = sorted(
        (r["k"], r["v"]) for r in apply_cdc(base, empty, "k", "seq").collect()
    )
    assert got == [(1, "a"), (2, "b")]


def test_mad_outliers_flags_known_points(spark):
    from stock_indicators_etl_spark.operators.stats import mad_outliers

    # k=A: tight cluster around 10 with one wild point; k=B: uniform
    vals_a = [9.0, 9.5, 10.0, 10.5, 11.0, 100.0]
    vals_b = [1.0, 2.0, 3.0, 4.0, 5.0]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["A"] * len(vals_a) + ["B"] * len(vals_b),
                "v": vals_a + vals_b,
            }
        )
    )
    got = {r["k"]: r for r in mad_outliers(df, "k", "v").collect()}
    # A: median 10.25, MAD ~0.75 → only 100.0 exceeds 3·MAD
    assert got["A"]["n_outliers"] == 1
    assert got["A"]["n"] == 6
    # B: median 3, MAD 1 → max |dev| = 2 < 3 → none
    assert got["B"]["n_outliers"] == 0


def test_equi_width_histogram_buckets_and_bounds(spark):
    from stock_indicators_etl_spark.operators.stats import (
        equi_width_histogram,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"v": [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]})
    )
    out = {
        r["bucket"]: r for r in equi_width_histogram(df, "v", nbins=4).collect()
    }
    # range [0,700] cents, width 701/4 → each pair of consecutive
    # values lands together; max value goes to the LAST bucket
    assert sorted(out) == [0, 1, 2, 3]
    assert sum(r["n"] for r in out.values()) == 8
    assert out[3]["hi"] == 7.0
    assert out[0]["lo"] == 0.0
    # exact integer sum check: bucket sums partition the total
    assert sum(r["sum_cents"] for r in out.values()) == 2800


def test_time_weighted_avg_holds_until_next(spark):
    from stock_indicators_etl_spark.operators.stats import (
        time_weighted_avg,
    )

    NS = 10**9
    # value 10 held 30s, value 20 held 10s, final value 99 unweighted
    rows = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b"],
            "ts": [0, 30 * NS, 40 * NS, 5 * NS],
            "v": [10.0, 20.0, 99.0, 7.0],
        }
    )
    out = {
        r["k"]: r
        for r in time_weighted_avg(
            spark.createDataFrame(rows), "k", "ts", "v"
        ).collect()
    }
    assert out["a"]["span_s"] == 40
    assert out["a"]["twap"] == pytest.approx((10 * 30 + 20 * 10) / 40)
    # single observation → no holding interval → null
    assert out["b"]["n"] == 1 and out["b"]["twap"] is None


def test_apply_cdc_random_log_matches_sequential_replay(spark):
    import numpy as np

    from stock_indicators_etl_spark.operators.scd import apply_cdc

    rng = np.random.default_rng(41)
    base = {int(k): f"b{k}" for k in range(30)}
    ops = []
    for seq in range(120):
        k = int(rng.integers(0, 45))  # keys beyond base → inserts
        op = rng.choice(["U", "D", "I"], p=[0.5, 0.25, 0.25])
        ops.append({"k": k, "v": f"v{seq}", "seq": seq, "op": str(op)})
    # python replay: ordered fold of last-wins semantics
    state = dict(base)
    for row in ops:
        if row["op"] == "D":
            state.pop(row["k"], None)
        else:
            state[row["k"]] = row["v"]
    got = {
        r["k"]: r["v"]
        for r in apply_cdc(
            spark.createDataFrame(
                pd.DataFrame(list(base.items()), columns=["k", "v"])
            ),
            spark.createDataFrame(pd.DataFrame(ops)),
            "k",
            "seq",
        ).collect()
    }
    assert got == state


def test_time_weighted_avg_matches_pandas_replay(spark):
    import numpy as np

    from stock_indicators_etl_spark.operators.stats import (
        time_weighted_avg,
    )

    rng = np.random.default_rng(17)
    NS = 10**9
    rows = []
    for k in ("x", "y", "z"):
        ts = np.sort(rng.choice(np.arange(0, 5000), 60, replace=False)) * NS
        vals = np.round(rng.uniform(1, 500, 60), 2)
        rows += [
            {"k": k, "ts": int(t), "v": float(v)} for t, v in zip(ts, vals)
        ]
    pdf = pd.DataFrame(rows)
    out = {
        r["k"]: r
        for r in time_weighted_avg(
            spark.createDataFrame(pdf), "k", "ts", "v"
        ).collect()
    }
    for k, grp in pdf.groupby("k"):
        g = grp.sort_values("ts")
        dt = (g.ts.diff().shift(-1).dropna() // NS).astype(int)
        cents = np.floor(g.v * 100 + 0.5).astype(int)[:-1]
        want = (cents.values * dt.values).sum() / dt.sum() / 100.0
        assert out[k]["twap"] == pytest.approx(want, rel=1e-12)
        assert out[k]["span_s"] == dt.sum()


# ---------------------------------------------------------------------------
# two-pass histogram exact median
# ---------------------------------------------------------------------------


def test_exact_median_hist_matches_numpy_lower_median(spark):
    import numpy as np

    from stock_indicators_etl_spark.operators.stats import exact_median_hist

    rng = np.random.default_rng(81)
    rows = []
    for key, n in (("a", 101), ("b", 100), ("c", 1), ("d", 2)):
        vals = rng.normal(scale=50, size=n)  # negatives included
        rows += [(key, float(v)) for v in vals]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["event_type", "value"]))
    for bw in (1, 7, 100, 10**9):
        got = {
            r["event_type"]: (r["n"], r["median_cents"])
            for r in exact_median_hist(df, bin_width=bw).collect()
        }
        pdf = pd.DataFrame(rows, columns=["k", "v"])
        for key, sub in pdf.groupby("k"):
            cents = np.sort(np.floor(sub["v"].to_numpy() * 100 + 0.5).astype(np.int64))
            m = len(cents)
            want = int(cents[(m + 1) // 2 - 1])  # lower median
            assert got[key] == (m, want), f"bw={bw} key={key}"


def test_exact_median_hist_no_global_sort_in_plan(spark):
    import numpy as np

    from stock_indicators_etl_spark.operators.stats import exact_median_hist

    rng = np.random.default_rng(82)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"event_type": ["x"] * 50, "value": rng.normal(size=50)}
        )
    )
    plan = (
        exact_median_hist(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the only sort is array_sort over the ONE target bin's values —
    # no per-key Sort operator over the full input
    assert "percentile" not in plan.lower()


def test_exact_quantiles_hist_matches_numpy_ceil_np_ranks(spark):
    import numpy as np

    from stock_indicators_etl_spark.operators.stats import exact_quantiles_hist

    rng = np.random.default_rng(83)
    rows = []
    for key, n in (("a", 97), ("b", 40), ("c", 3)):
        rows += [(key, float(v)) for v in rng.normal(scale=30, size=n)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["event_type", "value"]))
    probs = ((1, 4), (1, 2), (3, 4), (99, 100))
    got = {
        r["event_type"]: r
        for r in exact_quantiles_hist(df, probs=probs, bin_width=13).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    for key, sub in pdf.groupby("k"):
        cents = np.sort(np.floor(sub["v"].to_numpy() * 100 + 0.5).astype(np.int64))
        m = len(cents)
        for num, den in probs:
            rank = (m * num + den - 1) // den  # ceil(m*p)
            want = int(cents[rank - 1])
            assert got[key][f"q{num}_{den}_cents"] == want, (key, num, den)
        assert got[key]["n"] == m


def test_winsorize_hist_bounds_are_data_values_and_counts_sane(spark):
    import numpy as np

    from stock_indicators_etl_spark.operators.stats import (
        winsorize_stats,
        winsorize_stats_hist,
    )

    rng = np.random.default_rng(84)
    vals = np.round(rng.normal(scale=40, size=400), 2)
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["g"] * 400, "v": vals.astype(float)})
    )
    hist = winsorize_stats_hist(df, "k", "v").collect()[0]
    cents = np.floor(vals * 100 + 0.5).astype(np.int64)
    # discrete bounds must be actual data values (cents/100)
    assert int(round(hist["lo_bound"] * 100)) in set(cents)
    assert int(round(hist["hi_bound"] * 100)) in set(cents)
    # ~5% clipped each side (discrete rank: ceil(0.05*400)=20 →
    # 19 strictly below the 20th order statistic at distinct values)
    assert 10 <= hist["n_clipped_lo"] <= 30
    assert 10 <= hist["n_clipped_hi"] <= 30
    # close to the interpolated-bounds exact twin
    exact = winsorize_stats(df, "k", "v").collect()[0]
    assert abs(hist["sum_clipped_cents"] - exact["sum_clipped_cents"]) <= abs(
        exact["sum_clipped_cents"]
    ) * 0.01 + 10_000


def test_histogram_drift_tvd_known_answers(spark):
    import numpy as np

    from stock_indicators_etl_spark.operators.dq import histogram_drift

    def mk(key, vals):
        return pd.DataFrame({"event_type": key, "value": [float(v) for v in vals]})

    # identical distributions → TVD 0
    same = list(range(100))
    a = spark.createDataFrame(pd.concat([mk("id", same), mk("dis", same)]))
    b = spark.createDataFrame(
        pd.concat([mk("id", same), mk("dis", [v + 1000 for v in same])])
    )
    got = {
        r["event_type"]: r for r in histogram_drift(a, b, n_bins=8).collect()
    }
    assert got["id"]["tvd"] == 0.0
    # disjoint ranges → every bin one-sided → TVD 1
    assert got["dis"]["tvd"] == 1.0
    assert got["dis"]["l1_scaled"] == 2 * 100 * 100

    # numpy replica on a random mixed case
    rng = np.random.default_rng(92)
    va = rng.normal(size=300)
    vb = rng.normal(loc=0.8, size=200)
    a = spark.createDataFrame(mk("m", va))
    b = spark.createDataFrame(mk("m", vb))
    r = histogram_drift(a, b, n_bins=16).collect()[0]
    ca_ = np.floor(va * 100 + 0.5).astype(np.int64)
    cb_ = np.floor(vb * 100 + 0.5).astype(np.int64)
    mn, mx = min(ca_.min(), cb_.min()), max(ca_.max(), cb_.max())
    bins_a = (ca_ - mn) * 16 // (mx - mn + 1)
    bins_b = (cb_ - mn) * 16 // (mx - mn + 1)
    l1 = sum(
        abs(int((bins_a == i).sum()) * 200 - int((bins_b == i).sum()) * 300)
        for i in range(16)
    )
    assert r["l1_scaled"] == l1
    assert r["tvd"] == l1 / (2.0 * 300.0 * 200.0)


def test_histogram_drift_one_sided_key(spark):
    from stock_indicators_etl_spark.operators.dq import histogram_drift

    a = spark.createDataFrame(
        pd.DataFrame({"event_type": ["only_a"] * 5, "value": [1.0, 2, 3, 4, 5]})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"event_type": ["x"], "value": [9.0]})
    ).filter("event_type <> 'x'")  # empty b
    r = histogram_drift(a, b).collect()[0]
    assert r["tvd"] == 1.0 and r["n_b"] == 0


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    from stock_indicators_etl_spark.operators.stats import corr_matrix

    rng = np.random.default_rng(93)
    n = 300
    x = rng.normal(size=n)
    rows = pd.DataFrame(
        {
            "k": ["g"] * n,
            "f1": x,
            "f2": x * 2 + rng.normal(scale=0.1, size=n),  # strongly +corr
            "f3": -x + rng.normal(scale=0.5, size=n),     # -corr
            "f4": [5.0] * n,                               # zero variance
        }
    )
    out = corr_matrix(
        spark.createDataFrame(rows),
        "k",
        {"f1": ("f1", 1000), "f2": ("f2", 1000), "f3": ("f3", 1000), "f4": ("f4", 1000)},
    ).toPandas().set_index(["feat_a", "feat_b"])
    assert len(out) == 6
    q = {c: np.floor(rows[c].to_numpy() * 1000 + 0.5) for c in ("f1", "f2", "f3")}
    want12 = np.corrcoef(q["f1"], q["f2"])[0, 1]
    want13 = np.corrcoef(q["f1"], q["f3"])[0, 1]
    assert abs(out.loc[("f1", "f2")]["corr"] - want12) < 1e-9
    assert abs(out.loc[("f1", "f3")]["corr"] - want13) < 1e-9
    assert out.loc[("f1", "f2")]["corr"] > 0.99
    assert out.loc[("f1", "f3")]["corr"] < -0.5
    # degenerate feature: every pair with f4 is NULL
    assert pd.isna(out.loc[("f1", "f4")]["corr"])
    assert pd.isna(out.loc[("f2", "f4")]["corr"])


def test_streaming_drift_batch_parity(spark, tmp_path):
    """Streaming TVD vs a fixed baseline: the freshest emission after
    two micro-batches EQUALS batch histogram_drift(baseline, union)
    when the stream stays inside the baseline's value range."""
    import os

    import numpy as np

    from stock_indicators_etl_spark.operators.dq import histogram_drift
    from stock_indicators_etl_spark.streaming.drift import (
        baseline_profile,
        streaming_histogram_drift,
    )

    rng = np.random.default_rng(94)
    # baseline covers [0, 100]; stream values strictly inside
    base_rows = pd.DataFrame(
        {
            "event_type": ["t"] * 202,
            "value": [0.0, 100.0] + list(rng.uniform(1, 99, size=200)),
        }
    )
    stream_rows = pd.DataFrame(
        {
            "doc_id": range(120),
            "event_type": ["t"] * 120,
            "value": rng.uniform(30, 70, size=120),  # drifted, in-range
        }
    )
    base_df = spark.createDataFrame(base_rows)
    prof = baseline_profile(base_df, "event_type", "value", n_bins=8)

    src = tmp_path / "drift_src"
    src.mkdir()
    f0, f1 = str(src / "p0.parquet"), str(src / "p1.parquet")
    stream_rows.iloc[:60].to_parquet(f0)
    stream_rows.iloc[60:].to_parquet(f1)
    os.utime(f0, (1_000_000_000, 1_000_000_000))
    os.utime(f1, (1_000_000_100, 1_000_000_100))

    stream = (
        spark.readStream.schema("doc_id bigint, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_histogram_drift(stream, prof, "event_type", "value", n_bins=8)
    q = (
        out.writeStream.format("memory")
        .queryName("sdrift")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_sdrift"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sdrift").toPandas()
    assert len(got) == 2  # one emission per trigger
    last = got[got.n_b == got.n_b.max()].iloc[0]
    assert last.n_b == 120 and last.n_clamped == 0

    batch = histogram_drift(
        base_df, spark.createDataFrame(stream_rows), ("event_type",), "value", n_bins=8
    ).collect()[0]
    # in-range stream → union bounds == baseline bounds → exact parity
    assert int(last.l1_scaled) == batch["l1_scaled"]
    assert float(last.tvd) == batch["tvd"]
    assert float(last.tvd) > 0.2  # the drift is real
