"""drawdown / cross-sectional rank / rolling beta (r7g wave):
pandas-loop references over randomized series, plus the closed-form
property for drawdown."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _events_df(spark, n_users=5, n=120, seed=13):
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        p = 100.0
        for t in range(n):
            p *= 1 + rng.normal(0, 0.01)
            rows.append((u, (t * 600 + u) * 10**9, t * n_users + u, round(p, 2)))
    pdf = pd.DataFrame(rows, columns=["user_id", "ns", "event_id", "value"])
    return spark.createDataFrame(pdf), pdf


class TestDrawdown:
    def test_matches_loop(self, spark, tmp_path):
        from stock_indicators_etl_spark.queries import q_drawdown

        out = q_drawdown(spark, "/root/testdata/sf0.001").toPandas()
        ev = (
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            .toPandas()
        )
        # replicate on one user
        u = out.ticker.iloc[0]
        g = ev[ev.user_id.astype(str) == u].sort_values("ts")
        cents = np.floor(g.value * 100 + 0.5).astype("int64").values
        peak, best, best_i = -(10**18), -1, 0
        run_peak = []
        for i, c in enumerate(cents):
            peak = max(peak, c)
            run_peak.append(peak)
            if peak - c > best:
                best, best_i = peak - c, i
        row = out[out.ticker == u].iloc[0]
        assert row.max_dd_cents == best
        assert row.peak_cents == run_peak[best_i]
        assert row.trough_cents == cents[best_i]

    def test_monotone_series_zero_dd(self, spark):
        from pyspark.sql import functions as F

        rows = [("T", i * 10**9, 10.0 + i) for i in range(10)]
        df = spark.createDataFrame(rows, "ticker string, window_start long, adj_close double")
        # reuse operator logic through the same expressions
        from pyspark.sql import Window

        w = Window.partitionBy("ticker").orderBy("window_start")
        cum = w.rowsBetween(Window.unboundedPreceding, 0)
        cents = F.floor(F.col("adj_close") * 100 + F.lit(0.5)).cast("long")
        d = df.select("ticker", "window_start", cents.alias("c"))
        d = d.withColumn("dd", F.max("c").over(cum) - F.col("c"))
        assert d.agg(F.max("dd")).collect()[0][0] == 0


class TestCrossSectionalRank:
    def test_rank_consistency(self, spark):
        from stock_indicators_etl_spark.queries import q_cross_sectional_rank

        out = q_cross_sectional_rank(spark, "/root/testdata/sf0.001").toPandas()
        # within every bucket: ranks are 1..n, pct in [0,1], cents
        # non-increasing with rank
        for b, g in out.groupby("bucket"):
            g = g.sort_values("rk")
            assert list(g.rk) == list(range(1, len(g) + 1))
            assert (g.n_universe == len(g)).all()
            assert (np.diff(g.close_cents) <= 0).all()
            assert g.pct.between(0, 1).all()


class TestRollingBeta:
    def test_matches_numpy_reference(self, spark):
        from stock_indicators_etl_spark.queries import (
            BETA_W,
            XS_BUCKET_NS,
            q_rolling_beta,
        )

        out = q_rolling_beta(spark, "/root/testdata/sf0.001").toPandas()
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").toPandas()
        ev["ns"] = (ev.ts.astype("int64") // 1000) * 1000
        ev["c"] = np.floor(ev.value * 100 + 0.5).astype("int64")
        ev["bucket"] = ev.ns // XS_BUCKET_NS
        last = (
            ev.sort_values(["ns", "event_id"])
            .groupby(["user_id", "bucket"])
            .last()
            .reset_index()[["user_id", "bucket", "c"]]
        )
        market = last.groupby("bucket").c.sum().rename("y").reset_index()
        xy = last.merge(market, on="bucket")
        # pick the user with the most buckets
        u = xy.user_id.value_counts().idxmax()
        g = xy[xy.user_id == u].sort_values("bucket").reset_index(drop=True)
        got = (
            out[out.user_id == u].sort_values("bucket").reset_index(drop=True)
        )
        assert len(got) == len(g)
        for i in range(len(g)):
            if i + 1 < BETA_W:
                assert pd.isna(got.beta.iloc[i])
                continue
            wd = g.iloc[i - BETA_W + 1 : i + 1]
            sx, sy = int(wd.c.sum()), int(wd.y.sum())
            sxy = int((wd.c * wd.y).sum())
            syy = int((wd.y * wd.y).sum())
            den = BETA_W * syy - sy * sy
            if den == 0:
                assert pd.isna(got.beta.iloc[i])
            else:
                want = (BETA_W * sxy - sx * sy) / den
                assert got.beta.iloc[i] == pytest.approx(want, abs=1e-6)


class TestStreamingDrawdown:
    def test_matches_batch_across_batches(self, spark, tmp_path):
        import os

        from stock_indicators_etl_spark.streaming.drawdown import (
            streaming_drawdown,
        )

        rng = np.random.default_rng(19)
        rows = []
        for key in (1, 2):
            p = 10000
            for t in range(60):
                p += int(rng.integers(-300, 280))
                rows.append((key, t, p))
        pdf = pd.DataFrame(rows, columns=["key", "ts", "cents"])
        src = tmp_path / "dd_src"
        src.mkdir()
        f0, f1 = str(src / "p0.parquet"), str(src / "p1.parquet")
        pdf[pdf.ts < 30].to_parquet(f0)
        pdf[pdf.ts >= 30].to_parquet(f1)
        os.utime(f0, (1_000_000_000, 1_000_000_000))
        os.utime(f1, (1_000_000_100, 1_000_000_100))

        stream = (
            spark.readStream.schema("key bigint, ts bigint, cents bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = streaming_drawdown(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("sdd")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_sdd"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = (
            spark.sql("select * from sdd")
            .toPandas()
            .sort_values(["key", "n_seen"])
            .groupby("key")
            .last()  # freshest emission per key
        )
        for key, g in pdf.groupby("key"):
            g = g.sort_values("ts")
            peak, best, bp, bt, bts = None, -1, None, None, None
            for t, c in zip(g.ts, g.cents):
                peak = c if peak is None else max(peak, c)
                if peak - c > best:
                    best, bp, bt, bts = peak - c, peak, c, t
            row = got.loc[key]
            assert row.max_dd_cents == best
            assert (row.peak_cents, row.trough_cents, row.trough_ts) == (bp, bt, bts)
            assert row.n_seen == len(g)


class TestPortfolioRiskExample:
    def test_report_covers_every_series(self, spark):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path("examples").resolve().parent))
        from examples.portfolio_risk import portfolio_risk_report

        rpt = portfolio_risk_report(spark, "/root/testdata/sf0.001").toPandas()
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        n_series = ev.select("user_id").distinct().count()
        assert len(rpt) == n_series
        assert rpt.ticker.is_unique
        assert rpt.cusum_alarms.notna().all()
        assert rpt.max_dd_cents.notna().all()
        # ranks, when present, are within the universe
        got = rpt.xs_rank.dropna()
        assert got.between(1, n_series).all()
