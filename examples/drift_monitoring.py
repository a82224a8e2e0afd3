#!/usr/bin/env python
"""Worked example: the full drift-monitoring report for a feature
pipeline — yesterday's snapshot vs today's, one composed job.

A production feature store runs this BEFORE trusting a model with
today's data. Four complementary monitors, each independently
oracle-checked, composed here into one report frame:

1. TVD   — binned total-variation distance (`dq.histogram_drift`):
           "how much mass moved", linear, integer-exact;
2. KL    — binned Kullback–Leibler (`dq.kl_drift`): the asymmetric
           tail-weighted view (a fat new tail screams here first);
3. KS    — EXACT two-sample Kolmogorov–Smirnov (`dq.ks_drift`):
           bin-free max CDF gap with classical critical values —
           catches location/shape shifts the 16-bin histograms smear;
4. skew  — `dq.skew_report` on the join key: a drift response
           usually triggers a re-shuffle/backfill, and this is the
           pre-flight that says whether that shuffle needs salting.

All four share the one exactness discipline (integer statistics,
one IEEE division at the end), so the report is bit-reproducible
across engines and runs — a drift ALERT can be replayed and audited.

Usage:
    python examples/drift_monitoring.py <sf_dir> [--split-day 19738]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def drift_report(
    spark: SparkSession, sf_dir: str, split_day: int = 19738
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(drift, skew)``: per event type one row with the
    three drift statistics joined on the key, plus the join-key skew
    pre-flight for the remediation shuffle."""
    from stock_indicators_etl_spark.operators.dq import (
        histogram_drift,
        kl_drift,
        ks_drift,
        skew_report,
    )
    from stock_indicators_etl_spark.queries import _events

    ev = _events(spark, sf_dir)
    day = F.expr(f"ns div {86_400_000_000_000}")
    a = ev.filter(day < split_day)
    b = ev.filter(day >= split_day)
    keys = ("event_type",)

    tvd = histogram_drift(a, b, keys, "value").select(
        "event_type", F.col("tvd")
    )
    kl = kl_drift(a, b, keys, "value").select("event_type", "kl")
    ks = ks_drift(a, b, keys, "value").select(
        "event_type", "n_a", "n_b", "ks"
    )
    drift = (
        ks.join(tvd, "event_type")
        .join(kl, "event_type")
        .withColumn(
            # the classical two-sided 5% KS threshold c(α)·sqrt((n+m)/nm)
            "ks_alarm",
            F.col("ks")
            > F.lit(1.358)
            * F.sqrt(
                (F.col("n_a") + F.col("n_b")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ),
        )
        .orderBy("event_type")
    )
    skew = skew_report(ev.select(F.col("user_id")), ("user_id",), top_n=5)
    return drift, skew


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--split-day", type=int, default=19738)
    args = ap.parse_args()
    from stock_indicators_etl_spark.session import get_spark

    spark = get_spark(app_name="drift_monitoring")
    drift, skew = drift_report(spark, args.sf_dir, args.split_day)
    drift.show(50, truncate=False)
    skew.show(10, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
