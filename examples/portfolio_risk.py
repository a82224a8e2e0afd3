"""Worked example: a daily portfolio-risk report from raw events.

Composes the round-7 portfolio operators into the report a risk desk
actually publishes, all in ONE Spark job over the event stream:

1. hourly cross-sectional ranks (relative strength of every series);
2. rolling beta vs the market index (systematic exposure);
3. maximum drawdown with peak/trough (worst realized loss);
4. CUSUM drift alarms (level shifts above the reference band);
5. Bollinger bandwidth (current volatility regime).

Everything stays integer-exact until the final report columns, and
every constituent operator is independently oracle-checked — the
composition adds no new math, only joins on the series key. A real
deployment writes ``report`` partitioned by date and alerts on
``dd_alarm | cusum_alarms > 0``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def portfolio_risk_report(
    spark: SparkSession,
    sf_dir: str,
    dd_limit_cents: int = 5000,
) -> DataFrame:
    """One row per series: rank, beta, drawdown, alarms, bandwidth."""
    from stock_indicators_etl_spark.operators.rolling import with_bollinger
    from stock_indicators_etl_spark.queries import (
        events_as_bars,
        q_cross_sectional_rank,
        q_cusum,
        q_drawdown,
        q_rolling_beta,
    )

    dd = q_drawdown(spark, sf_dir).select(
        F.col("ticker"),
        "max_dd_cents",
        (F.col("max_dd_cents") > dd_limit_cents).alias("dd_alarm"),
    )

    # freshest cross-sectional rank per series
    xs = q_cross_sectional_rank(spark, sf_dir)
    from pyspark.sql import Window

    wl = Window.partitionBy("user_id").orderBy(F.col("bucket").desc())
    latest_rank = (
        xs.withColumn("_r", F.row_number().over(wl))
        .filter(F.col("_r") == 1)
        .select(
            F.col("user_id").cast("string").alias("ticker"),
            F.col("rk").alias("xs_rank"),
            F.col("pct").alias("xs_pct"),
        )
    )

    # freshest non-null beta per series
    beta = q_rolling_beta(spark, sf_dir)
    wb = Window.partitionBy("user_id").orderBy(F.col("bucket").desc())
    latest_beta = (
        beta.filter(F.col("beta").isNotNull())
        .withColumn("_r", F.row_number().over(wb))
        .filter(F.col("_r") == 1)
        .select(F.col("user_id").cast("string").alias("ticker"), "beta")
    )

    # CUSUM alarm count per series
    alarms = (
        q_cusum(spark, sf_dir)
        .groupBy(F.col("user_id").cast("string").alias("ticker"))
        .agg(F.sum(F.col("alarm").cast("long")).alias("cusum_alarms"))
    )

    # freshest Bollinger bandwidth per series (volatility regime)
    bars = events_as_bars(spark, sf_dir)
    bb = with_bollinger(bars)
    wbb = Window.partitionBy("ticker").orderBy(F.col("window_start").desc())
    latest_bb = (
        bb.filter(F.col("bb_bandwidth").isNotNull())
        .withColumn("_r", F.row_number().over(wbb))
        .filter(F.col("_r") == 1)
        .select("ticker", "bb_bandwidth")
    )

    return (
        dd.join(latest_rank, "ticker", "left")
        .join(latest_beta, "ticker", "left")
        .join(alarms, "ticker", "left")
        .join(latest_bb, "ticker", "left")
        .select(
            "ticker",
            "xs_rank",
            "xs_pct",
            "beta",
            "max_dd_cents",
            "dd_alarm",
            F.coalesce("cusum_alarms", F.lit(0)).alias("cusum_alarms"),
            "bb_bandwidth",
        )
    )


if __name__ == "__main__":
    from stock_indicators_etl_spark.session import get_spark

    spark = get_spark(app_name="portfolio_risk")
    report = portfolio_risk_report(spark, "/root/testdata/sf0.01")
    report.orderBy(F.col("max_dd_cents").desc()).show(20, truncate=False)
