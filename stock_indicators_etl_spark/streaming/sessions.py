"""Structured Streaming operators (SURVEY.md §2.7).

The reference has no in-code streaming — incrementality is Airflow's
day-granular ``catchup`` (``airflow_dag.py:9-44``). Spark-side we keep
the batch-per-day contract (``daily.py``) and additionally expose true
streaming twins of the sessionization / rollup batch queries:

- event-time **session windows** with a watermark for late data;
- event-time **tumbling OHLCV rollups**.

Both read any streaming source (file source with
``trigger(availableNow=True)`` reproduces the daily batch exactly);
state cleanup is watermark-driven, so they run indefinitely at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session-window aggregation over an event stream.

    Streaming twin of ``queries.q_sessionize`` (30-minute gap
    semantics, expressed with ``session_window`` + watermark instead
    of gaps-and-islands lag arithmetic).

    Boundary note: an event spaced EXACTLY ``gap`` after its
    predecessor merges in BOTH twins — the batch break condition is
    strict (``delta > gap``) and ``session_window`` likewise merges a
    session whose extent *touches* the next event's start. Pinned by
    ``test_session_gap_boundary_semantics``.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    subset: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: drop rows whose ``subset`` key was
    already seen within the watermark horizon
    (``dropDuplicatesWithinWatermark``). The streaming twin of
    ``llmdata.dedup.exact_dedup``'s survivor selection — state is
    bounded by the watermark, so it runs indefinitely; at-least-once
    sources (file replay, Kafka) become effectively-once downstream.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        subset or ["event_id"]
    )


def streaming_ohlcv_rollup(
    events: DataFrame,
    bucket: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window OHLCV rollup over an event stream (streaming
    twin of ``queries.q_ohlcv_rollup``)."""
    v = F.col(value_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), bucket).alias("w"), F.col(key_col))
        .agg(
            F.min_by(v, F.col(ts_col)).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, F.col(ts_col)).alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("volume"),
        )
        .select(
            key_col,
            F.col("w.start").alias("bucket_start"),
            "open", "high", "low", "close", "n", "volume",
        )
    )
