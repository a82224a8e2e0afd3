"""Regression: queries._events must produce identical epoch-ns for
every physical ts type the testdata has shipped (DESIGN 4.15)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from stock_indicators_etl_spark.queries import _events

US = [1_704_067_200_000_000, 1_704_067_260_123_456, 1_704_153_600_999_999]


def _base_table(ts_arr: pa.Array) -> pa.Table:
    n = len(US)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["a"] * n),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )


def test_events_ns_identical_across_ntz_and_nanos(spark, tmp_path):
    expected = [u * 1000 for u in US]

    # µs, isAdjustedToUTC=false → Spark 4 reads TIMESTAMP_NTZ
    d1 = tmp_path / "ntz"
    d1.mkdir()
    pq.write_table(
        _base_table(pa.array(US, pa.timestamp("us"))), d1 / "events.parquet"
    )
    got_ntz = _events(spark, str(d1))
    assert dict(got_ntz.dtypes)["ts"] == "timestamp_ntz"
    assert [r.ns for r in got_ntz.orderBy("event_id").collect()] == expected

    # TIMESTAMP(NANOS) → int64 under nanosAsLong (set by get_spark)
    d2 = tmp_path / "nanos"
    d2.mkdir()
    pq.write_table(
        _base_table(pa.array([u * 1000 for u in US], pa.timestamp("ns"))),
        d2 / "events.parquet",
    )
    got_ns = _events(spark, str(d2))
    assert dict(got_ns.dtypes)["ts"] == "bigint"
    assert [r.ns for r in got_ns.orderBy("event_id").collect()] == expected


def test_events_ntz_ns_is_session_timezone_independent(spark, tmp_path):
    d = tmp_path / "tzcheck"
    d.mkdir()
    pq.write_table(
        _base_table(pa.array(US, pa.timestamp("us"))), d / "events.parquet"
    )
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = [r.ns for r in _events(spark, str(d)).orderBy("event_id").collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert shifted == [u * 1000 for u in US]
