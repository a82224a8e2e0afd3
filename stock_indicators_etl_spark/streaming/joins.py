"""Stream-stream watermarked interval join (custom stateful op #6).

The batch operator (:func:`..operators.interval.interval_join`) bins
one side; this twin is the STREAMING shape: two live streams joined
on a key within an event-time window (the ad-tech attribution /
order-fill / request-response pattern). Structured Streaming keeps
BOTH sides' unmatched rows in state; the join-time range condition +
both watermarks are what let it evict — without the time bounds the
state is unbounded and Spark rejects append-mode output.

State bound: a left row can only match right rows with
``left.ts <= right.ts <= left.ts + window``, so once the right
watermark passes ``left.ts + window`` the left row is droppable (and
symmetrically) — state is O(rows within watermark+window horizon),
forever, regardless of stream length.

Batch-parity contract (pinned in tests): draining file streams with
``availableNow`` through this join equals the equivalent batch range
join on the full inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    window_s: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Join two event-time streams on ``key_col`` where the right
    event falls in ``[left_ts, left_ts + window_s]``. Both inputs must
    carry TIMESTAMP event-time columns; output columns are the left
    row plus the right timestamp/value columns suffixed ``_r``.
    Works identically on batch DataFrames (same expression), which is
    what the parity test exploits."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    rt, lt = f"r.{right_ts}", f"l.{left_ts}"
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {window_s} SECONDS"))
    )
    rcols = [
        F.col(f"r.{c}").alias(f"{c}_r")
        for c in right.columns
        if c != key_col
    ]
    return l.join(r, cond, "inner").select("l.*", *rcols)
