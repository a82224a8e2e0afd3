"""Binned interval (range) join — points joined to the intervals
containing them.

Spark executes an inequality join condition
(``l.ts >= r.start AND l.ts < r.end``) as a broadcast nested loop:
O(points · intervals) per key, a non-starter at corpus scale. The
standard fix (the same idea as Databricks' range-join binning and
KDB's window joins) is to make the range condition an EQUI-join on a
bucket id:

- each interval is exploded to the fixed-width buckets it overlaps
  (``sequence(floordiv(start, w), floordiv(end - 1, w))``);
- each point carries its single bucket ``floordiv(ts, w)``;
- a shuffle equi-join on (key, bucket) meets every point with exactly
  the intervals overlapping its bucket — a point's single bucket
  appears once per interval, so the join is duplicate-free by
  construction —
- and the exact containment predicate filters within the bucket.

Cost: |intervals| · (mean_len/w + 1) exploded rows and a hash join,
instead of a nested loop. ``bucket_width`` trades the explode factor
(long intervals over small w) against join selectivity (short
intervals inside huge w collide spuriously); set it near the typical
interval length.

Bucket arithmetic stays in INTEGER division (``DIV`` with a
negative-floor correction): epoch-ns values exceed 2^53, where a
double-division floor silently loses ulps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floordiv(col_sql: str, w: int) -> Column:
    """Floor integer division as a Column (``DIV`` truncates toward
    zero, so negatives with a remainder need the −1 correction)."""
    return F.expr(
        f"CASE WHEN {col_sql} >= 0 OR {col_sql} % {w} = 0 "
        f"THEN {col_sql} DIV {w} ELSE {col_sql} DIV {w} - 1 END"
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "window_start",
    start_col: str = "start",
    end_col: str = "end",
    by: Sequence[str] = ("ticker",),
    bucket_width: int = 600 * 1_000_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point.on < end`` (end-exclusive) within the same ``by``
    key. Output: all point columns + the interval columns (names must
    not collide outside the ``by`` keys).

    Empty or inverted intervals (``end <= start``) contain no points
    and are dropped up front. ``how="left"`` keeps unmatched points
    with NULL interval columns (one row per unmatched point row,
    duplicates preserved).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    keys = list(by)
    overlap = [c for c in intervals.columns if c in points.columns and c not in keys]
    if overlap:
        raise ValueError(f"column collision outside by-keys: {overlap}")
    ivals = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                _floordiv(start_col, bucket_width),
                _floordiv(f"({end_col} - 1)", bucket_width),
            )
        ),
    )
    pts = points.withColumn("_bucket", _floordiv(on, bucket_width))
    contained = (F.col(on) >= F.col(start_col)) & (F.col(on) < F.col(end_col))
    if how == "inner":
        return pts.join(ivals, [*keys, "_bucket"]).filter(contained).drop("_bucket")
    # left: match on an internal row id so duplicate point rows keep
    # their own output rows (the id never leaves this function). The
    # id is generated once and PINNED via persist: it is partition-
    # order-dependent, and the two consumers below (match input and
    # left side) must see identical ids even when the caller's plan
    # contains a nondeterministically-ordered shuffle.
    ival_cols = [c for c in intervals.columns if c not in keys]
    pts = pts.withColumn("_pid", F.monotonically_increasing_id()).persist()
    matched = (
        pts.join(ivals, [*keys, "_bucket"])
        .filter(contained)
        .select("_pid", *ival_cols)
    )
    return (
        pts.drop("_bucket")
        .join(matched, "_pid", "left")
        .select(*points.columns, *ival_cols)
    )
