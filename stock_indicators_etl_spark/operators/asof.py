"""As-of (point-in-time) join — the canonical time-series join the
reference's domain implies but never needed (SURVEY.md §2.3: the
reference contains zero joins; quote/trade alignment, corporate-action
lookup, and feature-at-time-of-bar all want "most recent right row not
after the left row").

Spark has no native as-of join, and the naive formulations do not
scale: an inequality theta-join (``l.ts >= r.ts``) is a broadcast
nested loop (O(L·R) per key), and a windowed subquery per left row
shuffles the right side once per consumer. This implements the
**union + ordered-carry** plan instead:

    tag sides → unionByName → one shuffle on the series key →
    running ``last(right_row, ignorenulls=True)`` over
    (ts, side)-ordered rows → keep left rows

One exchange total (both sides shuffle together), one ordered window
scan, no row expansion — the same cost as a single window operator,
at any key cardinality. The matched right row travels as ONE struct
through ``last(ignorenulls)``, so a right row whose *value* is NULL
still matches (row semantics, like pandas ``merge_asof``), and all of
its columns stay mutually consistent.

Tie rule: a right row at exactly the left timestamp matches
(inclusive, = DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``); ordering
(ts, side) with the right side first makes that an ordinary frame
inclusion, not a special case. ``direction="forward"`` mirrors it
(first right row at-or-after). Right rows should be unique per
(key, ts) — among exact duplicates the carried row is the last in an
unspecified intra-timestamp order (same caveat as pandas).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "window_start",
    by: Sequence[str] = ("ticker",),
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the columns of the
    most recent ``right`` row with ``right.on <= left.on`` (or the
    nearest following one for ``direction="forward"``), matched within
    the same ``by`` key. Unmatched left rows keep NULLs (left-join
    semantics).

    ``value_cols``: right columns to attach (default: everything but
    keys and ``on``). The matched right timestamp is attached as
    ``{on}{suffix}``; value columns as ``{col}{suffix}``.

    ``tolerance`` (same unit as ``on``): a match farther than this
    from the left row is nulled out — standard stale-quote guard.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(by)
    vals = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c not in (*keys, on)]
    )
    clash = [c + suffix for c in (on, *vals) if c + suffix in left.columns]
    if clash:
        raise ValueError(f"suffixed columns collide with left side: {clash}")

    packed = F.struct(F.col(on).alias("_ts"), *[F.col(c).alias(c) for c in vals])
    r = right.select(*keys, F.col(on), packed.alias("_row")).withColumn(
        "_is_left", F.lit(0)
    )
    l = left.withColumn("_is_left", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    # at equal ts the right row must fall inside the left row's frame:
    # backward (-inf, cur] wants right first; forward [cur, +inf)
    # wants right after the left row
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on).asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("_row", ignorenulls=True).over(w)
        dist = F.col(on) - F.col("_m._ts")
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on).asc(), F.col("_is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first("_row", ignorenulls=True).over(w)
        dist = F.col("_m._ts") - F.col(on)

    out = u.withColumn("_m", carried).filter(F.col("_is_left") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "_m", F.when(dist <= F.lit(tolerance), F.col("_m"))
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col("_m._ts").alias(on + suffix),
        *[F.col(f"_m.{c}").alias(c + suffix) for c in vals],
    )
