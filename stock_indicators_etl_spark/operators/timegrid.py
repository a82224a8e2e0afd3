"""Time-grid operators: session filter, segmentation, gap-fill,
interpolation, regularity check (SURVEY.md §2.5 W0–W4, P7).

All operators are pure DataFrame transformations over
``Window.partitionBy(key).orderBy(time)`` — no UDFs, no collects —
so they stay inside whole-stage codegen and scale by partitioning on
the series key. Time is int64 epoch-nanoseconds throughout (reference
convention, ``stockdata/utils.py:11``).

Scale notes (100 TB): every window here partitions by the series key
(ticker / sub_ticker). One hash shuffle on the key amortizes across
all subsequent window ops with the same key because Spark reuses the
child's output partitioning. Hot keys are bounded in this domain
(≤ ~390 rows per ticker-day for 1m bars), so no salting is required;
for generic event streams, pre-partition by (key, day) first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NS_PER_S = 1_000_000_000


def market_hours_filter(
    df: DataFrame,
    lower_ns: int,
    upper_ns: int,
    ws_col: str = "window_start",
) -> DataFrame:
    """Half-open time-range predicate ``lower <= ws < upper`` (P7).

    Reference: ``stockdata/indicators.py:171-176`` with bounds from
    ``stockdata/utils.py:26-36`` (09:30–16:30 ET). Bounds are plain
    literals → Parquet predicate pushdown applies. If ``ws_col`` is a
    timestamp (LTZ or NTZ) rather than int64 epoch-ns, the ns bounds
    are converted to matching timestamp literals so the predicate
    still pushes down to the scan as a timestamp range.
    """
    c = F.col(ws_col)
    dt = dict(df.dtypes).get(ws_col, "bigint")
    if dt in ("timestamp", "timestamp_ntz"):
        if dt == "timestamp_ntz":
            # naive-UTC wall-time bounds, independent of session tz
            ntz_epoch = F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))
            lo = F.timestamp_add("MICROSECOND", F.lit(lower_ns // 1000), ntz_epoch)
            hi = F.timestamp_add("MICROSECOND", F.lit(upper_ns // 1000), ntz_epoch)
        else:
            lo = F.timestamp_micros(F.lit(lower_ns // 1000))
            hi = F.timestamp_micros(F.lit(upper_ns // 1000))
        return df.filter((c >= lo) & (c < hi))
    return df.filter((c >= F.lit(lower_ns)) & (c < F.lit(upper_ns)))


def segment_series(
    df: DataFrame,
    key_cols: Sequence[str] = ("ticker",),
    ws_col: str = "window_start",
    allowed_gaps_s: Sequence[int] = (60, 120, 180),
    min_rows: int = 2,
    seg_col: str = "segment_id",
    sub_key_col: str = "sub_ticker",
) -> DataFrame:
    """Gaps-and-islands segmentation (W1).

    Reference semantics (``stockdata/indicators.py:41-66,178-194``):
    a row *starts a new segment* when its gap to the previous row is
    not in ``allowed_gaps_s``; segments with fewer than ``min_rows``
    rows are dropped; surviving segments are renumbered consecutively
    ``0..k`` in time order, and the sub-key is ``f"{key}-{i}"``.

    Implementation: lag → break flag → running sum → windowed count
    filter → dense_rank renumber. All four windows share
    ``partitionBy(key)``, so there is exactly one shuffle.
    """
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(ws_col)

    gap_s = (F.col(ws_col) - F.lag(ws_col, 1).over(w)) / F.lit(NS_PER_S)
    is_break = gap_s.isNotNull() & ~gap_s.isin([float(g) for g in allowed_gaps_s])

    raw_seg = F.sum(is_break.cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("_raw_seg", raw_seg)

    w_seg = Window.partitionBy(*keys, F.col("_raw_seg"))
    out = out.withColumn("_seg_n", F.count(F.lit(1)).over(w_seg)).filter(
        F.col("_seg_n") >= F.lit(min_rows)
    )

    # renumber surviving segments 0..k per key (indicators.py:186-193)
    w_rank = Window.partitionBy(*keys).orderBy("_raw_seg")
    out = out.withColumn(seg_col, (F.dense_rank().over(w_rank) - F.lit(1)).cast("int"))
    sub = F.concat_ws("-", *[F.col(k).cast("string") for k in key_cols], F.col(seg_col))
    return out.withColumn(sub_key_col, sub).drop("_raw_seg", "_seg_n")


def fill_gaps(
    df: DataFrame,
    key_cols: Sequence[str] = ("sub_ticker",),
    ws_col: str = "window_start",
    step_ns: int = 60 * NS_PER_S,
    carry_cols: Sequence[str] = (),
    synthetic_col: str | None = None,
) -> DataFrame:
    """Missing-timestamp fill within a segment (W2).

    Reference (``stockdata/indicators.py:69-94,196-211``): for every
    observed gap that is a multiple of the step, synthesize the absent
    rows; synthetic rows carry only the time + key (+ ``carry_cols``,
    e.g. the parent ticker); all other columns are null.

    Implementation: ``lag`` → ``sequence(prev+step, cur-step, step)``
    → ``explode`` → ``unionByName(allowMissingColumns=True)``. The
    generated side is derived from the same partitioning, and at most
    doubles-ish the data for allowed gaps ≤ 3 steps — no join needed
    (SURVEY.md J1 union-of-missing form).

    ``synthetic_col``: optional bool marker column name for the
    generated rows (observed rows get false).
    """
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(ws_col)
    prev = F.lag(ws_col, 1).over(w)

    keep = list(dict.fromkeys([*key_cols, *carry_cols]))
    gaps = (
        df.withColumn("_prev_ws", prev)
        .filter(F.col("_prev_ws").isNotNull() & (F.col(ws_col) - F.col("_prev_ws") > F.lit(step_ns)))
        .select(
            *keep,
            F.explode(
                F.sequence(
                    F.col("_prev_ws") + F.lit(step_ns),
                    F.col(ws_col) - F.lit(step_ns),
                    F.lit(step_ns),
                )
            ).alias(ws_col),
        )
    )
    base = df
    if synthetic_col is not None:
        base = base.withColumn(synthetic_col, F.lit(False))
        gaps = gaps.withColumn(synthetic_col, F.lit(True))
    return base.unionByName(gaps, allowMissingColumns=True)


def interpolate_linear(
    df: DataFrame,
    value_cols: Sequence[str],
    key_cols: Sequence[str] = ("sub_ticker",),
    ws_col: str = "window_start",
) -> DataFrame:
    """Per-key linear interpolation of nulls, edges clamped (W4).

    Matches pandas ``interpolate(method="linear",
    limit_direction="both")`` on a regular grid
    (``stockdata/indicators.py:151-163,263-264``): interior nulls are
    time-weighted blends of the nearest non-null neighbors;
    leading/trailing nulls clamp to the nearest valid value.

    Implementation: "previous non-null" is ``last(ignorenulls)`` over
    a running frame in ascending time; "next non-null" is the same
    running frame over **descending** time — NOT a
    ``currentRow→unboundedFollowing`` frame, which Spark's WindowExec
    recomputes per row (O(n²) per partition; measured 18s vs 1s on a
    21k-row partition). All columns' same-direction expressions are
    emitted in ONE batch per direction — interleaving asc/desc per
    column would plant a re-Sort between every pair (measured: 11 Sort
    nodes for 6 columns vs 2 here). Two O(n) sorted passes total,
    same partitioning, no UDF.
    """
    keys = [F.col(k) for k in key_cols]
    w_back = Window.partitionBy(*keys).orderBy(F.col(ws_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_fwd = Window.partitionBy(*keys).orderBy(F.col(ws_col).desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ws = F.col(ws_col)

    back_exprs: dict[str, Column] = {}
    fwd_exprs: dict[str, Column] = {}
    for c in value_cols:
        v = F.col(c)
        ts_if = F.when(v.isNotNull(), ws)
        back_exprs[f"_prev_v_{c}"] = F.last(v, ignorenulls=True).over(w_back)
        back_exprs[f"_prev_t_{c}"] = F.last(ts_if, ignorenulls=True).over(w_back)
        fwd_exprs[f"_next_v_{c}"] = F.last(v, ignorenulls=True).over(w_fwd)
        fwd_exprs[f"_next_t_{c}"] = F.last(ts_if, ignorenulls=True).over(w_fwd)
    out = df.withColumns(back_exprs).withColumns(fwd_exprs)

    blends: dict[str, Column] = {}
    for c in value_cols:
        v = F.col(c)
        prev_v, prev_t = F.col(f"_prev_v_{c}"), F.col(f"_prev_t_{c}")
        next_v, next_t = F.col(f"_next_v_{c}"), F.col(f"_next_t_{c}")
        frac = (ws - prev_t).cast("double") / (next_t - prev_t).cast("double")
        blends[c] = (
            F.when(v.isNotNull(), v)
            .when(prev_v.isNull(), next_v)  # leading-edge clamp
            .when(next_v.isNull(), prev_v)  # trailing-edge clamp
            .otherwise(prev_v + (next_v - prev_v) * frac)
        )
    return out.withColumns(blends).drop(*back_exprs, *fwd_exprs)


def regularity_violations(
    df: DataFrame,
    key_cols: Sequence[str] = ("sub_ticker",),
    ws_col: str = "window_start",
    step_ns: int = 60 * NS_PER_S,
) -> DataFrame:
    """Rows whose gap to the previous row ≠ step (W3).

    The reference *constructs but never raises* its regularity
    ``ValueError`` (``stockdata/indicators.py:25-38,256-261``) — the
    check is inert. Here it is a real operator returning the violating
    rows; callers may ``.isEmpty()``-assert (fixing the reference bug)
    or ignore (bug-compatible).
    """
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(ws_col)
    gap = F.col(ws_col) - F.lag(ws_col, 1).over(w)
    return (
        df.withColumn("_gap_ns", gap)
        .filter(F.col("_gap_ns").isNotNull() & (F.col("_gap_ns") != F.lit(step_ns)))
    )
