"""Ordered-sequence funnel analysis over an event stream.

``funnel_conversions`` computes, per user, the earliest completion of
an ordered step sequence (each step strictly after the previous one),
the classic product-analytics query — here as a chain of combinable
conditional-min aggregations, one per step.

Plan shape: step 0 is a filtered scan + ``groupBy(user).min`` (the
``event_type = step`` predicate pushes to the scan); each later step
joins the (one-row-per-user) funnel frame to that step's filtered
events on the user key and takes the conditional min. Every aggregate
is map-side combinable and every join key is the user id, so AQE
reuses/coalesces the user-hash exchanges; the funnel frame never
exceeds one row per step-0 user. At 100 TB the levers are the
event-type scan predicate (partition/row-group pruning when the
source is type- or date-partitioned) and the per-user frame staying
tiny regardless of event volume. No windows over whole user histories,
no per-row state, no Python.

Semantics pinned by tests: strictly increasing timestamps across
steps (a same-timestamp later step does NOT count); users missing an
intermediate step carry NULLs from that step on; ``within_ns`` bounds
the whole-funnel duration (first step → last step), and ``converted``
is false (not NULL) whenever the funnel is incomplete.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_cohorts(
    events: DataFrame,
    bucket_ns: int,
    max_offset: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ns",
) -> DataFrame:
    """Cohort retention: users are cohorted by the bucket of their
    FIRST event; for each (cohort, offset) the output counts distinct
    users active ``offset`` buckets after their cohort bucket
    (offset 0 = the cohort size itself).

    Plan: one combinable per-user ``min`` (first-seen), one distinct
    (user, bucket) activity aggregate — both map-side combined on the
    user key so the exchange is shared — then a count per (cohort,
    offset); distinct users per pair is exact (the (user, bucket)
    stream is already distinct, so the final count never double
    counts without needing a count-distinct). Nothing holds more
    than one row per (user, active-bucket). 100 TB: combinable all
    the way down; bucket arithmetic is scan-local integer division.
    """
    if bucket_ns <= 0:
        raise ValueError("bucket_ns must be positive")
    # integer DIV, not float divide-and-truncate: epoch-ns (~1.7e18)
    # is far beyond double's 2^53 exact-integer range
    b = F.expr(f"{ts_col} DIV {bucket_ns}")
    per_user = events.select(
        F.col(user_col).alias("user_id"), b.alias("bucket")
    ).distinct()
    first = per_user.groupBy("user_id").agg(F.min("bucket").alias("cohort"))
    joined = per_user.join(first, "user_id").select(
        "cohort", (F.col("bucket") - F.col("cohort")).alias("offset"), "user_id"
    )
    if max_offset is not None:
        joined = joined.filter(F.col("offset") <= max_offset)
    return joined.groupBy("cohort", "offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def funnel_conversions(
    events: DataFrame,
    steps: Sequence[str],
    within_ns: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ns",
) -> DataFrame:
    """Earliest strict-order completion of ``steps`` per user.

    Output: one row per user who performed step 0, with ``t_0..t_k``
    (epoch-ns of each step's earliest valid occurrence; NULL once the
    chain breaks), ``converted`` (all steps present and, if
    ``within_ns`` is set, total duration within bound) and
    ``duration_ns`` (NULL unless all steps present).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")

    frame = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(F.min(ts_col).alias("t_0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("_ts"))
            .join(frame.select("user_id", F.col(f"t_{i - 1}").alias("_prev")), "user_id")
            .filter(F.col("_ts") > F.col("_prev"))
            .groupBy("user_id")
            .agg(F.min("_ts").alias(f"t_{i}"))
        )
        frame = frame.join(nxt, "user_id", "left")

    last = f"t_{len(steps) - 1}"
    duration = F.col(last) - F.col("t_0")
    converted = F.col(last).isNotNull()
    if within_ns is not None:
        converted = converted & (duration <= F.lit(within_ns))
    return frame.select(
        "user_id",
        *[f"t_{i}" for i in range(len(steps))],
        F.coalesce(converted, F.lit(False)).alias("converted"),
        F.when(F.col(last).isNotNull(), duration).alias("duration_ns"),
    )
