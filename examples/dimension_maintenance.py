"""Worked dimension-maintenance example: CDC → history → validation.

The three warehouse operators this repo ships compose into the
standard "maintain a dimension from a change feed" loop that the
reference's overwrite-daily CSVs sidestep:

1. **Apply** the day's CDC changelog onto the current snapshot with
   :func:`operators.scd.apply_cdc` (last-wins per key by the feed's
   sequence number; deletes drop keys; the base table is never
   shuffled — see the operator's plan notes). The streaming twin
   (`streaming.cdc.streaming_cdc_apply`) runs the same merge per
   micro-batch.
2. **Record history**: feed the attribute change stream into
   :func:`operators.scd.scd2_history` to keep the full
   validity-interval (SCD2) view alongside the current snapshot —
   queries against "as of" dates hit the history, point lookups hit
   the snapshot.
3. **Validate the batch** before publishing:
   :func:`operators.dq.snapshot_diff_summary` classifies every key as
   added/removed/changed/unchanged between the pre- and post-merge
   snapshots, and the publish gate asserts the counts match what the
   changelog IMPLIES (e.g. a changelog with no deletes must produce
   zero `removed`). A merge bug — wrong join key, lost tie-break,
   partial apply — surfaces as a count mismatch HERE, not in a
   downstream report.

``tests/test_sources_streaming.py`` runs this module end-to-end; the
assertions in :func:`run_example` are the publish gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_indicators_etl_spark.operators.dq import snapshot_diff_summary
from stock_indicators_etl_spark.operators.scd import apply_cdc, scd2_history


def expected_counts(base: DataFrame, changes: DataFrame, key_col: str,
                    seq_col: str, op_col: str = "op") -> dict[str, int]:
    """What the changelog IMPLIES the diff must look like: classify
    each changed key by its last op and whether it existed in base."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(seq_col).desc())
    last = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(key_col).alias("_k"), F.col(op_col).alias("_op"))
    )
    base_keys = base.select(F.col(key_col).alias("_k")).withColumn(
        "_in_base", F.lit(True)
    )
    j = last.join(base_keys, "_k", "left")
    rows = (
        j.select(
            F.when(F.col("_op") == "D",
                   F.when(F.col("_in_base").isNotNull(), "removed"))
            .when(F.col("_in_base").isNotNull(), "changed")
            .otherwise("added")
            .alias("cls")
        )
        .groupBy("cls")
        .count()
        .collect()
    )
    return {r["cls"]: r["count"] for r in rows if r["cls"] is not None}


def run_example(spark: SparkSession) -> dict[str, int]:
    import pandas as pd

    base = spark.createDataFrame(
        pd.DataFrame(
            {
                "sku": [1, 2, 3, 4, 5],
                "price_tier": ["a", "a", "b", "b", "c"],
            }
        )
    )
    # the day's CDC feed: retier 1 twice (last wins), delete 3,
    # delete-then-reinstate 4, introduce 9
    changes = spark.createDataFrame(
        pd.DataFrame(
            {
                "sku": [1, 1, 3, 4, 4, 9],
                "price_tier": ["b", "c", None, None, "a", "a"],
                "seq": [1, 5, 2, 3, 6, 4],
                "op": ["U", "U", "D", "D", "I", "I"],
            }
        )
    )

    # 1. apply
    merged = apply_cdc(base, changes, "sku", "seq")

    # 2. history: every (key, attr, seq) version the feed carried,
    # collapsed to validity runs (seq stands in for event time)
    history = scd2_history(
        changes.filter(F.col("op") != "D").select("sku", "price_tier", "seq"),
        "sku",
        "price_tier",
        "seq",
    )

    # 3. validate-before-publish
    got = {
        r["change"]: r["n"]
        for r in snapshot_diff_summary(base, merged, "sku").collect()
    }
    want = expected_counts(base, changes, "sku", "seq")
    for cls in ("added", "removed", "changed"):
        if got.get(cls, 0) != want.get(cls, 0):
            raise AssertionError(
                f"publish gate: {cls} count {got.get(cls, 0)} != "
                f"changelog-implied {want.get(cls, 0)}"
            )
    # unchanged keys are whatever the log never touched
    assert got.get("unchanged", 0) == 2  # skus 2 and 5

    return {
        "merged_rows": merged.count(),
        "history_rows": history.count(),
        **{f"diff_{k}": v for k, v in got.items()},
    }


if __name__ == "__main__":
    from stock_indicators_etl_spark import get_spark

    out = run_example(get_spark(master="local[4]", shuffle_partitions=4))
    print(out)
