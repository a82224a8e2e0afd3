"""Slowly-changing-dimension (SCD2) history build.

North-star relational-ETL surface (reference N/A — the reference
overwrites its daily CSVs; a warehouse at scale needs the change
history). :func:`scd2_history` collapses an attribute change stream
(key, attr, ts) into validity intervals: one row per run of equal
consecutive attribute values, ``valid_from`` = first ts of the run,
``valid_to`` = next run's start (null for the current version).

This is the gaps-and-islands shape the indicator segmentation
(``timegrid.segment_series``) already uses: a ``lag`` change flag, a
running sum for the island id, then one aggregate per island — two
window passes over the SAME (key, ts) sort and one combinable
groupBy, no joins, no Python.

Ties on ts within a key are broken deterministically by the attribute
value so re-runs (and engines) agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    events: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
) -> DataFrame:
    """(key, attr, valid_from, valid_to, version) — version numbers
    each key's runs from 1 in time order; ``valid_to`` is null on the
    live row."""
    w = Window.partitionBy(key_col).orderBy(ts_col, attr_col)
    changed = (
        F.lag(attr_col).over(w).isNull()
        | (F.lag(attr_col).over(w) != F.col(attr_col))
    ).cast("int")
    seg = F.sum("_chg").over(
        Window.partitionBy(key_col)
        .orderBy(ts_col, attr_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = (
        events.select(key_col, attr_col, ts_col)
        .withColumn("_chg", changed)
        .withColumn("_seg", seg)
        .groupBy(key_col, "_seg")
        .agg(
            # the attr is constant within a run by construction; min is
            # the order-free way to say so
            F.min(attr_col).alias(attr_col),
            F.min(ts_col).alias("valid_from"),
        )
    )
    w2 = Window.partitionBy(key_col).orderBy("_seg")
    return runs.select(
        key_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.col("_seg").alias("version"),
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply an ordered changelog to a snapshot (MERGE / upsert
    semantics — the warehouse shape the reference's overwrite-daily
    CSVs sidestep, and the one a 100 TB dimension cannot).

    ``changes`` carries ``key_col``, ``seq_col`` (a monotonically
    increasing change id — unique per key, like a CDC log's LSN),
    ``op_col`` ∈ {'I','U','D'}, plus the base's data columns (ignored
    for 'D'). For each key the highest-``seq`` change wins: 'I'/'U'
    upsert the full row, 'D' removes the key; keys untouched by the
    log pass through unchanged.

    Scale shape: the (small) changelog takes one window shuffle to
    pick last-per-key; the base table is NEVER shuffled — superseded
    rows leave via a LEFT ANTI join on the changed-key set (broadcast
    when the log is small, the common CDC case), then one union. No
    Python, no collect.
    """
    data_cols = [c for c in base.columns if c != key_col]
    w = Window.partitionBy(key_col).orderBy(F.col(seq_col).desc())
    latest = changes.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    survivors = base.join(
        latest.select(key_col), key_col, "left_anti"
    )
    upserts = latest.filter(F.col(op_col) != "D").select(key_col, *data_cols)
    return survivors.unionByName(upserts)


def agg_delta_apply(
    snapshot_agg: DataFrame,
    changelog: DataFrame,
    key_col: str,
    n_col: str = "n",
    sum_col: str = "cents",
    op_col: str = "op",
    val_col: str = "cents",
) -> DataFrame:
    """Incrementally maintain an additive per-key aggregate (count +
    exact integer sum) under a RETRACTION changelog — the materialized-
    view-maintenance shape: refreshing a 100 TB base table's daily
    aggregate must cost O(|changelog|), never a rescan.

    ``changelog`` rows carry ``op`` ∈ {'I','D'} and the value: 'I'
    contributes (+1, +v), 'D' retracts (−1, −v); an update is encoded
    D(old)+I(new), the classic retraction stream (Flink-style). The
    snapshot is full-outer-joined with the combinable per-key delta;
    keys whose maintained count reaches 0 drop out — identical to
    recomputation from scratch for any changelog that retracts only
    rows actually present (the oracle proves exactly that equivalence
    on real data). All-BIGINT arithmetic, one delta shuffle + one join
    keyed on the aggregate's own key (bucketed layouts make it
    zero-Exchange).
    """
    delta = changelog.groupBy(key_col).agg(
        F.sum(
            F.when(F.col(op_col) == "I", 1).otherwise(-1)
        ).alias("_dn"),
        F.sum(
            F.when(F.col(op_col) == "I", F.col(val_col)).otherwise(
                -F.col(val_col)
            )
        ).alias("_ds"),
    )
    joined = snapshot_agg.join(delta, key_col, "full")
    n = F.coalesce(F.col(n_col), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0))
    s = F.coalesce(F.col(sum_col), F.lit(0)) + F.coalesce(F.col("_ds"), F.lit(0))
    return (
        joined.select(
            F.col(key_col),
            n.cast("long").alias(n_col),
            s.cast("long").alias(sum_col),
        )
        .filter(F.col(n_col) > 0)
    )
