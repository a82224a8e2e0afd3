"""Data-quality expectation checks (great-expectations-lite).

North-star relational-ETL surface (reference N/A — the reference
trusts yfinance output; a 100 TB ingest cannot). Two shapes:

- :func:`dq_summary` — N rule conditions evaluated in ONE pass over
  the table (each rule is a Column predicate; violations are
  conditional sums inside a single aggregate — adding a rule adds an
  expression, not a scan), then unpivoted to one row per rule so the
  result is append-able to a QA history table.
- :func:`referential_violations` — orphan foreign keys via LEFT ANTI
  join (the plan Spark gives NOT EXISTS), counted per child table.

Both are exact counting — oracle-checkable bit-exactly — and both
are combinable aggregates: map-side partial sums, no wide rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_summary(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_rows, n_violations, violation_rate_ppm) — one row per
    rule, ONE scan for all rules. A rule's Column is the VIOLATION
    predicate (true = bad row); nulls count as violations (an
    unevaluable expectation is a failed one)."""
    if not rules:
        raise ValueError("need at least one rule")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(F.coalesce(cond.cast("long"), F.lit(1))).alias(name)
        )
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n in rules)
    return wide.selectExpr(
        "_n", f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
    ).select(
        "rule",
        F.col("_n").alias("n_rows"),
        "n_violations",
        # ppm in integer arithmetic: exact cross-engine
        F.expr("n_violations * 1000000 div _n").alias("violation_rate_ppm"),
    )


def referential_violations(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Count child rows whose ``fk`` has no matching ``pk`` (LEFT
    ANTI join — null fks count as orphans, matching SQL NOT EXISTS
    with a null-rejecting equality)."""
    orphans = child.join(
        parent.select(F.col(pk).alias("_pk")),
        child[fk] == F.col("_pk"),
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
