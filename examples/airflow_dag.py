"""Example Airflow DAG for the daily download → indicators pipeline.

Orchestration parity with the reference's 2-task weekday DAG
(``airflow_dag.py:9-44``): weekday cron, catchup enabled (missed days
run as their own logical dates), retries with a delay, and the
execution date flowing into ``--execution_date``.

The tasks shell out to the same CLIs any scheduler can call; dataset
roots come from ``YAHOO_BASE`` / ``INDICATOR_BASE`` env vars (S6), so
no paths are hard-coded here. For large historical ranges, prefer ONE
distributed run of

    python -m stock_indicators_etl_spark.streaming.daily backfill \
        --start 2024-01-01 --end 2024-06-30

over per-day catchup: it reads the whole range in one partition-pruned
scan and produces partitions byte-comparable with per-day runs
(day-scoped segment numbering).

This file is an example: Airflow is not a dependency of this package.
"""

from __future__ import annotations

from datetime import datetime, timedelta

try:
    from airflow import DAG
    from airflow.operators.bash import BashOperator
except ImportError:  # pragma: no cover - airflow not installed here
    DAG = None

CLI = "python -m stock_indicators_etl_spark.streaming.daily"

if DAG is not None:  # pragma: no cover - exercised only under Airflow
    with DAG(
        dag_id="stock_indicators_etl_spark_daily",
        # reference cadence: weekdays 9:30 AM, processing the previous
        # day's logical date ({{ ds }}) — airflow_dag.py:22-23
        schedule="30 9 * * 1-5",
        start_date=datetime(2024, 1, 1),
        catchup=True,
        max_active_runs=8,
        default_args={
            "retries": 3,
            "retry_delay": timedelta(minutes=5),
        },
    ) as dag:
        download = BashOperator(
            task_id="download_bars",
            bash_command=f"{CLI} download --execution_date {{{{ ds }}}} --interval 1m",
        )
        indicators = BashOperator(
            task_id="generate_indicators",
            bash_command=f"{CLI} indicators --execution_date {{{{ ds }}}} --interval 1m",
        )
        download >> indicators
