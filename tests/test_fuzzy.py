"""Edit-distance join (llmdata/fuzzy.py): brute-force equality on
random corpora (exercises the degenerate short-string bucket), known
answers, and plan shape."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest

from stock_indicators_etl_spark.llmdata.fuzzy import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def _brute(strings, d):
    out = set()
    for a, b in itertools.combinations(sorted(set(strings)), 2):
        dist = _lev(a, b)
        if dist <= d:
            out.add((a, b, dist))
    return out


@pytest.mark.parametrize("seed,alpha,max_dist", [(2, "abcd", 2), (3, "abcdefgh", 1), (5, "ab", 3)])
def test_matches_brute_force(spark, seed, alpha, max_dist):
    rng = np.random.default_rng(seed)
    strings = list(
        {"".join(rng.choice(list(alpha), rng.integers(1, 9))) for _ in range(120)}
    )
    df = spark.createDataFrame(pd.DataFrame({"text": strings}))
    got = {
        (r.s_a, r.s_b, r.dist)
        for r in edit_distance_pairs(df, max_dist=max_dist).collect()
    }
    assert got == _brute(strings, max_dist)


def test_known_answers(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["kitten", "sitting", "mitten", "kitten"]})
    )
    got = {
        (r.s_a, r.s_b, r.dist)
        for r in edit_distance_pairs(df, max_dist=3).collect()
    }
    assert ("kitten", "mitten", 1) in got
    assert ("kitten", "sitting", 3) in got
    # duplicates collapse: no self-pair
    assert not any(a == b for a, b, _ in got)


def test_rejects_bad_params(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["x"]}))
    with pytest.raises(ValueError):
        edit_distance_pairs(df, max_dist=0)


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": [f"token{i:03d}xyz" for i in range(50)]})
    )
    plan = (
        edit_distance_pairs(df, max_dist=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
