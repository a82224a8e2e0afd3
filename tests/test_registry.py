"""Registry-wide analysis smoke: every driver query and extra must
ANALYZE against the current testdata (catches schema/type drift like
the TIMESTAMP_NTZ events change at plan-build time, before the
driver's correctness harness does) and declare a matching oracle."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _entry():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as e

    return e


def test_registry_is_at_the_driver_cap_with_oracles():
    e = _entry()
    q, o = e.queries(), e.oracle_sql()
    assert len(q) == 50  # the driver records at most 50
    assert set(q) == set(o)
    xq, xo = e.extra_queries(), e.extra_oracle_sql()
    assert set(xq) == set(xo)
    assert not set(xq) & set(q)


def test_rotation_invariants():
    """Full rotation contract (VERDICT r10 next #7), previously
    verified by an ad-hoc per-round script: a bad rotation must fail
    the suite, not the driver."""
    e = _entry()
    q = set(e.queries())
    xq = set(e.extra_queries())
    # a name can appear in at most one of the two rotation tuples
    assert not set(e.ROTATED_IN) & set(e.ROTATED_OUT)
    assert len(set(e.ROTATED_IN)) == len(e.ROTATED_IN)  # no duplicates
    assert len(set(e.ROTATED_OUT)) == len(e.ROTATED_OUT)
    # ROTATED_IN is the historical log: a name rotated in and later
    # back out moves to extras — every logged name must still be
    # covered on ONE of the two surfaces, never dropped
    assert set(e.ROTATED_IN) <= q | xq, set(e.ROTATED_IN) - (q | xq)
    # the LIVE rotated-in set (the override dict) must sit in the
    # hard-signal registry in full
    assert set(e._rotated_in_queries()) <= q
    assert set(e._rotated_in_queries()) == set(e._rotated_in_oracles())
    # every rotated-out name keeps bit-exact coverage via extras
    assert set(e.ROTATED_OUT) <= xq, set(e.ROTATED_OUT) - xq
    # every entry on both surfaces is oracle-backed by a real SQL text
    for name, sql in {**e.oracle_sql(), **e.extra_oracle_sql()}.items():
        assert isinstance(sql, str) and sql.strip(), name


@pytest.mark.parametrize("which", ["main", "extras"])
def test_every_query_analyzes_against_current_testdata(spark, which):
    e = _entry()
    reg = e.queries() if which == "main" else e.extra_queries()
    failures = {}
    for name, fn in reg.items():
        try:
            fn(spark, SF_DIR).schema  # forces full analysis
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            failures[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:150]}"
    assert not failures, failures


def test_entry_returns_analyzable_flagship(spark):
    e = _entry()
    df = e.entry(spark)
    assert len(df.schema.fields) >= 19
