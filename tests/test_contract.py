"""Driver-contract guards: the three surfaces the round driver runs
must stay self-consistent — a typo in the bench headline or a
PRIORITY/oracle mismatch would fail the driver run, not a local test,
without these."""

from __future__ import annotations


def test_bench_headline_registered():
    from bench import HEADLINE
    from fiat2_spark.workloads import QUERIES

    missing = [q for q in HEADLINE if q not in QUERIES]
    assert not missing, f"bench headline names not registered: {missing}"


def test_priority_window_contract():
    from fiat2_spark.workloads import ORACLES, PRIORITY, QUERIES

    assert len(PRIORITY) == 50
    assert len(set(PRIORITY)) == 50, "duplicate names in the checked window"
    assert set(QUERIES) == set(ORACLES), "every query needs an oracle"
    assert list(QUERIES)[:50] == list(PRIORITY), "window must lead registration order"


def test_entry_contract_importable():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    assert set(q) == set(o) and len(q) >= 127
