"""Differential gate replica: every workload with an oracle must match
DuckDB on sf0.001 (fast loop; the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from fiat2_spark.workloads import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle import compare, duck_conn


@pytest.fixture(scope="module")
def con():
    c = duck_conn(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, con, name):
    df = QUERIES[name](spark, SF_SMOKE)
    ok, detail = compare(df, con, ORACLES[name])
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0
