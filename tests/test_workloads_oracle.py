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


def test_bpe_oracle_degenerate_corpus_agrees(spark):
    """ADVICE r9: when the pair table runs dry before n_merges the
    engine breaks early; the oracle's LEFT-JOIN/COALESCE rewrite guard
    must carry the vocab forward unchanged instead of letting an empty
    argmax cross join empty every later CTE. A one-word corpus
    exhausts its pairs after two merges; both the 8-merge learner and
    the 8-merge encoder must still agree with their oracles (the
    unguarded encode oracle returned ZERO rows here)."""
    import duckdb
    import pandas as pd

    from fiat2_spark.operators import text as TX
    from fiat2_spark.workloads.pipeline import (
        _bpe_encode_oracle,
        _bpe_merges_oracle,
    )

    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["ab", "ab"]})
    d = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("documents", pdf)
    try:
        _, mdf = TX.bpe_learn(d, "text", n_merges=8)
        ok, detail = compare(mdf, con, _bpe_merges_oracle(8))
        assert ok, detail
        merges = [(r["lhs"], r["rhs"]) for r in mdf.orderBy("step").collect()]
        assert len(merges) == 2, merges
        enc = TX.bpe_encode(d, "doc_id", "text", merges)
        assert enc.count() == 2
        ok, detail = compare(enc, con, _bpe_encode_oracle(8))
        assert ok, detail
    finally:
        con.close()
