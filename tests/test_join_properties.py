"""Property-based agreement tests for the time-join operators against
naive quadratic models: hypothesis drives timestamps onto exact bin and
window boundaries — the off-by-one shapes (right_ts == left_ts,
right_ts == left_ts - window, bin-edge landings) where the binned
equi-join rewrite or the union+window as-of trick would silently drop
or duplicate matches if the covering-bucket math were wrong."""

from __future__ import annotations

import pytest

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fiat2_spark.operators.relational import asof_join, range_join_binned

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_BASE = datetime.datetime(2024, 1, 1)

# offsets in seconds; multiples of 30 land exactly on bin edges for
# window_seconds=60, and duplicates collide on both key and time
_OFFS = st.lists(
    st.tuples(st.sampled_from(["k0", "k1"]), st.integers(0, 8).map(lambda x: x * 30)),
    min_size=1,
    max_size=10,
)


def _ts(off):
    return _BASE + datetime.timedelta(seconds=off)


@settings(**_SETTINGS)
@given(lefts=_OFFS, rights=_OFFS)
@pytest.mark.slow  # >=15s model-differential sweep; default run deselects (pytest.ini)
def test_range_join_binned_matches_naive(spark, lefts, rights):
    W = 60
    l = spark.createDataFrame(
        [(k, _ts(o), i) for i, (k, o) in enumerate(lefts)], "k string, lt timestamp, lid long"
    )
    r = spark.createDataFrame(
        [(k, _ts(o), i) for i, (k, o) in enumerate(rights)], "k string, rt timestamp, rid long"
    )
    fast = range_join_binned(l, r, ["k"], "lt", "rt", W)
    naive = l.join(r.withColumnRenamed("k", "k2"),
                   (F.col("k") == F.col("k2"))
                   & (F.col("rt") <= F.col("lt"))
                   & (F.col("rt") >= F.col("lt") - F.expr(f"INTERVAL {W} SECONDS")))
    a = sorted((row["lid"], row["rid"]) for row in fast.collect())
    b = sorted((row["lid"], row["rid"]) for row in naive.collect())
    assert a == b


@settings(**_SETTINGS)
@given(lefts=_OFFS, rights=_OFFS)
def test_asof_join_matches_naive(spark, lefts, rights):
    # right side must be unique per (key, ts): dedup keeping max rid
    rd = {}
    for i, (k, o) in enumerate(rights):
        rd[(k, o)] = i
    l = spark.createDataFrame(
        [(k, _ts(o), i) for i, (k, o) in enumerate(lefts)], "k string, ts timestamp, lid long"
    )
    r = spark.createDataFrame(
        [(k, _ts(o), i) for (k, o), i in rd.items()], "k string, ts timestamp, rid long"
    )
    fast = {row["lid"]: row["rid"] for row in asof_join(l, r, ["k"], "ts", ["rid"]).collect()}
    # naive model: greatest right ts <= left ts per key; ties on ts keep
    # that (k, ts)'s single right row
    naive = {}
    for i, (k, o) in enumerate(lefts):
        cands = [(o2, rid) for (k2, o2), rid in rd.items() if k2 == k and o2 <= o]
        naive[i] = max(cands)[1] if cands else None
    assert fast == naive


def test_asof_and_range_join_empty_sides(spark):
    """Empty sides: an empty right leaves every left row unmatched
    (null fill for as-of, zero pairs for the range join); an empty left
    yields zero rows from both."""
    l = spark.createDataFrame([("k0", _ts(0), 0)], "k string, ts timestamp, lid long")
    r0 = spark.createDataFrame([], "k string, ts timestamp, rid long")
    got = asof_join(l, r0, ["k"], "ts", ["rid"]).collect()
    assert len(got) == 1 and got[0]["rid"] is None

    l_rj = spark.createDataFrame([("k0", _ts(0), 0)], "k string, lt timestamp, lid long")
    r_rj = spark.createDataFrame([], "k string, rt timestamp, rid long")
    assert range_join_binned(l_rj, r_rj, ["k"], "lt", "rt", 60).count() == 0

    l0 = spark.createDataFrame([], "k string, ts timestamp, lid long")
    r1 = spark.createDataFrame([("k0", _ts(0), 0)], "k string, ts timestamp, rid long")
    assert asof_join(l0, r1, ["k"], "ts", ["rid"]).count() == 0


@settings(**_SETTINGS)
@given(
    lefts=st.lists(st.integers(0, 5), min_size=1, max_size=20),
    rights=st.lists(st.integers(0, 5), min_size=1, max_size=10),
    salt=st.integers(2, 8),
)
def test_salted_join_matches_plain_prop(spark, lefts, rights, salt):
    """Salting must be semantically invisible for inner equi-joins at
    any salt factor: random keys with heavy duplication and keys
    present on only one side, result multiset compared against the
    plain join (each left-right row pairing appears the same number of
    times)."""
    from fiat2_spark.operators.relational import salted_equi_join

    l = spark.createDataFrame(
        [(k, i) for i, k in enumerate(lefts)], "lk long, lid long"
    )
    r = spark.createDataFrame(
        [(k, i) for i, k in enumerate(rights)], "rk long, rid long"
    )
    fast = sorted(
        (row["lid"], row["rid"])
        for row in salted_equi_join(l, r, "lk", "rk", salt=salt).collect()
    )
    plain = sorted(
        (row["lid"], row["rid"])
        for row in l.join(r, F.col("lk") == F.col("rk")).collect()
    )
    assert fast == plain
