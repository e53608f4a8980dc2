"""Property-based agreement tests for the quantile-bucket family
(`grouped_row_number` / `grouped_listagg`) against plain-window models:
hypothesis drives adversarial order-value distributions — heavy
duplicates (every value equal), skew, negative values, single groups,
bucket counts from 1 to 8 — the shapes where a cut point landing inside
a tie group would corrupt ranks if bucketing were not a pure function
of the value."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fiat2_spark.operators.relational import grouped_listagg, grouped_row_number

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# (group, order-value) rows: few groups, heavily colliding values
_ROWS = st.lists(
    st.tuples(st.sampled_from(["g0", "g1", "g2"]), st.integers(-3, 3)),
    min_size=1,
    max_size=25,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], "g string, v long, uid long"
    )


@settings(**_SETTINGS)
@given(rows=_ROWS, n_buckets=st.integers(1, 8))
@pytest.mark.slow  # >=15s model-differential sweep; default run deselects (pytest.ini)
def test_grouped_row_number_matches_plain_window(spark, rows, n_buckets):
    from pyspark.sql import Window as W

    df = _df(spark, rows)
    fast = grouped_row_number(
        df, ["g"], "v", tiebreak=[F.col("uid")], n_buckets=n_buckets
    )
    w = W.partitionBy("g").orderBy(F.col("v").asc(), F.col("uid").asc())
    plain = df.withColumn("rn", F.row_number().over(w).cast("long"))
    a = {(r["g"], r["uid"]): r["rn"] for r in fast.collect()}
    b = {(r["g"], r["uid"]): r["rn"] for r in plain.collect()}
    assert a == b


@settings(**_SETTINGS)
@given(rows=_ROWS, n_buckets=st.integers(1, 8))
def test_grouped_listagg_matches_plain_concat(spark, rows, n_buckets):
    df = _df(spark, rows)
    fast = grouped_listagg(
        df, ["g"], "v", F.col("v").cast("string"), n_buckets=n_buckets
    )
    plain = df.groupBy("g").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("v").alias("o"), F.col("v").cast("string").alias("v"))
                    )
                ),
                lambda x: x["v"],
            ),
            ",",
        ).alias("listagg"),
        F.count(F.lit(1)).alias("n"),
    )
    a = {r["g"]: (r["listagg"], r["n"]) for r in fast.collect()}
    b = {r["g"]: (r["listagg"], r["n"]) for r in plain.collect()}
    assert a == b


@settings(**_SETTINGS)
@given(rows=_ROWS, n_buckets=st.integers(1, 8))
@pytest.mark.slow  # >=15s model-differential sweep; default run deselects (pytest.ini)
def test_grouped_running_sum_matches_plain_window_prop(spark, rows, n_buckets):
    from pyspark.sql import Window as W

    from fiat2_spark.operators.relational import grouped_running_sum

    df = _df(spark, rows)
    fast = grouped_running_sum(
        df, ["g"], "v", F.col("v").cast("long"),
        tiebreak=[F.col("uid")], n_buckets=n_buckets,
    )
    w = (
        W.partitionBy("g")
        .orderBy(F.col("v").asc(), F.col("uid").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    plain = df.withColumn("cum", F.sum(F.col("v").cast("long")).over(w))
    a = {(r["g"], r["uid"]): r["cum"] for r in fast.collect()}
    b = {(r["g"], r["uid"]): r["cum"] for r in plain.collect()}
    assert a == b


@settings(**_SETTINGS)
@given(rows=_ROWS, n_buckets=st.integers(1, 8))
@pytest.mark.slow  # >=15s model-differential sweep; default run deselects (pytest.ini)
def test_grouped_rank_family_matches_plain_windows_prop(spark, rows, n_buckets):
    """rank/dense_rank/percent_rank/ntile/cume_dist through the bucket
    scheme vs the plain group-partitioned windows, on duplicate-heavy
    order values — the tie groups land on bucket boundaries here, the
    exact case the value-pure bucketing must keep intact. Tiebreak on
    uid makes the composite unique, as in the registered query."""
    from pyspark.sql import Window as W

    from fiat2_spark.operators.relational import grouped_rank_family

    df = _df(spark, rows)
    fast = grouped_rank_family(
        df, ["g"], "v", tiebreak=[F.col("uid")], n_buckets=n_buckets
    )
    w = W.partitionBy("g").orderBy(F.col("v").asc(), F.col("uid").asc())
    plain = df.select(
        "g", "uid",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.cume_dist().over(w).alias("cdist"),
    )
    cols = ("rnk", "drnk", "prnk", "quartile", "cdist")
    a = {(r["g"], r["uid"]): tuple(r[c] for c in cols) for r in fast.collect()}
    b = {(r["g"], r["uid"]): tuple(r[c] for c in cols) for r in plain.collect()}
    assert a == b


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g0", "g1"]),
            st.integers(-5, 5).map(float),  # heavy value ties
        ),
        min_size=1,
        max_size=25,
    ),
    n_buckets=st.integers(1, 8),
)
@pytest.mark.slow  # >=15s model-differential sweep; default run deselects (pytest.ini)
def test_grouped_percentiles_match_numpy(spark, rows, n_buckets):
    """Exact interpolated percentiles through the distributed-ranking
    scheme vs numpy's linear-interpolation percentile — an independent
    third model — under heavy value ties (the no-tiebreak case the
    operator's docstring claims is safe)."""
    import numpy as np

    from fiat2_spark.operators.relational import grouped_percentiles

    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: (r["p50"], r["p90"], r["n"])
        for r in grouped_percentiles(
            df, ["g"], "v", {"p50": 0.5, "p90": 0.9}, n_buckets=n_buckets
        ).collect()
    }
    want = {}
    for g in {g for g, _ in rows}:
        vs = sorted(v for gg, v in rows if gg == g)
        want[g] = (
            float(np.percentile(vs, 50, method="linear")),
            float(np.percentile(vs, 90, method="linear")),
            len(vs),
        )
    assert set(got) == set(want)
    for g in want:
        assert got[g][2] == want[g][2]
        assert abs(got[g][0] - want[g][0]) < 1e-9, (g, got[g], want[g])
        assert abs(got[g][1] - want[g][1]) < 1e-9, (g, got[g], want[g])


@settings(**_SETTINGS)
@given(rows=_ROWS, n_buckets=st.integers(1, 8))
@pytest.mark.slow  # >=15s model-differential sweep; default run deselects (pytest.ini)
def test_grouped_listagg_distinct_value_column(spark, rows, n_buckets):
    """LISTAGG where the concatenated value is NOT the order key: ties
    on the order value must resolve by the value itself (the documented
    ``string_agg(value ORDER BY order_col, value)`` contract), across
    every bucket split."""
    df = _df(spark, rows)
    val = F.concat(F.lit("u"), F.col("uid").cast("string"))
    fast = grouped_listagg(df, ["g"], "v", val, n_buckets=n_buckets)
    plain = df.groupBy("g").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("v").alias("o"), val.alias("v")))
                ),
                lambda x: x["v"],
            ),
            ",",
        ).alias("listagg"),
        F.count(F.lit(1)).alias("n"),
    )
    a = {r["g"]: (r["listagg"], r["n"]) for r in fast.collect()}
    b = {r["g"]: (r["listagg"], r["n"]) for r in plain.collect()}
    assert a == b
