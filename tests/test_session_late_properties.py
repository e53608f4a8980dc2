"""Property-based agreement tests for the round-4 continuation wave:
multiset (ALL) set algebra vs a Counter model, the Q21 semi+anti
correlated self-join pair vs a naive Python model, and quantized
Lloyd's k-means vs an exact integer Python implementation. Hypothesis
drives the duplicate-heavy / tie-heavy shapes where each would break:
repeated keys (multiset multiplicities), orders with one vs many
suppliers and shipdate ties (Q21's EXISTS/NOT EXISTS edge), and
equidistant vectors (k-means argmin tie-break on cid)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_KEYS = st.lists(st.integers(0, 4), min_size=0, max_size=12)


@settings(**_SETTINGS)
@given(a=_KEYS, b=_KEYS, c=_KEYS)
def test_intersect_except_all_match_counter_model(spark, a, b, c):
    """(a INTERSECT ALL b) EXCEPT ALL c == the Counter algebra:
    min-multiplicity intersection, then per-occurrence subtraction."""
    df = lambda xs: spark.createDataFrame([(x,) for x in xs], "k long")  # noqa: E731
    got = Counter(r["k"] for r in df(a).intersectAll(df(b)).exceptAll(df(c)).collect())
    inter = Counter(a) & Counter(b)
    want = inter - Counter(c)
    assert got == +want


_LINES = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 2), st.integers(0, 3)),
    min_size=1,
    max_size=12,
)


@settings(**_SETTINGS)
@given(lines=_LINES)
def test_q21_semi_anti_pair_matches_naive(spark, lines):
    """The straggler predicate (exists another supplier on the order;
    no other supplier shipped later) as semi+anti joins equals the
    direct quantifier evaluation — including shipdate ties, where BOTH
    tied stragglers must survive (the NOT EXISTS is strict >)."""
    rows = [(i, ok, sk, d) for i, (ok, sk, d) in enumerate(lines)]
    li = spark.createDataFrame(rows, "lid long, ok long, sk long, d long")
    l1, l2, l3 = li.alias("l1"), li.alias("l2"), li.alias("l3")
    got = sorted(
        r["lid"]
        for r in l1.join(
            l2.select("ok", "sk").alias("l2"),
            (F.col("l2.ok") == F.col("l1.ok")) & (F.col("l2.sk") != F.col("l1.sk")),
            "left_semi",
        )
        .join(
            l3.select("ok", "sk", "d").alias("l3"),
            (F.col("l3.ok") == F.col("l1.ok"))
            & (F.col("l3.sk") != F.col("l1.sk"))
            & (F.col("l3.d") > F.col("l1.d")),
            "left_anti",
        )
        .collect()
    )
    want = sorted(
        lid
        for lid, ok, sk, d in rows
        if any(ok2 == ok and sk2 != sk for _, ok2, sk2, _ in rows)
        and not any(ok2 == ok and sk2 != sk and d2 > d for _, ok2, sk2, d2 in rows)
    )
    assert got == want


_VECS = st.lists(
    st.lists(st.integers(-3, 3), min_size=2, max_size=2),
    min_size=2,
    max_size=10,
)


@settings(**_SETTINGS)
@given(vecs=_VECS)
def test_kmeans_quantized_matches_python_model(spark, vecs):
    """One Lloyd iteration in quantized-integer space (the
    `kmeans_lloyd` scheme at k=2, dims=2) equals an exact Python
    model: integer squared distances, argmin tie-broken on cid, and
    floor(sum/count) centroid updates."""
    from pyspark.sql import Window as W

    k = 2
    rows = [(i, v) for i, v in enumerate(vecs)]
    e = spark.createDataFrame(rows, "vec_id long, vec array<long>")
    qe = e.select("vec_id", F.posexplode("vec").alias("dim", "qv"))
    cent = qe.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), "dim", F.col("qv").alias("qc")
    )
    d = (
        qe.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "cid")
        .agg(F.sum((F.col("qv") - F.col("qc")) * (F.col("qv") - F.col("qc"))).alias("d"))
    )
    a = (
        d.withColumn("rn", F.row_number().over(W.partitionBy("vec_id").orderBy("d", "cid")))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    got = {
        (r["cid"], r["dim"]): r["qc"]
        for r in qe.join(a, "vec_id")
        .groupBy("cid", "dim")
        .agg(F.floor(F.sum("qv").cast("double") / F.count(F.lit(1))).cast("long").alias("qc"))
        .collect()
    }

    # python model
    cents = {i: vecs[i] for i in range(min(k, len(vecs)))}
    assign = {}
    for vid, v in rows:
        best = min(
            cents.items(),
            key=lambda kv: (sum((x - c) ** 2 for x, c in zip(v, kv[1])), kv[0]),
        )
        assign[vid] = best[0]
    import math

    want = {}
    for cid in set(assign.values()):
        members = [vecs[vid] for vid, c in assign.items() if c == cid]
        for dim in range(2):
            s = sum(m[dim] for m in members)
            want[(cid, dim)] = math.floor(s / len(members))
    assert got == want


_ORDERS = st.lists(
    st.tuples(st.integers(0, 5), st.booleans()),  # (custkey, is_urgent)
    min_size=0,
    max_size=15,
)


@settings(**_SETTINGS)
@given(orders=_ORDERS)
def test_q13_count_distribution_keeps_zero_groups(spark, orders):
    """The Q13 idiom: the order-class filter must live in the LEFT JOIN
    condition so customers with only filtered-out (or no) orders
    survive with count 0 — hypothesis drives customers whose orders
    are all urgent, the case a WHERE-clause filter would silently
    drop."""
    customers = list(range(6))
    c = spark.createDataFrame([(k,) for k in customers], "ck long")
    o = spark.createDataFrame(
        [(i, ck, urgent) for i, (ck, urgent) in enumerate(orders)],
        "oid long, ock long, urgent boolean",
    )
    per = (
        c.join(o.filter(~F.col("urgent")), F.col("ock") == F.col("ck"), "left")
        .groupBy("ck")
        .agg(F.count("oid").alias("n"))
    )
    got = sorted((r["ck"], r["n"]) for r in per.collect())
    want = sorted(
        (ck, sum(1 for ock, urgent in orders if ock == ck and not urgent))
        for ck in customers
    )
    assert got == want


_QTYS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(1, 100)),  # (partkey, quantity)
    min_size=1,
    max_size=15,
)


@settings(**_SETTINGS)
@given(rows=_QTYS)
def test_q17_below_group_average_filter_matches_model(spark, rows):
    """The Q17 idiom: rows strictly below 0.2x their own group's
    average — the decorrelated per-group aggregate joined back must
    agree with direct per-row evaluation, including single-row groups
    (a row is never below 0.2x its own value for positive values)."""
    df = spark.createDataFrame(
        [(i, pk, q) for i, (pk, q) in enumerate(rows)], "rid long, pk long, q long"
    )
    avg = df.groupBy(F.col("pk").alias("apk")).agg(
        (F.sum("q").cast("double") / F.count(F.lit(1))).alias("a")
    )
    got = sorted(
        r["rid"]
        for r in df.join(avg, F.col("apk") == F.col("pk"))
        .filter(F.col("q") < F.lit(0.2) * F.col("a"))
        .collect()
    )
    want = sorted(
        rid
        for rid, (pk, q) in enumerate(rows)
        if q < 0.2 * (sum(q2 for pk2, q2 in rows if pk2 == pk)
                      / sum(1 for pk2, _ in rows if pk2 == pk))
    )
    assert got == want


_VALS = st.lists(st.integers(0, 1000), min_size=20, max_size=200)


@settings(**_SETTINGS)
@given(vals=_VALS)
def test_approx_percentile_rank_error_bound(spark, vals):
    """The quantile-sketch contract (completing the sketch family next
    to CMS and HLL): `approx_percentile(col, q, accuracy)` must return
    an element whose RANK is within n/accuracy of the true q-rank —
    the published error model of Spark's KLL-style digest (rank
    convention differences between implementations absorbed into the
    window). Hypothesis drives duplicate-heavy and skewed lists."""
    acc = 50
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for q in (0.1, 0.5, 0.9):
        got = df.agg(
            F.expr(f"approx_percentile(v, {q}, {acc})").alias("p")
        ).collect()[0]["p"]
        import math

        n = len(vals)
        s = sorted(vals)
        # rank window: the sketch may return any element within
        # n/accuracy ranks of the target; the target itself spans the
        # floor(q*(n-1))..ceil(q*n) convention range
        err = math.ceil(n / acc)
        lo = max(0, math.floor(q * (n - 1)) - err - 1)
        hi = min(n - 1, math.ceil(q * n) + err + 1)
        assert s[lo] <= got <= s[hi]
