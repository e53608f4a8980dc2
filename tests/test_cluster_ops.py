"""Unit tests for duplicate clustering and interpolated percentiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from fiat2_spark.operators.dedup import dup_clusters


def test_dup_clusters_chain_multi_iteration(spark):
    """A 6-node chain needs several propagation rounds: min label must
    travel the full diameter. Second component + a self-contained pair
    check isolation."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (20, 21), (21, 20)],
        "id_a long, id_b long",
    )
    got = {r["doc"]: r["cluster"] for r in dup_clusters(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
        10: 10, 11: 10,
        20: 20, 21: 20,
    }


def test_dup_clusters_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dup_clusters(pairs).count() == 0


def test_percentile_cont_matches_native(spark):
    """The explicit sorted-array interpolation in the percentile_cont
    workload equals Spark's native `percentile` to 1e-9 (same
    percentile_cont semantics, different evaluation)."""
    from fiat2_spark.workloads.core import percentile_cont
    from tests.conftest import SF_SMOKE
    from fiat2_spark.workloads.util import tbl

    ours = {
        r["prio"]: (r["p50"], r["p90"])
        for r in percentile_cont(spark, SF_SMOKE).collect()
    }
    native = {
        r["prio"]: (r["p50"], r["p90"])
        for r in tbl(spark, SF_SMOKE, "orders")
        .groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        )
        .collect()
    }
    assert ours.keys() == native.keys() and len(ours) > 0
    for k in ours:
        assert abs(ours[k][0] - native[k][0]) < 1e-9
        assert abs(ours[k][1] - native[k][1]) < 1e-9


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_dup_clusters_star_long_chain_and_random(spark):
    """Star contraction (Kiveris et al. 2014) must label a 60-node
    chain — diameter far beyond its O(log²) round budget — plus a
    random graph, identically to a union-find ground truth AND to the
    propagation-based dup_clusters."""
    import random

    from fiat2_spark.operators.dedup import dup_clusters_star

    rng = random.Random(7)
    chain = [(i, i + 1) for i in range(100, 160)]
    blob = [(rng.randrange(0, 40), rng.randrange(0, 40)) for _ in range(60)]
    blob = [(a, b) for a, b in blob if a != b]
    edges = chain + blob
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    want = _uf_components(edges)
    got = {r["doc"]: r["cluster"] for r in dup_clusters_star(pairs).collect()}
    assert got == want
    prop = {r["doc"]: r["cluster"] for r in dup_clusters(pairs, max_iter=100).collect()}
    assert got == prop


def test_dup_clusters_star_empty(spark):
    from fiat2_spark.operators.dedup import dup_clusters_star

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dup_clusters_star(pairs).count() == 0


def test_recursive_cte_cap_reaches_fixpoint(spark):
    """bfs_recursive_cte's depth cap (6, derived from measured source
    eccentricity <=3 across shipped SFs, x2 margin) must be SUFFICIENT:
    the capped engine-run closure has to equal the driver-orchestrated
    `bfs` fixpoint, which terminates on the true empty frontier. If the
    testdata generator ever reshapes the part graph past the cap, this
    fails before the oracle window does."""
    from fiat2_spark.workloads import QUERIES
    from tests.conftest import SF_SMOKE

    cte = {
        (r["node"], r["depth"])
        for r in QUERIES["bfs_recursive_cte"](spark, SF_SMOKE).collect()
    }
    fix = {(r["node"], r["depth"]) for r in QUERIES["bfs"](spark, SF_SMOKE).collect()}
    assert cte == fix
