"""Catalyst supplies the reference's verified rewrite catalog — asserted.

SURVEY §4.1/§4.2 map each proven fiat2 rewrite (RelTransf.v /
Optimize.v) to a Catalyst rule and claim "built-in". These tests pin the
claims: each exercises the rewrite's input pattern and asserts the
optimized/physical plan shows the rewritten shape. If a Spark upgrade
ever stops delivering one of the reference's rewrites, this file goes
red."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from fiat2_spark.workloads.util import tbl
from tests.conftest import SF_SMOKE


def physical(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_combine_filters(spark):
    """efilter_efilter (Optimize.v:1421) / merge_if_head
    (RelTransf.v:50-55) ≈ CombineFilters: consecutive filters fuse into
    one conjunction."""
    li = tbl(spark, SF_SMOKE, "lineitem")
    df = li.filter(F.col("l_quantity") > 10).filter(F.col("l_discount") < 0.05)
    plan = optimized(df)
    assert plan.count("Filter ") == 1, plan


def test_collapse_projects(spark):
    """proj_proj (Optimize.v:1409) / to_proj_head ≈ CollapseProject:
    chained projections become one Project node."""
    li = tbl(spark, SF_SMOKE, "lineitem")
    df = (
        li.select("l_orderkey", "l_quantity")
        .select(F.col("l_orderkey"), (F.col("l_quantity") * 2).alias("q2"))
        .select((F.col("q2") + 1).alias("q3"))
    )
    plan = optimized(df)
    assert plan.count("Project ") == 1, plan


def test_filter_pushdown_through_join(spark):
    """filter_pushdown_head (RelTransf.v:441-448) ≈
    PushPredicateThroughJoin: a post-join predicate on one side's
    columns reaches that side's parquet scan."""
    o = tbl(spark, SF_SMOKE, "orders")
    c = tbl(spark, SF_SMOKE, "customer")
    df = o.join(c, o.o_custkey == c.c_custkey).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = physical(df)
    assert "PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)" in plan, plan


def test_column_pruning_reaches_scan(spark):
    """proj_pushdown_left/right (Optimize.v:966,1034) ≈ ColumnPruning:
    a two-column projection over a join reads only the needed columns
    from each scan."""
    o = tbl(spark, SF_SMOKE, "orders")
    c = tbl(spark, SF_SMOKE, "customer")
    df = o.join(c, o.o_custkey == c.c_custkey).select("o_orderkey", "c_name")
    plan = physical(df)
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert len(reads) == 2
    joined = " ".join(reads)
    assert "o_totalprice" not in joined and "c_acctbal" not in joined, joined


def test_constant_folding(spark):
    """No constants-only pass exists in the reference (SURVEY §4.2 note);
    Catalyst's ConstantFolding supplies it: 2+3 never survives to the
    plan."""
    li = tbl(spark, SF_SMOKE, "lineitem")
    df = li.select((F.lit(2) + F.lit(3)).alias("c"), "l_orderkey")
    plan = optimized(df)
    assert "(2 + 3)" not in plan and "5 AS c" in plan, plan


def test_distinct_becomes_aggregate(spark):
    """set_of / push_down_collection (CollectionTransf.v:24-50): set
    semantics = distinct placement; Catalyst's
    ReplaceDistinctWithAggregate turns it into a hash aggregate (partial
    + final — no sort-based dedup)."""
    o = tbl(spark, SF_SMOKE, "orders")
    plan = physical(o.select("o_orderpriority").distinct())
    assert "HashAggregate" in plan and "Sort " not in plan, plan


def test_join_constraint_propagation(spark):
    """filter_into_join (Optimize.v:1202-1285): an equi-join key filter
    propagates to BOTH sides' scans (InferFiltersFromConstraints +
    pushdown) — the reference applies the rewrite once per side."""
    o = tbl(spark, SF_SMOKE, "orders")
    c = tbl(spark, SF_SMOKE, "customer")
    df = o.join(c, o.o_custkey == c.c_custkey).filter(F.col("c_custkey") < 100)
    plan = physical(df)
    assert "LessThan(c_custkey,100)" in plan, plan
    assert "LessThan(o_custkey,100)" in plan, plan
