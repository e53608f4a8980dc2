"""Count-Min sketch over a value column — the mergeable-summary pattern
for approximate frequency at scale.

The reference maintains exact materialized aggregates (SumAgg.v,
MinAgg.v); a CMS is the sublinear cousin for frequency queries over
unbounded key domains (token counts over 100 TB of text): a
depth × width grid of counters where every value increments one cell
per hash row, and a point estimate reads the minimum of its cells —
a one-sided (over-counting) bound.

Scale design: the sketch is *distributive* — per-partition sub-sketches
merge by cell-wise addition, which is exactly Spark's partial
aggregation. Building over any input shuffles at most depth × width
counter rows per partition, independent of data size; point queries are
a broadcast join against the tiny sketch. Hashes are md5-derived (no
RNG), so a SQL oracle recomputes the identical sketch — the approximate
operator is differentially tested exactly, like the LSH family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 64


def cms_cell(val: Column, d: int, width: int = CMS_WIDTH) -> Column:
    """Row-d cell index: first 8 hex digits of md5('d#' ‖ value) mod width.
    32-bit base hash, always positive — identical in any md5-capable
    engine."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{d}#"), val)), 1, 8), 16, 10).cast("long")
    return h % width


def cms_build(
    df: DataFrame,
    val_col: str,
    weight_col: str | None = None,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Sketch table (d, cell, cnt), ≤ depth × width rows. One explode +
    partial/final aggregate — the shuffle carries sub-sketches, never
    data. Prefer building from a pre-aggregated (value, count) table
    with ``weight_col``: the cell hashing then runs over the distinct
    values (vocabulary), not every occurrence — the value-count groupBy
    is a plain word-count whose shuffle is already |vocab|-sized."""
    cells = df.select(
        F.col(weight_col).alias("__w") if weight_col else F.lit(1).cast("long").alias("__w"),
        F.explode(
            F.array(*[
                F.struct(F.lit(d).alias("d"), cms_cell(F.col(val_col), d, width).alias("cell"))
                for d in range(depth)
            ])
        ).alias("dc"),
    )
    return cells.groupBy(F.col("dc.d").alias("d"), F.col("dc.cell").alias("cell")).agg(
        F.sum("__w").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    q_col: str = "tok",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Point estimates: est(q) = min_d sketch[d][cell_d(q)] ≥ true count.
    A value the sketch never saw may still land in occupied cells — the
    estimate is then the (deterministic) CMS over-count, never an error.
    Broadcast-joins the tiny sketch; no shuffle of the query set."""
    qcells = queries.select(
        F.col(q_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(d).alias("d"), cms_cell(F.col(q_col), d, width).alias("cell"))
                for d in range(depth)
            ])
        ).alias("dc"),
    ).select(q_col, F.col("dc.d").alias("d"), F.col("dc.cell").alias("cell"))
    joined = qcells.join(F.broadcast(sketch), ["d", "cell"], "left")
    return joined.groupBy(q_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est")
    )
