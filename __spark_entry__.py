"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — name → fn(spark, sf_dir) → DataFrame, one per implemented
operator from SURVEY.md §2 (and the pipeline extensions).
``oracle_sql()`` — matching DuckDB SQL for the differential gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fiat2_spark.workloads import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.
    tpch_q3_shape composes the optimization stack (pushdown to all three
    scans + broadcast dimension + DECIMAL partial agg + top-k) in one
    plan — the engine's showcase."""
    return QUERIES["tpch_q3_shape"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
