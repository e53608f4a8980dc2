#!/usr/bin/env python
"""OLAP walkthrough — the analyst surface of this engine: the TPC-H
shape suite with the physical-plan properties a 100 TB cluster needs,
checked live rather than taken on faith.

Each query is a registered, oracle-checked entry (see
`fiat2_spark/workloads/core.py`); this demo runs four of them and
inspects the plan Catalyst actually produced:

1. tpch_q1_shape  — scan-heavy pricing summary: ONE lineitem pass,
                    map-side partial aggregation, date filter pushed
                    into the parquet scan;
2. tpch_q3_shape  — pushdown + broadcast dimension + DECIMAL partial
                    agg + TakeOrderedAndProject top-k, composed;
3. tpch_q10_shape — quarter-gated fact join with the returned-lineitem
                    filter pushed down, AQE sizing the fact shuffle;
4. dpp_partitioned_join — join-driven dynamic partition pruning: the
                    partitioned fact scan carries a dynamicpruning
                    subquery fed by the broadcast dimension.

Run: python examples/olap_demo.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fiat2_spark.session import get_spark
from fiat2_spark.workloads import QUERIES


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="fiat2-olap-demo")

    checks = {
        "tpch_q1_shape": [
            ("date filter pushed to scan", "LessThanOrEqual(l_shipdate"),
            ("map-side partial aggregation", "partial_sum"),
        ],
        "tpch_q3_shape": [
            ("segment filter pushed to scan", "EqualTo(c_mktsegment,BUILDING)"),
            ("dimension broadcast", "BroadcastHashJoin"),
            ("top-k without global sort", "TakeOrderedAndProject"),
        ],
        "tpch_q10_shape": [
            ("returnflag filter pushed to scan", "EqualTo(l_returnflag,R)"),
            ("top-20 without global sort", "TakeOrderedAndProject"),
        ],
        "dpp_partitioned_join": [
            ("runtime partition pruning", "dynamicpruningexpression"),
        ],
    }
    failed = False
    for name, props in checks.items():
        df = QUERIES[name](spark, sf_dir)
        plan = plan_of(df)
        n = df.count()
        print(f"{name} rows: {n}")
        for label, needle in props:
            ok = needle in plan
            failed = failed or not ok
            print(f"  [{'ok' if ok else 'MISSING'}] {label}")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
