"""Driver-contract guards: the three surfaces the round driver runs
must stay self-consistent — a typo in the bench headline or a
PRIORITY/oracle mismatch would fail the driver run, not a local test,
without these."""

from __future__ import annotations


def test_bench_headline_registered():
    from bench import HEADLINE
    from fiat2_spark.workloads import QUERIES

    missing = [q for q in HEADLINE if q not in QUERIES]
    assert not missing, f"bench headline names not registered: {missing}"


def test_priority_window_contract():
    from fiat2_spark.workloads import ORACLES, PRIORITY, QUERIES

    assert len(PRIORITY) == 50
    assert len(set(PRIORITY)) == 50, "duplicate names in the checked window"
    assert set(QUERIES) == set(ORACLES), "every query needs an oracle"
    assert list(QUERIES)[:50] == list(PRIORITY), "window must lead registration order"


def test_entry_contract_importable():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    assert set(q) == set(o) and len(q) >= 127


def test_python_udtf_escape_hatch(spark):
    """Spark 4 Python UDTFs complete the custom-operator escape-hatch
    surface (scalar: pandas_udf; aggregate: applyInPandas UDAF;
    table-valued: udtf) — a 1→N expansion whose logic genuinely needs
    Python runs lateral-joined against a table, partition-parallel.
    The engine's stance stands: this is the LAST resort (chunk_sliding
    does its 1→N in pure codegen'd expressions); the test pins that
    the hatch exists and composes with lateralJoin."""
    from pyspark.sql.functions import col, udtf

    @udtf(returnType="idx int, sent string")
    class SplitSentences:
        def eval(self, text: str):
            for i, s in enumerate(x.strip() for x in text.split(".") if x.strip()):
                yield i, s

    docs = spark.createDataFrame(
        [(1, "A b. C d."), (2, "One"), (3, "")], "doc_id long, body string"
    )
    spark.udtf.register("split_sentences", SplitSentences)
    docs.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        """
        SELECT doc_id, s.idx, s.sent
        FROM udtf_docs, LATERAL split_sentences(body) AS s
        ORDER BY doc_id, idx
        """
    ).collect()
    assert [(r["doc_id"], r["idx"], r["sent"]) for r in out] == [
        (1, 0, "A b"), (1, 1, "C d"), (2, 0, "One"),
    ]


def test_fingerprint_closure_sees_parenthesized_imports():
    """The rotation-premise closure must catch function-local
    parenthesized multiline imports (`from fiat2_spark.plans.sugar
    import (...)` inside dsl_comprehension) — the line-regex scanner
    this replaced missed them, which would have kept stale rows valid
    under sugar changes."""
    from tools.fingerprints import _closure

    dsl = _closure("fiat2_spark.workloads.dsl")
    assert "fiat2_spark.plans.sugar" in dsl
    assert "fiat2_spark.plans.compile" in dsl
    # and docstring cross-references must NOT connect the world
    assert "fiat2_spark.serving" not in dsl


def test_bench_final_line_stays_parseable_under_budget():
    """bench.py's last stdout line must stay a single parseable JSON
    object within the tail-capture budget no matter how many headline
    queries exist — the regression behind BENCH_r04's `parsed: null`."""
    import json

    from bench import compact_summary

    summary = {
        "metric": "headline_suite_total",
        "value": 123.456,
        "unit": "sec",
        "queries": {f"query_with_a_long_name_{i:03d}": i / 7.0 for i in range(500)},
        "sf": 0.1,
    }
    line = compact_summary(summary)
    assert len(line) <= 1500
    obj = json.loads(line)
    assert obj["metric"] == "headline_suite_total" and obj["n_queries"] == 500
    # the kept entries are the slowest ones
    kept = obj["queries"]
    assert kept and max(summary["queries"].values()) == max(kept.values())
    # r13: the below-cutoff remainder is published, so "fast" is
    # distinguishable from "gone" (the r12 PERF diff misread the tail
    # cutoff as 12 dropped queries): every query is accounted for
    # either by name or in the (n_below_cutoff, others_total) pair
    assert obj["n_below_cutoff"] == 500 - len(kept)
    assert abs(obj["others_total"]
               - sum(v for k, v in summary["queries"].items() if k not in kept)
               ) < 0.01
    # r12: BOTH host-regime controls must survive compaction — the
    # driver's tail capture is where compare_bench's load() scrapes
    # them from, so a dropped key silently degrades normalization
    summary2 = dict(summary, control_sec=0.5, control_scan_sec=0.3)
    obj2 = json.loads(compact_summary(summary2))
    assert obj2["control_sec"] == 0.5 and obj2["control_scan_sec"] == 0.3


def test_readme_query_count_matches_registry():
    """README's registry-size claim is generated evidence, not prose —
    it must equal len(QUERIES) (the r5 verdict caught it stale at 166
    when the registry held 172)."""
    import os
    import re

    from fiat2_spark.workloads import QUERIES

    readme = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md"),
        encoding="utf-8",
    ).read()
    m = re.search(r"\| `fiat2_spark/workloads/` \| (\d+) named queries", readme)
    assert m, "README workloads row missing"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} queries; registry has {len(QUERIES)}"
    )
