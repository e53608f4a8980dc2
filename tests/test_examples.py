"""The example walkthroughs are user-facing entry points — run them
end-to-end at sf0.001 so they can't rot as the operator APIs evolve.
Both reuse the suite's JVM via get_spark's getOrCreate and never stop
the session."""

from __future__ import annotations

import pytest

import runpy
import sys

from tests.conftest import SF_SMOKE


def _run(script: str, capsys):
    argv = sys.argv
    sys.argv = [script, SF_SMOKE]
    try:
        runpy.run_path(script, run_name="__main__")
    finally:
        sys.argv = argv
    return capsys.readouterr().out


@pytest.mark.slow  # >=15s model-differential sweep; default run deselects (pytest.ini)
def test_pipeline_demo_runs(spark, capsys):
    out = _run("examples/pipeline_demo.py", capsys)
    assert "corpus" in out and "context windows packed" in out
    assert "split sizes" in out
    # the funnel only narrows (count lines only; the split-sizes line
    # prints a dict, not a single count)
    nums = [
        int(l.rsplit(":", 1)[1])
        for l in out.strip().splitlines()
        if ":" in l and l.rsplit(":", 1)[1].strip().isdigit()
    ]
    assert all(a >= b for a, b in zip(nums[:5], nums[1:6]))


def test_dsl_demo_runs(spark, capsys):
    out = _run("examples/dsl_demo.py", capsys)
    assert out.strip()
    # the auto-index EXPLAIN surface (VERDICT r7 task 8): the demo must
    # print the decision — table, structure, aux slot, maintenance rule
    # — the analog of Ex_Employee.v:37-45's visible heuristics lists
    assert "== auto-index plan ==" in out
    assert "dict_idx(key=id)" in out
    assert "__idx_dict__inv__id" in out
    assert "cons_to_insert" in out
    assert "sum_agg(key=price)" in out
    assert "out_sum = 125" in out  # 5 + 20 + 40 + 60


def test_olap_demo_runs(spark, capsys):
    out = _run("examples/olap_demo.py", capsys)
    assert "tpch_q1_shape rows:" in out
    assert "MISSING" not in out  # every plan property held


def test_retrieval_demo_runs(spark, capsys):
    out = _run("examples/retrieval_demo.py", capsys)
    assert "quality gate:" in out
    assert "hybrid top-10" in out
    assert "label-vote accuracy" in out
    assert "top-k prune present" in out
