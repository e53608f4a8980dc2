"""Structured Streaming smoke: the windowed aggregation runs as a real
streaming query (file source → watermark → memory sink) and agrees with
its own batch execution — same plan, two runtimes."""

from __future__ import annotations

from fiat2_spark.streaming.stream_agg import run_streaming_window_smoke, windowed_agg
from fiat2_spark.workloads.util import tbl
from tests.conftest import SF_SMOKE


def test_streaming_window_matches_batch(spark):
    batch = windowed_agg(tbl(spark, SF_SMOKE, "events")).collect()
    stream_rows = run_streaming_window_smoke(spark, f"{SF_SMOKE}/events.parquet")
    key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
    b = {key(r): (r["n"], r["total"]) for r in batch}
    s = {key(r): (r["n"], r["total"]) for r in stream_rows}
    assert b == s and len(b) > 0
