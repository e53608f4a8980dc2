#!/usr/bin/env python
"""Per-query measurement probe for the r13 optimization round (guide §1):
for each named query, record

  build_s   — time to construct the DataFrame (drives out eager driver
              work: approxQuantile sketches, iterative-loop collects,
              localCheckpoint materializations)
  exec_s    — noop-sink execution of the returned plan
  jobs_build/jobs_exec — Spark job counts per phase (status tracker)
  plan      — .explain("formatted"), written to plans/r12/<name>_<tag>.txt

Usage: python tools/probe_r12.py <tag> <query> [query...]
Reps: best-of-N (default 2) for the TIMINGS; the plan is captured once.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fiat2_spark.session import get_spark, release_checkpoint_blocks
from fiat2_spark.workloads import QUERIES


def job_count(sc) -> int:
    return len(sc.statusTracker().getJobIdsForGroup(None) or [])


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    reps = int(os.environ.get("PROBE_REPS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r13-probe")
    sc = spark.sparkContext
    QUERIES["join_fk"](spark, sf_dir).count()  # warm
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    print(f"{'query':34s} {'build_s':>8s} {'exec_s':>8s} {'total':>8s} {'jB':>4s} {'jE':>4s}")
    for name in names:
        best = None
        for _ in range(reps):
            spark.catalog.clearCache()
            release_checkpoint_blocks(spark)
            j0 = job_count(sc)
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            j1 = job_count(sc)
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2 = job_count(sc)
            rec = (t1 - t0, t2 - t1, t2 - t0, j1 - j0, j2 - j1)
            if best is None or rec[2] < best[2]:
                best = rec
        b, e, t, jb, je = best
        print(f"{name:34s} {b:8.3f} {e:8.3f} {t:8.3f} {jb:4d} {je:4d}")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        spark.catalog.clearCache()
        release_checkpoint_blocks(spark)
    spark.stop()


if __name__ == "__main__":
    main()
