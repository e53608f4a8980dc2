#!/usr/bin/env python
"""Replicate the driver's correctness gate locally: run every queries()
entry at a given sf dir and compare with its oracle_sql() via DuckDB.

Usage: python tools/run_gate.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fiat2_spark.session import get_spark
from fiat2_spark.workloads import ORACLES, QUERIES
from tests.oracle import compare, duck_conn


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # record exactly which commit the gate artifacts cover (VERDICT r7
    # task 7): the streak rule is "gate at the final engine-code
    # commit", so the log itself must carry the hash — a verifier
    # should not have to reconstruct it from commit timestamps
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True, cwd=repo
        ).stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain"], capture_output=True, text=True, cwd=repo
        ).stdout.strip()
        print(
            f"gate-commit: {head or '(unknown)'}{' (dirty)' if dirty else ''}  sf_dir={sf_dir}",
            flush=True,
        )
    except OSError:
        print(f"gate-commit: (git unavailable)  sf_dir={sf_dir}", flush=True)
    spark = get_spark(app_name="fiat2-gate")
    con = duck_conn(sf_dir)
    failures = []
    names = [n for n in sorted(QUERIES) if not only or n in only]
    for name in names:
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            if name in ORACLES:
                ok, detail = compare(df, con, ORACLES[name])
            else:
                ok, detail = df.count() >= 0, "rows-only"
        except Exception as ex:  # noqa: BLE001
            ok, detail = False, f"{type(ex).__name__}: {str(ex).splitlines()[0][:120]}"
        dt = time.perf_counter() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:28s} {dt:6.1f}s  {detail}", flush=True)
        if not ok:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed", flush=True)

    # Cache hygiene (VERDICT r5 task 5): no query may leave a
    # DataFrame-level cache entry behind — those are pinned by Spark's
    # CacheManager for the session's life and only explicit unpersist
    # releases them (GC/ContextCleaner reclamation does not fire on this
    # build — measured in session.release_checkpoint_blocks). Shared
    # intermediates ride localCheckpoint BLOCKS instead, owned by the
    # returned results; the gate is the session owner here, so after all
    # results are consumed it sweeps them and the map must drain to
    # EMPTY — any survivor would be a persist leak.
    from fiat2_spark.session import cache_entries, release_checkpoint_blocks

    ckpt, cache = cache_entries(spark)
    if cache:
        print(f"FAIL cache-hygiene: {len(cache)} CacheManager entr(ies) survive the gate:", flush=True)
        for c in cache:
            print(f"  {c}", flush=True)
        failures.append("__cache_hygiene__")
    freed = release_checkpoint_blocks(spark)
    leftover = dict(spark.sparkContext._jsc.getPersistentRDDs())
    if leftover:
        print(f"FAIL cache-hygiene: {len(leftover)} RDD(s) resident after sweep", flush=True)
        failures.append("__cache_hygiene_sweep__")
    else:
        print(
            f"cache-hygiene: 0 CacheManager entries post-gate; "
            f"{freed} checkpoint block RDD(s) swept; 0 resident",
            flush=True,
        )
    if not only:
        # full-registry run: emit the per-query transitive-code
        # fingerprints that gate window rotation (tools/fingerprints.py);
        # rounds commit this beside GATE_r0N as FINGERPRINTS_r0N.json
        import json

        from tools.fingerprints import fingerprints

        fp_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "FINGERPRINTS.json",
        )
        with open(fp_path, "w") as fh:
            json.dump(fingerprints(), fh, indent=1, sort_keys=True)
        print(f"fingerprints -> {fp_path}", flush=True)
    if failures:
        print("FAILURES:", ", ".join(failures), flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
