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
