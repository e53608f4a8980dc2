#!/usr/bin/env python
"""Round-over-round bench comparison: diff two bench artifacts (either a
driver BENCH_r0N.json capture or a bench_detail.json) on their common
queries and flag regressions.

Usage: python tools/compare_bench.py OLD NEW [ratio_flag=1.3] [abs_flag=0.15]

Accepts both artifact shapes: a driver capture ({"tail": "..."} — the
per-query pairs are regex-scraped from the tail fragment) and the
builder's bench_detail.json ({"queries": {...}}).
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        obj = json.load(fh)
    if "queries" in obj and isinstance(obj["queries"], dict):
        return {k: float(v) for k, v in obj["queries"].items()}
    if "tail" in obj:
        return {
            k: float(v)
            for k, v in re.findall(r'"([a-z0-9_]+)"\s*:\s*([0-9.]+)', obj["tail"])
        }
    raise SystemExit(f"{path}: neither a queries dict nor a driver tail capture")


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio_flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    abs_flag = float(sys.argv[4]) if len(sys.argv) > 4 else 0.15
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    o_tot = sum(old[k] for k in common)
    n_tot = sum(new[k] for k in common)
    regs = [
        (k, old[k], new[k], round(new[k] / old[k], 2))
        for k in common
        if new[k] > old[k] * ratio_flag and new[k] - old[k] > abs_flag
    ]
    regs.sort(key=lambda t: -t[3])
    print(
        json.dumps(
            {
                "common": len(common),
                "old_total": round(o_tot, 2),
                "new_total": round(n_tot, 2),
                "ratio": round(n_tot / o_tot, 3),
                "regressions": [
                    {"q": k, "old": o, "new": n, "x": x} for k, o, n, x in regs
                ],
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
