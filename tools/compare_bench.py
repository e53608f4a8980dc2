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


def load(path: str) -> tuple[dict[str, float], float | None]:
    """Returns (per-query timings, control_sec or None). control_sec is
    the embedded host-regime calibration (bench.py:control_query_sec);
    artifacts from rounds before it was added carry None."""
    with open(path) as fh:
        obj = json.load(fh)
    if "queries" in obj and isinstance(obj["queries"], dict):
        q = {k: float(v) for k, v in obj["queries"].items()}
        ctl = obj.get("control_sec")
        return q, (float(ctl) if ctl is not None else None)
    if "tail" in obj:
        q = {
            k: float(v)
            for k, v in re.findall(r'"([a-z0-9_]+)"\s*:\s*([0-9.]+)', obj["tail"])
        }
        ctl = q.pop("control_sec", None)
        q.pop("control_pre", None)
        q.pop("control_post", None)
        return q, ctl
    raise SystemExit(f"{path}: neither a queries dict nor a driver tail capture")


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    (old, old_ctl), (new, new_ctl) = load(sys.argv[1]), load(sys.argv[2])
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
    out = {
        "common": len(common),
        "old_total": round(o_tot, 2),
        "new_total": round(n_tot, 2),
        "ratio": round(n_tot / o_tot, 3),
        "regressions": [
            {"q": k, "old": o, "new": n, "x": x} for k, o, n, x in regs
        ],
    }
    # host-regime normalization: when both artifacts embed the fixed
    # control query, report the ratio with the regime divided out —
    # ratio_normalized ≈ 1.0 means "same engine speed, different host
    # weather" even when the raw ratio swings
    # presence and positivity checked separately: a control_sec of 0.0
    # is "measured zero" (impossible for a real job, but it must not be
    # conflated with "artifact predates the control"), and the division
    # needs an explicit > 0 guard either way
    if old_ctl is not None and new_ctl is not None and old_ctl > 0:
        out["control_old"] = old_ctl
        out["control_new"] = new_ctl
        out["control_ratio"] = round(new_ctl / old_ctl, 3)
        out["ratio_normalized"] = round((n_tot / o_tot) / (new_ctl / old_ctl), 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
