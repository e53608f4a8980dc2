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


def load(path: str) -> tuple[dict[str, float], float | None, float | None]:
    """Returns (per-query timings, control_sec or None, control_scan_sec
    or None). control_sec is the embedded CPU-bound host-regime
    calibration (bench.py:control_query_sec); control_scan_sec the
    scan-bound one (bench.py:control_scan_sec, r12+); artifacts from
    rounds before either was added carry None for it."""
    with open(path) as fh:
        obj = json.load(fh)
    if "queries" in obj and isinstance(obj["queries"], dict):
        q = {k: float(v) for k, v in obj["queries"].items()}
        ctl = obj.get("control_sec")
        scan = obj.get("control_scan_sec")
        return (
            q,
            (float(ctl) if ctl is not None else None),
            (float(scan) if scan is not None else None),
        )
    if "tail" in obj:
        q = {
            k: float(v)
            for k, v in re.findall(r'"([a-z0-9_]+)"\s*:\s*([0-9.]+)', obj["tail"])
        }
        ctl = q.pop("control_sec", None)
        q.pop("control_pre", None)
        q.pop("control_post", None)
        scan = q.pop("control_scan_sec", None)
        q.pop("control_scan_pre", None)
        q.pop("control_scan_post", None)
        # the tail capture also carries the summary's own numeric keys —
        # scraped as pseudo-queries they double-count the suite total
        # (value) and add a constant ~|registry| seconds (n_queries) to
        # both sides of every driver-capture comparison, which is what
        # ratio/ratio_normalized read
        for k in ("value", "sf", "n_queries", "others_total", "n_below_cutoff"):
            q.pop(k, None)
        return q, ctl, scan
    raise SystemExit(f"{path}: neither a queries dict nor a driver tail capture")


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    (old, old_ctl, old_scan), (new, new_ctl, new_scan) = (
        load(sys.argv[1]),
        load(sys.argv[2]),
    )
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
    # control queries, report the ratio with the regime divided out —
    # ratio_normalized ≈ 1.0 means "same engine speed, different host
    # weather" even when the raw ratio swings.
    # presence and positivity checked separately: a control of 0.0 is
    # "measured zero" (impossible for a real job, but it must not be
    # conflated with "artifact predates the control"), and BOTH sides of
    # each division carry an explicit > 0 guard (ADVICE r11: the old
    # guard checked only old_ctl, so a zero in the NEW artifact raised
    # ZeroDivisionError).
    ctl_ratio = None
    if old_ctl is not None and new_ctl is not None and old_ctl > 0 and new_ctl > 0:
        ctl_ratio = new_ctl / old_ctl
        out["control_old"] = old_ctl
        out["control_new"] = new_ctl
        out["control_ratio"] = round(ctl_ratio, 3)
    scan_ratio = None
    if (
        old_scan is not None
        and new_scan is not None
        and old_scan > 0
        and new_scan > 0
    ):
        scan_ratio = new_scan / old_scan
        out["control_scan_old"] = old_scan
        out["control_scan_new"] = new_scan
        out["control_scan_ratio"] = round(scan_ratio, 3)
    # the blend: geometric mean of the CPU and scan regime ratios — the
    # suite is a mix of CPU-bound and scan-bound queries, and the
    # geomean is the symmetric compromise that never over-credits one
    # regime; with only the CPU control present (pre-r12 artifacts) it
    # degrades to the old cpu-only normalization, reported under the
    # same key so round-over-round readers keep one number to look at
    if ctl_ratio is not None and scan_ratio is not None:
        blend = (ctl_ratio * scan_ratio) ** 0.5
        out["control_blend_ratio"] = round(blend, 3)
        out["ratio_normalized"] = round((n_tot / o_tot) / blend, 3)
        out["ratio_normalized_cpu"] = round((n_tot / o_tot) / ctl_ratio, 3)
    elif ctl_ratio is not None:
        out["ratio_normalized"] = round((n_tot / o_tot) / ctl_ratio, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
