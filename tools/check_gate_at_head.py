#!/usr/bin/env python
"""Gate-at-HEAD invariant checker (VERDICT r10 What's-wrong #1): the
committed full-registry gate logs must sit at the repo's FINAL engine
commit — a post-gate engine commit silently shipping is exactly the
r10 process slip this tool makes impossible to repeat unnoticed.

For each gate log given (default: the highest-numbered GATE_r*_sf*.log
pair), extract the `gate-commit:` hash `run_gate.py` records and fail
if any commit in gate-commit..HEAD touches an ENGINE path — the code
the gate actually certifies: fiat2_spark/ bench.py __spark_entry__.py.
Post-gate commits touching only tests/tools/docs/artifacts are allowed
(the streak rule's explicit carve-out — "a later commit touching only
tests/tools/docs is fine"); what must never ship after the gate is a
change to the gated runtime surface itself.

Usage: python tools/check_gate_at_head.py [GATE_log ...]
Exit 0 = invariant holds for every log checked.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENGINE_PATHS = ("fiat2_spark", "bench.py", "__spark_entry__.py")


def newest_gate_logs() -> list[str]:
    logs = glob.glob(os.path.join(REPO, "GATE_r*_sf*.log"))
    if not logs:
        return []
    def rnum(p: str) -> int:
        m = re.search(r"GATE_r(\d+)_", os.path.basename(p))
        return int(m.group(1)) if m else -1
    top = max(rnum(p) for p in logs)
    return sorted(p for p in logs if rnum(p) == top)


def gate_commit(log_path: str) -> str | None:
    with open(log_path, encoding="utf-8", errors="replace") as fh:
        for line in fh:
            m = re.match(r"gate-commit:\s*([0-9a-f]{7,40})(\s*\(dirty\))?", line)
            if m:
                if m.group(2):
                    print(f"{log_path}: gate ran on a DIRTY tree — "
                          "the recorded commit does not cover the gated code")
                    return "__dirty__"
                return m.group(1)
    return None


def engine_commits_since(commit: str) -> list[str]:
    out = subprocess.run(
        ["git", "log", "--oneline", f"{commit}..HEAD", "--", *ENGINE_PATHS],
        capture_output=True, text=True, cwd=REPO,
    )
    if out.returncode != 0:
        raise SystemExit(f"git log failed: {out.stderr.strip()}")
    return [l for l in out.stdout.splitlines() if l.strip()]


def main() -> None:
    logs = sys.argv[1:] or newest_gate_logs()
    if not logs:
        raise SystemExit("no GATE_r*_sf*.log found to check")
    failures = 0
    for log in logs:
        c = gate_commit(log)
        if c is None:
            print(f"FAIL {log}: no gate-commit line (pre-r7 log?)")
            failures += 1
            continue
        if c == "__dirty__":
            failures += 1
            continue
        drift = engine_commits_since(c)
        if drift:
            print(f"FAIL {log}: {len(drift)} engine commit(s) landed after "
                  f"gate-commit {c[:10]}:")
            for l in drift:
                print(f"  {l}")
            failures += 1
        else:
            print(f"OK   {log}: gate-commit {c[:10]} covers HEAD's engine code")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
