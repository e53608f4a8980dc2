#!/usr/bin/env python
"""Generate docs/API.md — a one-line-per-function index of the public
operator/function/plan surface, so a user migrating from the reference
can find the Spark-side entry point for each capability without reading
module source. Regenerate after adding operators:

    python tools/gen_api_index.py > docs/API.md
"""

from __future__ import annotations

import importlib
import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODULES = [
    "fiat2_spark.session",
    "fiat2_spark.catalog",
    "fiat2_spark.functions.scalars",
    "fiat2_spark.functions.collections",
    "fiat2_spark.operators.relational",
    "fiat2_spark.operators.aggregates",
    "fiat2_spark.operators.dedup",
    "fiat2_spark.operators.similarity",
    "fiat2_spark.operators.text",
    "fiat2_spark.operators.multimodal",
    "fiat2_spark.operators.sketches",
    "fiat2_spark.plans.ast",
    "fiat2_spark.plans.sugar",
    "fiat2_spark.plans.typecheck",
    "fiat2_spark.plans.compile",
    "fiat2_spark.plans.interp",
    "fiat2_spark.plans.autoindex",
    "fiat2_spark.streaming.maintenance",
    "fiat2_spark.streaming.stream_agg",
    "fiat2_spark.sources.io",
    "fiat2_spark.serving",
]


def first_line(doc: str | None) -> str:
    if not doc:
        return ""
    line = " ".join(doc.strip().split("\n\n")[0].split())
    return line if len(line) <= 160 else line[:157] + "..."


def main() -> None:
    print("# API index\n")
    print(
        "Auto-generated (`python tools/gen_api_index.py > docs/API.md`).\n"
        "One line per public function/class: the Spark-side entry point for\n"
        "each capability. See module docstrings for scale analyses and\n"
        "reference citations.\n"
    )
    for modname in MODULES:
        mod = importlib.import_module(modname)
        rows = []
        for name, obj in sorted(vars(mod).items()):
            if name.startswith("_") or inspect.ismodule(obj):
                continue
            if getattr(obj, "__module__", None) != modname:
                continue
            if inspect.isfunction(obj):
                try:
                    sig = str(inspect.signature(obj))
                except (TypeError, ValueError):
                    sig = "(…)"
                # deterministic render for callable/object defaults:
                # str(signature) reprs them as '<function tokens at
                # 0x7f…>', which made every regeneration diff (VERDICT
                # r11 #4) — render by name instead
                sig = re.sub(r"<function ([\w.]+) at 0x[0-9a-f]+>", r"\1", sig)
                sig = re.sub(r"<([\w.]+) object at 0x[0-9a-f]+>", r"<\1>", sig)
                if len(sig) > 90:
                    sig = sig[:87] + "...)"
                rows.append((f"`{name}{sig}`", first_line(obj.__doc__)))
            elif inspect.isclass(obj):
                rows.append((f"`{name}` (class)", first_line(obj.__doc__)))
        if not rows:
            continue
        print(f"## {modname}\n")
        print(f"{first_line(mod.__doc__)}\n")
        print("| symbol | summary |\n|---|---|")
        for sym, doc in rows:
            esc = doc.replace("|", "\\|")
            print(f"| {sym} | {esc} |")
        print()


if __name__ == "__main__":
    main()
