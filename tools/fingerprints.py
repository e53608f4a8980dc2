#!/usr/bin/env python
"""Per-query code fingerprints — the hardened window-rotation premise.

Round 4 showed that "query block unchanged" is too weak a premise for
keeping an old CORRECTNESS row: `dsl_command_pipeline`'s @q block was
untouched while `plans/interp.py` gained a rewrite that fires on exactly
its loop. A rotated-out query's green row is only valid evidence if the
query block AND every module its execution can transit are unchanged
since the round that earned the row.

Fingerprint(query) = sha256 over:
  * the @q function's own source (inspect.getsource) + its oracle SQL
    (oracle strings are materialized, so SQL-building helpers are
    covered by value),
  * the source/repr of every SAME-MODULE name the function's code
    transitively references (ADVICE r5: module-level Spark-side helpers
    like `_edges` in graphs.py are shared by several queries and can
    change behavior without touching the @q block — co_names are
    resolved against the defining module, function/class sources are
    hashed, plain-data constants are hashed by repr, and helper code is
    walked recursively so helper-of-helper changes are covered), and
  * the FULL text of every `fiat2_spark` module transitively imported
    by the query's defining module — imports are collected from the
    parsed AST (module-level, function-local, and parenthesized
    multiline forms alike), so e.g. a `from
    fiat2_spark.operators.relational import ...` inside a query body
    is covered. The defining workloads module itself is excluded whole
    (its churn is scoped precisely by the per-function + same-module-
    helper hashes above); everything beneath it (operators/, plans/,
    functions/, streaming/, sources/, session, util) is included whole.

The algorithm changed in round 6 (same-module helper closure added), so
r6 premise checks compare against FINGERPRINTS_r05_rehash.json — the r5
HEAD re-fingerprinted with THIS tool in a clean worktree — not against
the r5-algorithm FINGERPRINTS_r05.json.

Usage:  python tools/fingerprints.py            # JSON to stdout
Compare round-over-round: a query may keep a prior green row only if
its fingerprint equals the one committed with that round's gate.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _module_path(modname: str) -> str | None:
    p = os.path.join(REPO, *modname.split(".")) + ".py"
    if os.path.exists(p):
        return p
    p = os.path.join(REPO, *modname.split("."), "__init__.py")
    return p if os.path.exists(p) else None


def _imports_of(path: str) -> set[str]:
    """fiat2_spark modules imported anywhere in this file — module-level
    AND function-local, parsed from the AST (a line regex misses
    parenthesized multiline import lists, which silently kept stale rows
    valid for queries importing `plans.sugar` that way)."""
    import ast as pyast

    with open(path, encoding="utf-8") as fh:
        tree = pyast.parse(fh.read())
    out: set[str] = set()
    for node in pyast.walk(tree):
        if isinstance(node, pyast.ImportFrom):
            if node.module and node.module.startswith("fiat2_spark"):
                out.add(node.module)
                # `from fiat2_spark.operators import dedup as D` names
                # the submodule in the import list — resolve both forms
                for a in node.names:
                    cand = f"{node.module}.{a.name}"
                    if _module_path(cand):
                        out.add(cand)
        elif isinstance(node, pyast.Import):
            for a in node.names:
                if a.name.startswith("fiat2_spark"):
                    out.add(a.name)
    return {m for m in out if _module_path(m)}


def _closure(modname: str) -> set[str]:
    seen: set[str] = set()
    frontier = [modname]
    while frontier:
        m = frontier.pop()
        if m in seen:
            continue
        seen.add(m)
        frontier.extend(_imports_of(_module_path(m)) - seen)
    return seen


def _file_sha(path: str) -> str:
    with open(path, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()


def _code_names(code) -> set[str]:
    """All global names a code object references, nested lambdas /
    comprehensions / inner defs included."""
    import types

    names = set(code.co_names)
    for c in code.co_consts:
        if isinstance(c, types.CodeType):
            names |= _code_names(c)
    return names


_PLAIN = (str, bytes, int, float, bool, tuple, list, dict, set, frozenset, type(None))


def _same_module_closure(fn) -> list[tuple[str, str]]:
    """(name, source-or-repr) for every module-level name in the @q
    function's defining module that its code can transitively reach:
    same-module functions/classes by source (recursed), plain-data
    constants by repr. Imported modules are skipped (the import closure
    hashes them whole); objects defined elsewhere are skipped likewise."""
    import types

    mod = sys.modules[fn.__module__]
    seen: dict[str, str] = {}
    frontier = sorted(_code_names(fn.__code__))
    while frontier:
        nm = frontier.pop()
        # dunders (__file__, __name__, …) are interpreter-supplied and
        # path-dependent, not code — a worktree re-fingerprint must not
        # diverge on them
        if nm in seen or (nm.startswith("__") and nm.endswith("__")):
            continue
        if not hasattr(mod, nm):
            continue
        obj = getattr(mod, nm)
        if isinstance(obj, types.ModuleType):
            continue
        if callable(obj) and getattr(obj, "__module__", None) == fn.__module__:
            try:
                seen[nm] = inspect.getsource(obj)
            except (OSError, TypeError):
                seen[nm] = repr(obj)
            code = getattr(obj, "__code__", None)
            if code is not None:
                frontier.extend(_code_names(code) - set(seen))
        elif isinstance(obj, _PLAIN):
            seen[nm] = repr(obj)
    return sorted(seen.items())


def fingerprints() -> dict[str, str]:
    from fiat2_spark.workloads import ORACLES, QUERIES

    module_sha = {}
    closures: dict[str, list[str]] = {}
    out = {}
    for name, fn in QUERIES.items():
        defmod = fn.__module__
        if defmod not in closures:
            # session.py is reachable from no workloads import but its
            # confs (AQE, bloom/DPP gates, tz) shape every query's
            # behavior — include it in every premise
            deps = sorted((_closure(defmod) | {"fiat2_spark.session"}) - {defmod})
            closures[defmod] = deps
            for d in deps:
                if d not in module_sha:
                    module_sha[d] = _file_sha(_module_path(d))
        h = hashlib.sha256()
        h.update(inspect.getsource(fn).encode())
        h.update(ORACLES.get(name, "").encode())
        for helper_name, helper_src in _same_module_closure(fn):
            h.update(f"helper:{helper_name}=".encode())
            h.update(helper_src.encode())
            h.update(b"\n")
        for d in closures[defmod]:
            h.update(f"{d}={module_sha[d]}\n".encode())
        out[name] = h.hexdigest()
    return out


if __name__ == "__main__":
    print(json.dumps(fingerprints(), indent=1, sort_keys=True))
