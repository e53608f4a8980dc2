#!/usr/bin/env python
"""End-to-end DSL walkthrough — what a fiat2 user's workflow looks like
on this engine.

The reference workflow is: write an AST in Coq notation → bidirectional
typecheck → verified rewrites → interpreter (SURVEY §3). Here the same
program is: build the AST (`plans/ast.py`) → typecheck
(`plans/typecheck.py`, raises before any job on ill-typed input) →
compile to a DataFrame plan (`plans/compile.py` recognizes the
flatmap+guard comprehension as a θ-join, RelTransf.v:357-367) → Catalyst
applies the rewrite catalog the reference proves (pushdown, pruning,
join selection) → execute.

Run: python examples/dsl_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fiat2_spark.plans import ast as A
from fiat2_spark.plans.compile import compile_expr
from fiat2_spark.plans.sugar import (
    bind, check, comp, eq, field, let_mut, loc, rec, ret, set_, sort,
)
from fiat2_spark.plans.interp import Store, run_command
from fiat2_spark.plans.typecheck import TypeError2
from fiat2_spark.session import get_spark
from fiat2_spark.workloads.util import tbl


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="fiat2-dsl-demo")

    store = Store()
    store.assign("nation", tbl(spark, sf_dir, "nation"))
    store.assign("supplier", tbl(spark, sf_dir, "supplier"))

    # Ex_Employee.v:35 in the reference's concrete syntax
    # (Notations.v:144-149), via the plans/sugar comprehension builders —
    #   sort [ d <- nation, e <- supplier,
    #          check(e.s_nationkey = d.n_nationkey),
    #          ret {name: e.s_name, dept: d.n_name} ]
    prog = sort(comp(
        bind("d", loc("nation")),
        bind("e", loc("supplier")),
        check(eq(field("e", "s_nationkey"), field("d", "n_nationkey"))),
        ret(rec(name=field("e", "s_name"), dept=field("d", "n_name"))),
    ))

    # the sugar is pure notation: it desugars to the exact raw-AST nodes
    guard = A.EIf(
        A.EBinop(
            "OEq",
            A.EAccess(A.EVar("e"), "s_nationkey"),
            A.EAccess(A.EVar("d"), "n_nationkey"),
        ),
        A.EBinop(
            "OCons",
            A.ERecord(
                (
                    ("name", A.EAccess(A.EVar("e"), "s_name")),
                    ("dept", A.EAccess(A.EVar("d"), "n_name")),
                )
            ),
            A.EAtom(A.ANil()),
        ),
        A.EAtom(A.ANil()),
    )
    raw = A.ESort(
        "LikeList",
        A.EFlatmap(
            "LikeList",
            A.ELoc("nation"),
            "d",
            A.EFlatmap("LikeList", A.ELoc("supplier"), "e", guard),
        ),
    )
    assert prog == raw, "sugar must desugar to the identical AST"

    df = compile_expr(prog, {}, store, spark)
    print("== physical plan (note: hash join, no cartesian product) ==")
    df.explain()
    print("== first rows ==")
    df.show(5, truncate=False)

    # Ill-typed variant: comparing a string field to an int — rejected
    # BEFORE any Spark job runs, exactly like the reference's checker.
    bad = A.EBinop("OEq", A.EAccess(A.EVar("e"), "s_name"), A.EAtom(A.AInt(3)))
    try:
        from fiat2_spark.plans.typecheck import synthesize

        synthesize(
            bad,
            {},
            {"e": A.TRecord((("s_name", A.TString()),))},
        )
        raise AssertionError("ill-typed program was not rejected")
    except TypeError2 as e:
        print(f"== typechecker rejected the ill-typed variant: {e} ==")

    # The command layer (Interpret.v:501-524) in the reference's command
    # notation (Notations.v:52-76): let mut a table, insert a row
    # (OCons), read back — the insert loop every Ex_* benchmark runs.
    row = A.ERecord(
        (
            ("n_nationkey", A.EAtom(A.AInt(99))),
            ("n_name", A.EAtom(A.AString("ATLANTIS"))),
        )
    )
    prog2 = let_mut(
        "t",
        A.EProj(
            "LikeList",
            A.ELoc("nation"),
            "x",
            A.ERecord(
                (
                    ("n_nationkey", A.EAccess(A.EVar("x"), "n_nationkey")),
                    ("n_name", A.EAccess(A.EVar("x"), "n_name")),
                )
            ),
        ),
        set_("t", A.EBinop("OCons", row, A.ELoc("t"))),
    )
    run_command(prog2, store, {}, spark)
    print("== command layer ran (let mut + OCons insert + set) ==")

    # Automatic index selection (plans/autoindex.py, the reference's
    # OptimizeAnno heuristics, Ex_Orders.v:69-76): a loop doing an
    # eq-lookup of `inv` per iteration and appending the hits to
    # `orders_mut`, then reading its sum. The analyzer picks DictIdx
    # for the looked-up table and SumAgg for the folded one;
    # `explain=True` prints the decision — the engine's analog of the
    # reference's user-visible per-program `heuristics` lists
    # (Ex_Employee.v:37-45).
    from fiat2_spark.plans.autoindex import run_command_auto

    int_nil = A.EAtom(A.ANil(A.TInt()))
    inv_lookup = A.ESort(
        "LikeList",
        A.EFlatmap(
            "LikeList",
            A.ELoc("inv"),
            "item",
            A.EIf(
                A.EBinop(
                    "OEq",
                    A.EAccess(A.EVar("item"), "id"),
                    A.EBinop("OTimes", A.EVar("n"), A.EAtom(A.AInt(2))),
                ),
                A.EBinop("OCons", A.EAccess(A.EVar("item"), "price"), int_nil),
                int_nil,
            ),
        ),
    )
    insert = A.CAssign(
        "orders_mut",
        A.EBinop(
            "OCons",
            A.ERecord((
                ("id", A.EBinop("OTimes", A.EVar("n"), A.EAtom(A.AInt(2)))),
                ("price", A.EVar("price")),
            )),
            A.ELoc("orders_mut"),
        ),
    )
    sum_read = A.EFold(
        A.EFlatmap(
            "LikeList",
            A.ELoc("orders_mut"),
            "item",
            A.EBinop("OCons", A.EAccess(A.EVar("item"), "price"), int_nil),
        ),
        A.EAtom(A.AInt(0)),
        "_v",
        "_acc",
        A.EBinop("OPlus", A.EVar("_v"), A.EVar("_acc")),
    )
    prog3 = A.CSeq(
        A.CForeach(
            A.EBinop("ORange", A.EAtom(A.AInt(1)), A.EAtom(A.AInt(4))),
            "n",
            A.CLet(
                inv_lookup,
                "item_price",
                A.CForeach(A.EVar("item_price"), "price", insert),
            ),
        ),
        A.CAssign("out_sum", sum_read),
    )
    st3 = Store()
    st3.assign(
        "inv",
        spark.createDataFrame(
            [(2, 20), (4, 40), (6, 60), (7, 70)], "id long, price long"
        ),
    )
    st3.assign(
        "orders_mut", spark.createDataFrame([(100, 5)], "id long, price long")
    )
    _, report = run_command_auto(prog3, st3, {}, spark, explain=True)
    print(f"== auto-indexed run: out_sum = {st3.get('out_sum')} ==")


if __name__ == "__main__":
    main()
