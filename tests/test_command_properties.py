"""Property-based differential testing of the COMMAND layer + automatic
index selection (VERDICT r6 task 8): random small commands —
CForeach/CSeq/CIf/CLet over OCons inserts, eq-lookups, verbatim
sum/min folds, length and constant-tag reads — run through the plain
interpreter AND through run_command_auto (choose_indexes +
apply_auto_index + execution). The r6 relational fuzzer found a real
compile gap its hand-written siblings missed (depth-3 chains); this is
the same lever aimed at the rewrite's soundness surface: every store
slot and the final table content must agree, whatever composition the
generator produces. Reference analog: transf_to_idx_preserve_sem
(IndexTransf.v:797-840) — the theorem this suite spot-checks by
execution."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fiat2_spark.plans import ast as A
from fiat2_spark.plans.autoindex import run_command_auto
from fiat2_spark.plans.interp import Store, run_command

INT_NIL = A.EAtom(A.ANil(A.TInt()))
ROW_TY = A.TRecord((("id", A.TInt()), ("tag", A.TString()), ("v", A.TInt())))


def _int_expr(loop_var: str | None):
    consts = st.integers(0, 8).map(lambda n: A.EAtom(A.AInt(n)))
    if loop_var is None:
        return consts
    uses = st.sampled_from(["n2", "n3", "plain"]).map(
        lambda k: {
            "n2": A.EBinop("OTimes", A.EVar(loop_var), A.EAtom(A.AInt(2))),
            "n3": A.EBinop("OPlus", A.EVar(loop_var), A.EAtom(A.AInt(3))),
            "plain": A.EVar(loop_var),
        }[k]
    )
    return st.one_of(consts, uses)


def _insert(key: A.Expr, val: A.Expr, tbl: str = "t") -> A.Command:
    """tbl := {id: key, tag: if val<4 then 'cold' else 'hot', v: val} :: !tbl"""
    tag = A.EIf(
        A.EBinop("OLess", val, A.EAtom(A.AInt(4))),
        A.EAtom(A.AString("cold")),
        A.EAtom(A.AString("hot")),
    )
    return A.CAssign(
        tbl,
        A.EBinop(
            "OCons",
            A.ERecord((("id", key), ("tag", tag), ("v", val))),
            A.ELoc(tbl),
        ),
    )


def _proj_v() -> A.Expr:
    return A.EFlatmap(
        "LikeList", A.ELoc("t"), "x",
        A.EBinop("OCons", A.EAccess(A.EVar("x"), "v"), INT_NIL),
    )


def _sum_fold() -> A.Expr:
    return A.EFold(
        _proj_v(), A.EAtom(A.AInt(0)), "_v", "_acc",
        A.EBinop("OPlus", A.EVar("_v"), A.EVar("_acc")),
    )


def _min_fold() -> A.Expr:
    return A.EFold(
        _proj_v(), A.EAtom(A.ANone(A.TInt())), "_v", "_acc",
        A.EOptMatch(
            A.EVar("_acc"),
            A.EUnop("OSome", A.EVar("_v")),
            "_m",
            A.EIf(
                A.EBinop("OLess", A.EVar("_v"), A.EVar("_m")),
                A.EUnop("OSome", A.EVar("_v")),
                A.EVar("_acc"),
            ),
        ),
    )


def _lookup(key: A.Expr, residual_lt: int | None = None, tbl: str = "t") -> A.Expr:
    """sort [ x <- !t, check(x.id == key [and x.v < c]), ret x.v ] —
    the optional conjunct exercises the index-scan + residual-filter
    rewrite (r7 extension of eq_filter_to_lookup)."""
    guard = A.EBinop("OEq", A.EAccess(A.EVar("x"), "id"), key)
    if residual_lt is not None:
        guard = A.EBinop(
            "OAnd",
            guard,
            A.EBinop("OLess", A.EAccess(A.EVar("x"), "v"), A.EAtom(A.AInt(residual_lt))),
        )
    return A.ESort(
        "LikeList",
        A.EFlatmap(
            "LikeList", A.ELoc(tbl), "x",
            A.EIf(
                guard,
                A.EBinop("OCons", A.EAccess(A.EVar("x"), "v"), INT_NIL),
                INT_NIL,
            ),
        ),
    )


def _hot_len(residual_lt: int | None = None) -> A.Expr:
    """|filter(t, x.tag == 'hot' [and x.v < c])| — the optional conjunct
    exercises the bitmap-scan + residual-filter rewrite (r8 extension:
    BitmapIndex.v:811-831 under IndexTransf.v:862-872)."""
    guard = A.EBinop(
        "OEq", A.EAccess(A.EVar("x"), "tag"), A.EAtom(A.AString("hot"))
    )
    if residual_lt is not None:
        guard = A.EBinop(
            "OAnd",
            guard,
            A.EBinop(
                "OLess", A.EAccess(A.EVar("x"), "v"), A.EAtom(A.AInt(residual_lt))
            ),
        )
    return A.EUnop(
        "OLength", A.EFilter("LikeBag", A.ELoc("t"), "x", guard)
    )


@st.composite
def _command(draw, depth: int = 0, loop_var: str | None = None, slot_ctr=None):
    if slot_ctr is None:
        slot_ctr = [0]
    kinds = ["insert", "read_sum", "read_min", "read_len", "read_hot", "seq"]
    if depth < 2:
        kinds += ["foreach", "letlookup", "ifcmd", "seq"]
    if depth == 0:
        # bias toward the Ex_Orders skeleton (loop { lookup; insert })
        # so DictIdx choices are exercised, not just Sum/Min/Bitmap —
        # a loop-varying lookup key is what makes the analyzer pick one;
        # letmut_shape runs the same skeleton over a CLetMut-BOUND table
        # (apply_below_letmut places the auxes under the binder)
        kinds += ["orders_shape", "orders_shape", "letmut_shape"]
    kind = draw(st.sampled_from(kinds))
    if kind == "letmut_shape":
        init = A.EFilter(
            "LikeBag",
            A.ELoc("t"),
            "x",
            A.EBinop(
                "OLess",
                A.EAccess(A.EVar("x"), "v"),
                A.EAtom(A.AInt(draw(st.integers(4, 10)))),
            ),
        )
        loop_u = A.CForeach(
            A.EBinop("ORange", A.EAtom(A.AInt(1)), A.EAtom(A.AInt(4))),
            "n",
            A.CLet(
                _lookup(
                    A.EBinop("OTimes", A.EVar("n"), A.EAtom(A.AInt(2))), tbl="u"
                ),
                "ps",
                A.CForeach(
                    A.EVar("ps"),
                    "p",
                    _insert(
                        A.EBinop("OPlus", A.EVar("p"), A.EAtom(A.AInt(1))),
                        A.EVar("p"),
                        tbl="u",
                    ),
                ),
            ),
        )
        slot_ctr[0] += 1
        read_u = A.CAssign(f"out{slot_ctr[0]}", A.EUnop("OLength", A.ELoc("u")))
        return A.CLetMut(init, "u", A.CSeq(loop_u, read_u))
    if kind == "orders_shape":
        lv = "n"
        body = A.CLet(
            _lookup(
                A.EBinop("OTimes", A.EVar(lv), A.EAtom(A.AInt(2))),
                residual_lt=draw(st.sampled_from([None, 5, 9])),
            ),
            "ps",
            A.CForeach(
                A.EVar("ps"),
                "p",
                _insert(
                    A.EBinop("OPlus", A.EVar("p"), A.EAtom(A.AInt(1))), A.EVar("p")
                ),
            ),
        )
        skeleton = A.CForeach(
            A.EBinop("ORange", A.EAtom(A.AInt(1)), A.EAtom(A.AInt(4))), lv, body
        )
        tail = draw(_command(depth=depth + 1, loop_var=None, slot_ctr=slot_ctr))
        return A.CSeq(skeleton, tail)

    def fresh_slot():
        slot_ctr[0] += 1
        return f"out{slot_ctr[0]}"

    if kind == "insert":
        return _insert(draw(_int_expr(loop_var)), draw(_int_expr(loop_var)))
    if kind == "read_sum":
        return A.CAssign(fresh_slot(), _sum_fold())
    if kind == "read_min":
        return A.CAssign(
            fresh_slot(),
            A.EOptMatch(_min_fold(), A.EAtom(A.AInt(-1)), "_s", A.EVar("_s")),
        )
    if kind == "read_len":
        return A.CAssign(fresh_slot(), A.EUnop("OLength", A.ELoc("t")))
    if kind == "read_hot":
        return A.CAssign(
            fresh_slot(), _hot_len(draw(st.sampled_from([None, 5, 9])))
        )
    if kind == "seq":
        return A.CSeq(
            draw(_command(depth=depth + 1, loop_var=loop_var, slot_ctr=slot_ctr)),
            draw(_command(depth=depth + 1, loop_var=loop_var, slot_ctr=slot_ctr)),
        )
    if kind == "ifcmd":
        cond = A.EBinop(
            "OLess",
            draw(_int_expr(loop_var)),
            draw(_int_expr(loop_var)),
        )
        return A.CIf(
            cond,
            draw(_command(depth=depth + 1, loop_var=loop_var, slot_ctr=slot_ctr)),
            draw(_command(depth=depth + 1, loop_var=loop_var, slot_ctr=slot_ctr)),
        )
    if kind == "foreach":
        lv = f"n{depth}"
        lo = draw(st.integers(0, 2))
        hi = lo + draw(st.integers(1, 3))
        return A.CForeach(
            A.EBinop("ORange", A.EAtom(A.AInt(lo)), A.EAtom(A.AInt(hi))),
            lv,
            draw(_command(depth=depth + 1, loop_var=lv, slot_ctr=slot_ctr)),
        )
    # letlookup: the Ex_Orders shape — bind the lookup, loop-insert it
    lv = f"p{depth}"
    return A.CLet(
        _lookup(draw(_int_expr(loop_var))),
        lv,
        A.CForeach(
            A.EVar(lv),
            f"q{depth}",
            _insert(
                A.EBinop("OPlus", A.EVar(f"q{depth}"), A.EAtom(A.AInt(1))),
                A.EVar(f"q{depth}"),
            ),
        ),
    )


def _mk_store(spark) -> Store:
    return_store = Store()
    return_store.assign(
        "t",
        spark.createDataFrame(
            [(2, "cold", 3), (2, "hot", 7), (5, "hot", 9)],
            "id long, tag string, v long",
        ),
    )
    return return_store


def _snapshot(st_: Store):
    from pyspark.sql import DataFrame

    out = {}
    for k, v in st_.snapshot().items():
        if isinstance(v, DataFrame):
            out[k] = sorted(tuple(sorted(r.asDict().items())) for r in v.collect())
        else:
            out[k] = v
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(cmd=_command())
@pytest.mark.slow  # >=15s model-differential sweep; default run deselects (pytest.ini)
def test_auto_index_preserves_command_semantics(spark, cmd):
    st_plain = _mk_store(spark)
    run_command(cmd, st_plain, {}, spark)
    st_auto = _mk_store(spark)
    run_command_auto(cmd, st_auto, {}, spark)
    a, b = _snapshot(st_plain), _snapshot(st_auto)
    assert a == b, f"\ncmd={cmd}\nplain={a}\nauto={b}"
