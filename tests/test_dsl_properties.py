"""Property-based differential testing of the DSL COMPILER: random
expression ASTs run through compile_expr (→ Catalyst plan) and through a
direct Python evaluator of the reference semantics (the ToPython.v
naive-oracle pattern, SURVEY §3 entry point B) must agree row for row.

This is the compiler-level analog of test_properties.py (which checks
the scalar Column builders): here hypothesis composes whole programs —
filter predicates and projection bodies with nested arithmetic,
comparisons, boolean logic, conditionals, and let-bindings — so the
AST→DataFrame translation itself (binder handling, guard recognition,
type-driven dispatch) is the thing under test.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import LongType, StructField, StructType

from fiat2_spark.plans import ast as A
from fiat2_spark.plans.compile import compile_expr
from fiat2_spark.plans.interp import Store

# magnitudes bounded so a depth-2 product chain (≤ x⁴, doubled by ELet)
# stays within int64: end-masking the model is only exact for the ring
# ops, so no intermediate may overflow before feeding ODiv/OMod
ROWS = [
    (0, 0), (1, -1), (-1, 1), (7, 3), (-7, 3), (7, -3), (-7, -3),
    (100, 10), (-100, -10), (2**15, -(2**15)), (5, 0), (0, 5),
]
_SCHEMA = StructType([StructField("a", LongType()), StructField("b", LongType())])


# -- AST generators ---------------------------------------------------------

def int_expr(depth: int):
    leaf = st.one_of(
        st.sampled_from([A.EAccess(A.EVar("x"), "a"), A.EAccess(A.EVar("x"), "b")]),
        st.integers(-50, 50).map(lambda v: A.EAtom(A.AInt(v))),
    )
    if depth <= 0:
        return leaf
    sub = int_expr(depth - 1)
    binop = st.tuples(
        st.sampled_from(["OPlus", "OMinus", "OTimes", "ODiv", "OMod"]), sub, sub
    ).map(lambda t: A.EBinop(t[0], t[1], t[2]))
    ite = st.tuples(bool_expr(depth - 1), sub, sub).map(
        lambda t: A.EIf(t[0], t[1], t[2])
    )
    let = sub.map(lambda e: A.ELet(e, "y", A.EBinop("OPlus", A.EVar("y"), A.EVar("y"))))
    neg = sub.map(lambda e: A.EUnop("ONeg", e))
    return st.one_of(leaf, binop, ite, neg, let)


def bool_expr(depth: int):
    i = int_expr(max(depth - 1, 0))
    cmp_ = st.tuples(st.sampled_from(["OLess", "OEq"]), i, i).map(
        lambda t: A.EBinop(t[0], t[1], t[2])
    )
    if depth <= 0:
        return cmp_
    sub = bool_expr(depth - 1)
    logic = st.tuples(st.sampled_from(["OAnd", "OOr"]), sub, sub).map(
        lambda t: A.EBinop(t[0], t[1], t[2])
    )
    neg = sub.map(lambda e: A.EUnop("ONot", e))
    return st.one_of(cmp_, logic, neg)


# -- Python evaluator of the reference semantics ----------------------------

def ev(e: A.Expr, row: dict, env: dict):
    match e:
        case A.EVar(x):
            return env[x] if x in env else row
        case A.EAccess(base, f):
            b = ev(base, row, env)
            return b[f]
        case A.EAtom(A.AInt(v)):
            return v
        case A.ELet(e1, x, e2):
            return ev(e2, row, {**env, x: ev(e1, row, env)})
        case A.EIf(p, e1, e2):
            return ev(e1, row, env) if ev(p, row, env) else ev(e2, row, env)
        case A.EUnop("ONeg", e1):
            return -ev(e1, row, env)
        case A.EUnop("ONot", e1):
            return not ev(e1, row, env)
        case A.EBinop(op, e1, e2):
            v1, v2 = ev(e1, row, env), ev(e2, row, env)
            match op:
                case "OPlus":
                    return v1 + v2
                case "OMinus":
                    return v1 - v2
                case "OTimes":
                    return v1 * v2
                case "ODiv":  # Z.div, x/0 = 0
                    return v1 // v2 if v2 != 0 else 0
                case "OMod":  # Z.modulo, x mod 0 = x
                    return v1 % v2 if v2 != 0 else v1
                case "OLess":
                    return v1 < v2
                case "OEq":
                    return v1 == v2
                case "OAnd":
                    return v1 and v2
                case "OOr":
                    return v1 or v2
    raise AssertionError(f"unhandled {e}")


_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(pred=bool_expr(2), out=int_expr(2))
def test_compiled_filter_project_matches_python(spark, pred, out):
    """EProj(EFilter(t, x, pred), x, {v: out}) — compiled plan vs direct
    evaluation. int64 wrap in Spark vs unbounded Python ints: literals
    are small and rows bounded, deep OTimes chains can still overflow —
    mask the model into two's-complement to match the documented
    TInt→long departure."""
    df_rows = [{"a": a, "b": b} for a, b in ROWS]
    prog = A.EProj(
        "LikeBag",
        A.EFilter("LikeBag", A.ELoc("t"), "x", pred),
        "x",
        A.ERecord((("v", out),)),
    )
    store = Store()
    store.assign("t", spark.createDataFrame(ROWS, schema=_SCHEMA))
    got = sorted(r["v"] for r in compile_expr(prog, {}, store, spark).collect())

    def wrap64(v):
        u = v & (2**64 - 1)
        return u - 2**64 if u >= 2**63 else u

    want = sorted(
        wrap64(ev(out, r, {}))
        for r in df_rows
        if ev(pred, r, {})
    )
    assert got == want, f"\npred={pred}\nout={out}\ngot={got}\nwant={want}"


# -- sugar ≡ raw desugaring (Notations.v:144-149) ---------------------------

_names = st.sampled_from(["a", "b", "c", "d"])
_fields = st.sampled_from(["f1", "f2"])


def _pred(var):
    return A.EBinop(
        "OLess", A.EAccess(A.EVar(var), "f1"), A.EAtom(A.AInt(7))
    )


@given(
    st.lists(
        st.tuples(st.booleans(), _names), min_size=1, max_size=6
    ),
    st.booleans(),
)
@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_sugar_fold_equals_manual_nesting(steps, wrap_sort):
    """For ANY sequence of generators and guards, comp() must produce
    exactly the right-nested EFlatmap/EIf tree the Coq notations build —
    the sugar is a pure fold, no normalization, no reassociation."""
    from fiat2_spark.plans import sugar as S

    sugar_steps = []
    for is_bind, name in steps:
        if is_bind:
            sugar_steps.append(S.bind(name, A.ELoc(name)))
        else:
            sugar_steps.append(S.check(_pred(name)))
    terminal = S.ret(A.ERecord((("out", A.EAccess(A.EVar("a"), "f2")),)))
    got = S.comp(*sugar_steps, terminal)
    if wrap_sort:
        got = S.sort(got)

    want = terminal
    for is_bind, name in reversed(steps):
        if is_bind:
            want = A.EFlatmap("LikeList", A.ELoc(name), name, want)
        else:
            want = A.EIf(_pred(name), want, A.EAtom(A.ANil()))
    if wrap_sort:
        want = A.ESort("LikeList", want)
    assert got == want
