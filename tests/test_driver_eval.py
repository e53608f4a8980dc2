"""The pure-driver evaluator (`compile._try_driver_eval`) is now the
hot path for every command-layer scalar operation (loop arithmetic,
auto-index maintenance, dict lookups) — its Python semantics must be
EXACTLY the compiled engine's. Differential: hypothesis-generated
expressions over driver-bound values evaluated both ways must agree;
plus pinned cases for the boundaries (null-safe equality, option match,
bail-out on ops whose Python semantics differ)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fiat2_spark.plans import ast as A
from fiat2_spark.plans.compile import _NO_DRIVER, _try_driver_eval, compile_column


def spark_eval(spark, e: A.Expr, env: dict):
    col = compile_column(e, env)
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


# -- generators: scalar exprs over two py-bound ints and a py-bound str ----


def int_expr(depth: int):
    leaf = st.one_of(
        st.sampled_from([A.EVar("p"), A.EVar("q")]),
        st.integers(-40, 40).map(lambda v: A.EAtom(A.AInt(v))),
    )
    if depth <= 0:
        return leaf
    sub = int_expr(depth - 1)
    binop = st.tuples(st.sampled_from(["OPlus", "OMinus", "OTimes"]), sub, sub).map(
        lambda t: A.EBinop(t[0], t[1], t[2])
    )
    ite = st.tuples(bool_expr(depth - 1), sub, sub).map(
        lambda t: A.EIf(t[0], t[1], t[2])
    )
    let = st.tuples(sub, sub).map(
        lambda t: A.ELet(t[0], "y", A.EBinop("OPlus", A.EVar("y"), t[1]))
    )
    return st.one_of(leaf, binop, ite, let)


def bool_expr(depth: int):
    i = int_expr(max(depth - 1, 0))
    cmp_ = st.tuples(st.sampled_from(["OLess", "OEq"]), i, i).map(
        lambda t: A.EBinop(t[0], t[1], t[2])
    )
    if depth <= 0:
        return cmp_
    sub = bool_expr(depth - 1)
    return st.one_of(
        cmp_,
        st.tuples(sub, sub).map(lambda t: A.EBinop("OAnd", t[0], t[1])),
        st.tuples(sub, sub).map(lambda t: A.EBinop("OOr", t[0], t[1])),
        sub.map(lambda e: A.EUnop("ONot", e)),
    )


_SETTINGS = dict(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(e=int_expr(3), p=st.integers(-50, 50), q=st.integers(-50, 50))
def test_driver_eval_matches_compiled(spark, e, p, q):
    """Any expression the driver evaluator accepts must produce the
    exact value the compiled path produces (int64 wrap aside — bounded
    literals keep products in range)."""
    env = {"p": ("py", p), "q": ("py", q)}
    got = _try_driver_eval(e, env)
    assert got is not _NO_DRIVER, f"driver eval bailed on {e}"
    want = spark_eval(spark, e, env)
    assert got == want, f"\ne={e}\np={p} q={q}\ndriver={got}\ncompiled={want}"


def test_null_safe_equality_matches_engine(spark):
    """OEq is null-safe polymorphic (Value.v / scalars.py `<=>`): both
    paths must say None == None is True and None == 5 is False."""
    env = {"n": ("py", None), "v": ("py", 5)}
    for e, expect in [
        (A.EBinop("OEq", A.EVar("n"), A.EVar("n")), True),
        (A.EBinop("OEq", A.EVar("n"), A.EVar("v")), False),
        (A.EBinop("OEq", A.EVar("v"), A.EVar("v")), True),
    ]:
        got = _try_driver_eval(e, env)
        assert got == expect
        assert spark_eval(spark, e, env) == expect


def test_opt_match_none_and_some():
    env = {"n": ("py", None), "v": ("py", 7)}
    e_none = A.EOptMatch(A.EVar("n"), A.EAtom(A.AInt(-1)), "x", A.EVar("x"))
    e_some = A.EOptMatch(A.EVar("v"), A.EAtom(A.AInt(-1)), "x", A.EBinop("OPlus", A.EVar("x"), A.EAtom(A.AInt(1))))
    assert _try_driver_eval(e_none, env) == -1
    assert _try_driver_eval(e_some, env) == 8


def test_dict_and_list_ops():
    from pyspark.sql import Row

    d = {1: [Row(a=1, b=10)], 2: [Row(a=2, b=20)]}
    env = {"d": ("py", d)}
    lookup = A.EBinop("OLookup", A.EVar("d"), A.EAtom(A.AInt(2)))
    assert _try_driver_eval(lookup, env) == [Row(a=2, b=20)]
    missing = A.EBinop("OLookup", A.EVar("d"), A.EAtom(A.AInt(9)))
    assert _try_driver_eval(missing, env) is None
    ins = A.ETernop(
        "OInsert", A.EVar("d"), A.EAtom(A.AInt(3)), A.EAtom(A.ANil(A.TInt()))
    )
    out = _try_driver_eval(ins, env)
    assert out[3] == [] and out[1] is d[1]  # prior entries shared, not copied
    cons = A.EBinop("OCons", A.EAtom(A.AInt(0)), A.EAtom(A.ANil(A.TInt())))
    assert _try_driver_eval(cons, {}) == [0]


def test_bails_on_semantics_divergent_ops():
    """Operations whose Python semantics are NOT exactly the engine's
    (Coq floor div/mod, word wrap) must return the sentinel and take the
    compiled path — a silent Python '/' here would corrupt results."""
    env = {"p": ("py", 7), "q": ("py", -3)}
    for op in ("ODiv", "OMod"):
        e = A.EBinop(op, A.EVar("p"), A.EVar("q"))
        assert _try_driver_eval(e, env) is _NO_DRIVER
    # unsupported unop likewise
    e = A.EUnop("OIntToString", A.EVar("p"))
    assert _try_driver_eval(e, env) is _NO_DRIVER
    # unbound / column-bound vars bail rather than raise
    from pyspark.sql import functions as F

    e = A.EVar("c")
    assert _try_driver_eval(e, {"c": ("col", F.lit(1))}) is _NO_DRIVER


def test_record_access_and_retagging():
    from pyspark.sql import Row

    env = {"r": ("py", Row(a=3, b=4))}
    e = A.EBinop("OPlus", A.EAccess(A.EVar("r"), "a"), A.EAccess(A.EVar("r"), "b"))
    assert _try_driver_eval(e, env) == 7
    # ESort canonicalizes; LikeSet dedups
    lst = ("py", [3, 1, 2, 1])
    env2 = {"l": lst}
    assert _try_driver_eval(A.ESort("LikeBag", A.EVar("l")), env2) == [1, 1, 2, 3]
    assert _try_driver_eval(A.ESort("LikeSet", A.EVar("l")), env2) == [1, 2, 3]
