"""Type synthesis for the DSL — the engine's analyzer, mirroring the
reference's bidirectional checker (fiat2/src/fiat2/TypeSystem.v:718
analyze_expr / 1076 synthesize_expr, declarative rules 214-320). We
implement the synthesis direction (annotated atoms carry the types the
reference would have checked against) over a Gstore/Genv of fiat2 types.

One engine extension: ``TDouble`` — the driver's parquet has double
columns, which the reference language lacks; arithmetic/comparison
rules treat it like TInt (documented departure, SURVEY §1.4).

One documented RESTRICTION vs Language.v: **no nested options**.
The compiler encodes ``TOption t`` as a nullable column (Some =
injection, None = null — compile.py), which Spark SQL evaluates
natively but which collapses ``Some None`` and ``None`` at the outer
level: SQL nullability has one null, not one per nesting depth. The
reference's ``TOption (TOption t)`` is therefore rejected HERE, at
type-formation time, rather than silently mis-evaluated at runtime.
(The faithful encoding — wrap each inner option in a 1-field struct,
SURVEY §1.4 — costs a struct per level on every touch of the value;
no reference example program nests options, so we take the restriction
and keep option columns flat/fast. ``_no_nested_option`` is the gate;
tests/test_typecheck.py pins both the rejection and the flat
round-trip.)
"""

from __future__ import annotations

from fiat2_spark.plans.ast import *  # noqa: F401,F403
from fiat2_spark.plans import ast as A
from dataclasses import dataclass


@dataclass(frozen=True)
class TDouble(A.Type):
    """Engine extension for Spark double columns (not in Language.v)."""


class TypeError2(Exception):
    pass


def _numeric(t):
    return isinstance(t, (A.TInt, TDouble))


def elem_type(t):
    if isinstance(t, (A.TList, A.TBag, A.TSet)):
        return t.t
    raise TypeError2(f"expected collection, got {t}")


def _no_nested_option(t: A.Type) -> A.Type:
    """Reject TOption(TOption _) at formation (see module docstring:
    the nullable-column encoding has one null per column, not one per
    option level, so nesting would conflate Some None with None)."""
    if isinstance(t, A.TOption):
        raise TypeError2(
            "nested option types are not supported by the nullable-column "
            "encoding (Some None would be indistinguishable from None); "
            "wrap the inner option in a 1-field record instead"
        )
    return t


def synthesize(e: A.Expr, gstore: dict, genv: dict) -> A.Type:
    """Synthesize the type of ``e`` (TypeSystem.v:1076 synthesize_expr)."""
    syn = lambda x, env=None: synthesize(x, gstore, env if env is not None else genv)  # noqa: E731

    match e:
        case A.EVar(x):
            if x not in genv:
                raise TypeError2(f"unbound variable {x}")
            return genv[x]
        case A.ELoc(x):
            if x not in gstore:
                raise TypeError2(f"unbound location {x}")
            return gstore[x]
        case A.EAtom(a):
            return _atom_type(a)
        case A.EUnop(op, e1):
            return _unop_type(op, syn(e1))
        case A.EBinop(op, e1, e2):
            return _binop_type(op, syn(e1), syn(e2))
        case A.ETernop("OInsert", d, k, v):
            td = syn(d)
            if not isinstance(td, A.TDict):
                raise TypeError2("OInsert on non-dict")
            if not compatible(syn(k), td.kt):
                raise TypeError2(f"OInsert key type {syn(k)} vs dict key {td.kt}")
            if not compatible(syn(v), td.vt):
                raise TypeError2(f"OInsert value type {syn(v)} vs dict value {td.vt}")
            return td
        case A.EIf(p, e1, e2):
            if not isinstance(syn(p), A.TBool):
                raise TypeError2("EIf condition not bool")
            t1, t2 = syn(e1), syn(e2)
            return _join_types(t1, t2)
        case A.ELet(e1, x, e2):
            return synthesize(e2, gstore, {**genv, x: syn(e1)})
        case A.EFlatmap(tag, e1, x, e2):
            t1 = syn(e1)
            t2 = synthesize(e2, gstore, {**genv, x: elem_type(t1)})
            return _retag(tag, elem_type(t2))
        case A.EFlatmap2(e1, e2, x1, x2, e3):
            t1, t2 = syn(e1), syn(e2)
            t3 = synthesize(e3, gstore, {**genv, x1: elem_type(t1), x2: elem_type(t2)})
            return A.TList(elem_type(t3))
        case A.EFold(e1, e2, v, acc, e3):
            t1, t2 = syn(e1), syn(e2)
            return synthesize(e3, gstore, {**genv, v: elem_type(t1), acc: t2})
        case A.EACFold(ag, e1):
            elem = elem_type(syn(e1))
            if ag == "AGCount":
                return A.TInt()
            # engine leniency matching the compiled behavior: summing a
            # single-field-record table sums that field (compile.py lifts
            # to df.agg(sum(df.columns[0])))
            if isinstance(elem, A.TRecord) and len(elem.fields) == 1:
                return elem.fields[0][1]
            return elem
        case A.EACIFold(_, e1):
            elem = elem_type(syn(e1))
            if isinstance(elem, A.TRecord) and len(elem.fields) == 1:
                elem = elem.fields[0][1]
            return A.TOption(elem)
        case A.ERecord(fields):
            return A.TRecord(tuple(sorted((n, syn(fe)) for n, fe in fields)))
        case A.EAccess(r, s):
            tr = syn(r)
            if not isinstance(tr, A.TRecord):
                raise TypeError2(f"EAccess on non-record {tr}")
            return tr.field_type(s)
        case A.EOptMatch(e1, e_none, x, e_some):
            t1 = syn(e1)
            if not isinstance(t1, A.TOption):
                raise TypeError2("EOptMatch on non-option")
            tn = syn(e_none)
            ts = synthesize(e_some, gstore, {**genv, x: t1.t})
            return _join_types(tn, ts)
        case A.EDictFold(d, e0, k, v, acc, body):
            td, t0 = syn(d), syn(e0)
            if not isinstance(td, A.TDict):
                raise TypeError2("EDictFold on non-dict")
            return synthesize(body, gstore, {**genv, k: td.kt, v: td.vt, acc: t0})
        case A.ESort(tag, l):
            return A.TList(elem_type(syn(l)))
        case A.EFilter(tag, l, x, p):
            tl = syn(l)
            tp = synthesize(p, gstore, {**genv, x: elem_type(tl)})
            if not isinstance(tp, A.TBool):
                raise TypeError2("filter predicate not bool")
            return _retag(tag, elem_type(tl))
        case A.EJoin(tag, l1, l2, x, y, p, r):
            t1, t2 = elem_type(syn(l1)), elem_type(syn(l2))
            env2 = {**genv, x: t1, y: t2}
            if not isinstance(synthesize(p, gstore, env2), A.TBool):
                raise TypeError2("join predicate not bool")
            return _retag(tag, synthesize(r, gstore, env2))
        case A.EProj(tag, l, x, r):
            tl = syn(l)
            tr = synthesize(r, gstore, {**genv, x: elem_type(tl)})
            return _retag(tag, tr)
        case A.EBagOf(l):
            return A.TBag(elem_type(syn(l)))
        case A.ESetOf(l):
            return A.TSet(elem_type(syn(l)))
    raise TypeError2(f"cannot synthesize {e!r}")


def _retag(tag: str, elem: A.Type) -> A.Type:
    return {"LikeList": A.TList, "LikeBag": A.TBag, "LikeSet": A.TSet}[tag](elem)


def _join_types(t1: A.Type, t2: A.Type) -> A.Type:
    """Least upper bound of two branch types. TUnit inside a collection/
    option stands for 'unannotated empty' (ANil/ANone without a type
    ascription) and unifies with anything — the checking-mode information
    the reference's analyze_expr would have supplied."""
    if t1 == t2:
        return t1
    if isinstance(t1, A.TUnit):
        return t2
    if isinstance(t2, A.TUnit):
        return t1
    if _numeric(t1) and _numeric(t2):
        return TDouble() if TDouble() in (t1, t2) else A.TInt()
    for ctor in (A.TList, A.TBag, A.TSet):
        if isinstance(t1, ctor) and isinstance(t2, ctor):
            return ctor(_join_types(t1.t, t2.t))
    if isinstance(t1, A.TOption) and isinstance(t2, A.TOption):
        return A.TOption(_join_types(t1.t, t2.t))
    raise TypeError2(f"branch type mismatch: {t1} vs {t2}")


def _atom_type(a: A.Atom) -> A.Type:
    match a:
        case A.AWord(_):
            return A.TWord()
        case A.AInt(_):
            return A.TInt()
        case A.ABool(_):
            return A.TBool()
        case A.AString(_):
            return A.TString()
        case A.ANil(t):
            return A.TList(t if t else A.TUnit())
        case A.ANone(t):
            return A.TOption(_no_nested_option(t) if t else A.TUnit())
        case A.AEmptyDict(t):
            return A.TDict(*(t if t else (A.TUnit(), A.TUnit())))
        case A.AEmptyBag(t):
            return A.TBag(t if t else A.TUnit())
        case A.AEmptySet(t):
            return A.TSet(t if t else A.TUnit())
        case A.AUnit():
            return A.TUnit()
    raise TypeError2(f"unknown atom {a!r}")


_INT, _BOOL, _STR, _WORD = A.TInt(), A.TBool(), A.TString(), A.TWord()


def _unop_type(op: str, t: A.Type) -> A.Type:
    match op:
        case "OWNeg":
            return _WORD
        case "ONeg":
            return t if _numeric(t) else _INT
        case "ONot":
            return _BOOL
        case "OLength":
            elem_type(t)
            return _INT
        case "OLengthString":
            return _INT
        case "OIntToString":
            return _STR
        case "OSome":
            return A.TOption(_no_nested_option(t))
    raise TypeError2(f"unknown unop {op}")


def _binop_type(op: str, t1: A.Type, t2: A.Type) -> A.Type:
    match op:
        case "OWPlus" | "OWMinus" | "OWTimes" | "OWDivU" | "OWDivS" | "OWModU" | "OWModS":
            return _WORD
        case "OPlus" | "OMinus" | "OTimes" | "ODiv" | "OMod":
            return _join_types(t1, t2)
        case "OAnd" | "OOr":
            return _BOOL
        case "OConcat":
            return t1  # list ++ list
        case "OConcatString":
            return _STR
        case "OWLessU" | "OWLessS":
            return _BOOL
        case "OLess" | "OEq":
            # the reference types both operands at the SAME t
            # (TypeSystem.v OEq/OLess rules); without this check a
            # string-vs-int comparison sailed through to the compiler
            # (caught by examples/dsl_demo.py's ill-typed variant)
            if not compatible(t1, t2):
                raise TypeError2(f"{op} operand types differ: {t1} vs {t2}")
            return _BOOL
        case "OCons":
            if isinstance(t2, (A.TList, A.TBag, A.TSet)):
                # engine tables are bags (SURVEY §2.3); consing onto one
                # still checks the head against the element type
                return A.TList(_join_types(t1, t2.t))
            return A.TList(t1)
        case "ORange":
            return A.TList(_INT)
        case "OWRange":
            return A.TList(_WORD)
        case "OBagInsert":
            return t2
        case "OSetInsert":
            return t2
        case "OLookup":
            if isinstance(t1, A.TDict):
                return A.TOption(t1.vt)
            raise TypeError2("OLookup on non-dict")
        case "ODelete":
            return t1
    raise TypeError2(f"unknown binop {op}")


def is_table_type(t: A.Type) -> bool:
    return isinstance(t, (A.TList, A.TBag, A.TSet))


def compatible(t1: A.Type, t2: A.Type) -> bool:
    """Do two types unify (TUnit is the unannotated-empty wildcard,
    TInt/TDouble join numerically)?"""
    try:
        _join_types(t1, t2)
        return True
    except TypeError2:
        return False


def store_compatible(t_new: A.Type, t_old: A.Type) -> bool:
    """Assignment compatibility for store locations: engine tables are
    bags, and list/bag/set ops re-tag freely (SURVEY §2.3), so only the
    ELEMENT type is enforced across collection constructors."""
    if is_table_type(t_new) and is_table_type(t_old):
        return compatible(t_new.t, t_old.t)
    return compatible(t_new, t_old)


# -- checking mode (TypeSystem.v:718 analyze_expr) --------------------------

def analyze(e: A.Expr, gstore: dict, genv: dict, expected: A.Type) -> A.Type:
    """Check ``e`` against ``expected`` — the analysis direction of the
    reference's bidirectional checker (TypeSystem.v:718). Checking adds
    information synthesis lacks: unannotated empty collections/options
    take the expected type, and expectations push structurally through
    EIf/ELet/EOptMatch branches, record fields, OSome and OCons."""
    match e:
        case A.EAtom(A.ANil(None)) if is_table_type(expected):
            return expected
        case A.EAtom(A.AEmptyBag(None)) if is_table_type(expected):
            return expected
        case A.EAtom(A.AEmptySet(None)) if is_table_type(expected):
            return expected
        case A.EAtom(A.ANone(None)) if isinstance(expected, A.TOption):
            return expected
        case A.EAtom(A.AEmptyDict(None)) if isinstance(expected, A.TDict):
            return expected
        case A.EIf(p, e1, e2):
            analyze(p, gstore, genv, A.TBool())
            analyze(e1, gstore, genv, expected)
            analyze(e2, gstore, genv, expected)
            return expected
        case A.ELet(e1, x, e2):
            t1 = synthesize(e1, gstore, genv)
            return analyze(e2, gstore, {**genv, x: t1}, expected)
        case A.EOptMatch(e1, e_none, x, e_some):
            t1 = synthesize(e1, gstore, genv)
            if not isinstance(t1, A.TOption):
                raise TypeError2("EOptMatch on non-option")
            analyze(e_none, gstore, genv, expected)
            analyze(e_some, gstore, {**genv, x: t1.t}, expected)
            return expected
        case A.ERecord(fields) if isinstance(expected, A.TRecord):
            got = sorted(n for n, _ in fields)
            want = sorted(n for n, _ in expected.fields)
            if got != want:
                raise TypeError2(f"record fields {got} vs expected {want}")
            for n, fe in fields:
                analyze(fe, gstore, genv, expected.field_type(n))
            return expected
        case A.EUnop("OSome", e1) if isinstance(expected, A.TOption):
            analyze(e1, gstore, genv, _no_nested_option(expected.t))
            return expected
        case A.EBinop("OCons", h, t) if is_table_type(expected):
            analyze(h, gstore, genv, expected.t)
            analyze(t, gstore, genv, expected)
            return expected
    t = synthesize(e, gstore, genv)
    if not compatible(t, expected):
        raise TypeError2(f"expected {expected}, synthesized {t} for {e!r}")
    return expected


# -- value → type (for typing the dynamic store/env) ------------------------

def type_of_value(v) -> A.Type:
    import datetime
    import decimal

    if isinstance(v, bool):
        return A.TBool()
    if isinstance(v, int):
        return A.TInt()
    if isinstance(v, (float, decimal.Decimal)):
        return TDouble()
    if isinstance(v, str):
        return A.TString()
    if v is None:
        return A.TUnit()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return A.TString()  # timestamps are opaque ordered scalars in the DSL
    if hasattr(v, "asDict"):  # pyspark Row
        d = v.asDict()
        return A.TRecord(tuple(sorted((k, type_of_value(x)) for k, x in d.items())))
    if isinstance(v, dict):
        return A.TRecord(tuple(sorted((k, type_of_value(x)) for k, x in v.items())))
    if isinstance(v, (list, tuple)):
        return A.TList(type_of_value(v[0]) if v else A.TUnit())
    raise TypeError2(f"untypeable store value {type(v).__name__}")


# -- command typecheck (TypeSystem.v:1393-1420) -----------------------------

def typecheck_command(c: A.Command, gstore: dict, genv: dict) -> dict:
    """Static well-typedness of a command against (Gstore, Genv);
    returns the resulting Gstore (CAssign to a fresh location declares
    it — an engine extension over the reference, whose locations are
    pre-declared; re-assignment must preserve the element type).
    Ill-typed programs raise TypeError2 before any Spark job runs."""
    match c:
        case A.CSkip():
            return gstore
        case A.CSeq(c1, c2):
            return typecheck_command(c2, typecheck_command(c1, gstore, genv), genv)
        case A.CLet(e, x, body):
            t = synthesize(e, gstore, genv)
            return typecheck_command(body, gstore, {**genv, x: t})
        case A.CLetMut(e, x, body):
            t = synthesize(e, gstore, genv)
            g = dict(typecheck_command(body, {**gstore, x: t}, genv))
            # x's binding is scoped to body (Interpret.v:510-513)
            g.pop(x, None)
            if x in gstore:
                g[x] = gstore[x]
            return g
        case A.CAssign(x, e):
            t = synthesize(e, gstore, genv)
            if x in gstore:
                if not store_compatible(t, gstore[x]):
                    raise TypeError2(
                        f"CAssign {x}: {t} incompatible with declared {gstore[x]}"
                    )
                return gstore
            return {**gstore, x: t}
        case A.CIf(e, c1, c2):
            analyze(e, gstore, genv, A.TBool())
            g1 = typecheck_command(c1, gstore, genv)
            g2 = typecheck_command(c2, gstore, genv)
            merged = dict(g1)
            for k, t2 in g2.items():
                if k in merged:
                    if not store_compatible(t2, merged[k]):
                        raise TypeError2(f"CIf branches disagree on {k}: {merged[k]} vs {t2}")
                else:
                    merged[k] = t2
            return merged
        case A.CForeach(e, x, body):
            t = synthesize(e, gstore, genv)
            return typecheck_command(body, gstore, {**genv, x: elem_type(t)})
    raise TypeError2(f"unknown command {c!r}")


# -- Spark schema → fiat2 type ---------------------------------------------

def type_of_spark(dt) -> A.Type:
    from pyspark.sql import types as T

    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return A.TInt()
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return TDouble()
    if isinstance(dt, T.BooleanType):
        return A.TBool()
    if isinstance(dt, (T.StringType,)):
        return A.TString()
    if isinstance(dt, T.TimestampType) or type(dt).__name__ == "TimestampNTZType":
        return A.TString()  # timestamps enter the DSL as opaque ordered scalars
    if isinstance(dt, T.ArrayType):
        return A.TList(type_of_spark(dt.elementType))
    if isinstance(dt, T.MapType):
        return A.TDict(type_of_spark(dt.keyType), type_of_spark(dt.valueType))
    if isinstance(dt, T.StructType):
        return A.TRecord(tuple(sorted((f.name, type_of_spark(f.dataType)) for f in dt.fields)))
    if isinstance(dt, T.NullType):
        return A.TUnit()
    raise TypeError2(f"unmapped Spark type {dt}")


def schema_type(df) -> A.Type:
    """A DataFrame is a TBag of its row record (DataFrames are bags —
    SURVEY §2.3)."""
    return A.TBag(type_of_spark(df.schema))
