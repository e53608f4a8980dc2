"""Type synthesis for the DSL — the engine's analyzer, mirroring the
reference's bidirectional checker (fiat2/src/fiat2/TypeSystem.v:718
analyze_expr / 1076 synthesize_expr, declarative rules 214-320). We
implement the synthesis direction (annotated atoms carry the types the
reference would have checked against) over a Gstore/Genv of fiat2 types.

One engine extension: ``TDouble`` — the driver's parquet has double
columns, which the reference language lacks; arithmetic/comparison
rules treat it like TInt (documented departure, SURVEY §1.4).
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
            return A.TInt() if ag == "AGCount" else elem
        case A.EACIFold(_, e1):
            return A.TOption(elem_type(syn(e1)))
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
            return A.TOption(t if t else A.TUnit())
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
            return A.TOption(t)
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
        case "OWLessU" | "OWLessS" | "OLess" | "OEq":
            return _BOOL
        case "OCons":
            if isinstance(t2, A.TList):
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
