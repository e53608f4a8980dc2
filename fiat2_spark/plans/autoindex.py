"""Automatic index selection over DSL commands — the OptimizeAnno
heuristic driver (the last unported piece of the reference's §4.3
index-introduction story).

Reference: fiat2/src/fiat2/OptimizeAnno.v:25-29 defines
``index_choice ::= SumAgg attr | MinAgg attr | DictIdx attr | BitmapIdx
attr attr_v``; ``mk_idx`` (OptimizeAnno.v:139-173) bundles, per choice,
a read rewrite (sum_to_agg_lookup_head SumAgg.v:83-92 /
min_to_agg_lookup_head MinAgg.v:82-90 / eq_filter_to_lookup_head
DictIndexImpl.v:374-390 / filter_to_bitmap_lookup_head BitmapIndex.v)
with a repeated write rewrite (cons_to_add / cons_to_min /
cons_to_insert / cons_to_bitmap_update), and ``apply_optimize_anno``
(OptimizeAnno.v:298-309) applies them below the CLetMut binders. In the
reference the choices arrive as ANNOTATIONS (Ex_Orders.v:69-76:
``AC [...] [[DictIdx "id"]; [SumAgg "price"; MinAgg "price"]]``); here
``choose_indexes`` DERIVES them from the command itself — the analyzer
inspects how each table is read (sum/min folds, eq-filter lookups) and
written (OCons insert loops) and picks the maintained form, so the
Ex_Orders program runs index-optimized with NO manual wiring.

The heuristic (per table ``t``):

* ``SumAgg attr``  — ``t`` is mutated ONLY by OCons inserts and some
  expression reads a sum fold of ``t.attr`` (either the ``EACFold
  AGSum`` aggregate or the verbatim Ex_Orders.v:54 ``EFold … OPlus``
  shape). Maintained as a scalar store slot: init is one distributed
  aggregate pass, each insert adds the new row's attr — O(1)/insert.
* ``MinAgg attr``  — same with the min fold shapes; the slot holds an
  option (None = empty table), each insert folds ``min`` in — O(1).
* ``DictIdx attr`` — an eq-filter of ``t`` on ``attr`` against a
  loop-varying key occurs INSIDE a ``CForeach`` (repeated lookups are
  what amortize the index build — the Ex_Orders inventory pattern).
  The aux slot holds the reference's ``to_idx`` dict (key ↦ bag of
  rows, DictIndexImpl.v:25-33) written as the VERBATIM fold program;
  execution recognizes the shape and builds it via one distributed
  group-by pass (`operators.aggregates.dict_index`). Lookups become
  O(1) dict reads instead of a per-iteration table scan.
* ``BitmapIdx attr v`` — an eq-filter of ``t`` on ``attr`` against the
  string CONSTANT ``v``. The aux is the maintained filtered sub-table
  (the bitmap's selected set); reads scan only it, inserts append the
  row iff it matches — O(1)/insert.

Scale posture: the maintained state is exactly what the reference
maintains — scalars, an option, a keyed dict, a filtered sub-relation —
never a second copy of unfiltered data. Sum/min init passes are
distributed aggregates; the dict build is a distributed group-by whose
driver materialization is FOLD_COLLECT_LIMIT-guarded (the command
layer's loops are driver-side sequential semantics by contract —
Interpret.v:516-523; batch-scale keyed state belongs to
streaming.maintenance.GroupIndex, the distributed twin of the same
to_idx shape).

Disqualifiers (mirroring the soundness side-conditions the reference's
transf lemmas carry): a table reassigned by anything other than the
OCons-insert pattern, or rebound by an inner CLetMut of the same name,
gets no indexes — its aux state could go stale.
"""

from __future__ import annotations

from dataclasses import dataclass

from fiat2_spark.plans import ast as A
from fiat2_spark.plans.typecheck import elem_type, synthesize


@dataclass(frozen=True)
class SumAggChoice:
    attr: str
    kind: str = "sum_agg"


@dataclass(frozen=True)
class MinAggChoice:
    attr: str
    kind: str = "min_agg"


@dataclass(frozen=True)
class DictIdxChoice:
    attr: str
    kind: str = "dict_idx"


@dataclass(frozen=True)
class BitmapIdxChoice:
    attr: str
    val: str
    kind: str = "bitmap_idx"


@dataclass
class AutoIndexReport:
    """What the driver chose and introduced — the test surface for
    'views were auto-introduced' assertions."""

    choices: dict[str, list]
    aux: dict[str, tuple[str, str]]  # aux slot -> (table, description)
    command: A.Command | None = None

    _MAINT = {
        "dict_idx": "cons_to_insert (DictIndexImpl.v:571-588)",
        "bitmap_idx": "cons_to_bitmap_update (BitmapIndex.v)",
        "sum_agg": "cons_to_add (SumAgg.v:150-156)",
        "min_agg": "cons_to_min (MinAgg.v:150-162)",
    }

    def explain(self) -> str:
        """Human-readable rendering of the index decision — the analog
        of the reference's user-visible per-program ``heuristics`` lists
        (Ex_Employee.v:37-45): which table got which aux structure, the
        introduced store slot, and the O(1) maintenance rule each insert
        pays. Printed by ``run_command_auto(explain=True)``."""
        lines = ["== auto-index plan =="]
        if not self.choices:
            lines.append("  (no indexable read patterns found — command runs as written)")
            return "\n".join(lines)
        slot_of = {
            (t, desc): slot for slot, (t, desc) in self.aux.items()
        }
        for t in sorted(self.choices):
            lines.append(f"  table `{t}`:")
            for ch in self.choices[t]:
                desc = ch.kind + ":" + ch.attr
                slot = slot_of.get((t, desc), "(not introduced)")
                detail = f"key={ch.attr}"
                if getattr(ch, "val", None) is not None:
                    detail += f", val={ch.val!r}"
                lines.append(
                    f"    {ch.kind}({detail}) -> aux slot `{slot}`; "
                    f"maintenance: {self._MAINT.get(ch.kind, ch.kind)}"
                )
        return "\n".join(lines)


# -- shape recognizers ------------------------------------------------------


def _is_loc(e: A.Expr, t: str) -> bool:
    return isinstance(e, A.ELoc) and e.x == t


def _attr_access(e: A.Expr, x: str) -> str | None:
    """``x.attr`` under binder ``x``."""
    if isinstance(e, A.EAccess) and isinstance(e.r, A.EVar) and e.r.x == x:
        return e.s
    return None


def _is_nil(e: A.Expr) -> bool:
    return isinstance(e, A.EAtom) and isinstance(
        e.a, (A.ANil, A.AEmptyBag, A.AEmptySet)
    )


def _proj_attr(e: A.Expr, t: str) -> str | None:
    """Projection-of-one-attribute over ``ELoc t`` — either the explicit
    ``EProj`` or the flatmap-ret comprehension the reference's notation
    produces (``[ x <- !t, ret x.attr ]``, Ex_Orders.v:54)."""
    match e:
        case A.EProj(_, l, x, r) if _is_loc(l, t):
            return _attr_access(r, x)
        case A.EFlatmap(_, l, x, A.EBinop("OCons", r, nil)) if _is_loc(l, t) and _is_nil(nil):
            return _attr_access(r, x)
    return None


def _sum_read(e: A.Expr, t: str) -> str | None:
    """The sum-of-attr read shapes ``sum_to_agg_lookup_head`` fires on
    (SumAgg.v:83-92): the AC aggregate, or the verbatim Ex_Orders.v:54
    fold ``EFold (proj t.attr) 0 (v acc. v + acc)``."""
    match e:
        case A.EACFold("AGSum", p):
            return _proj_attr(p, t)
        case A.EFold(p, A.EAtom(A.AInt(0)), v, acc, A.EBinop("OPlus", a1, a2)):
            names = {getattr(a1, "x", None), getattr(a2, "x", None)}
            if (
                isinstance(a1, A.EVar)
                and isinstance(a2, A.EVar)
                and names == {v, acc}
            ):
                return _proj_attr(p, t)
    return None


def _min_read(e: A.Expr, t: str) -> str | None:
    """The min-of-attr read shapes ``min_to_agg_lookup_head`` fires on
    (MinAgg.v:82-90): ``EACIFold AGMin`` over a (possibly set/bag-
    canonicalized) attr projection, or the verbatim Ex_Orders.v:54
    option-folding min ``EFold (proj) None (v acc. optmatch acc with
    None => Some v | Some m => if v < m then Some v else acc)``."""
    match e:
        case A.EACIFold("AGMin", p):
            inner = p.l if isinstance(p, (A.ESetOf, A.EBagOf)) else p
            return _proj_attr(inner, t)
        case A.EFold(
            p,
            A.EAtom(A.ANone(_)),
            v,
            acc,
            A.EOptMatch(A.EVar(scrut), A.EUnop("OSome", A.EVar(sv)), m, some_body),
        ) if scrut == acc and sv == v:
            match some_body:
                case A.EIf(
                    A.EBinop("OLess", A.EVar(cv), A.EVar(cm)),
                    A.EUnop("OSome", A.EVar(rv)),
                    A.EVar(relse),
                ) if cv == v and cm == m and rv == v and relse in (acc, m):
                    return _proj_attr(p, t)
    return None


def _eq_lookup(e: A.Expr, t: str):
    """Eq-filter lookup shapes ``eq_filter_to_lookup_head`` fires on
    (DictIndexImpl.v:374-390): ``EFilter t (x. x.attr == k)`` or the
    flatmap-guard comprehension ``[ x <- !t, check(x.attr == k), … ]``
    (Ex_Orders.v:54's inventory read). The predicate may be a
    CONJUNCTION containing one eq-conjunct on the binder's attr — the
    index serves the eq, the rest becomes a residual filter over the
    bucket (the classic index-scan + residual plan; the reference's
    head matches the bare eq only, this is a strict extension checked
    by the command fuzzer). Returns
    (attr, key_expr, binder, inner_body_or_None, tag, nil_or_None,
    residual_or_None)."""

    def conjuncts(p: A.Expr):
        if isinstance(p, A.EBinop) and p.op == "OAnd":
            return conjuncts(p.e1) + conjuncts(p.e2)
        return [p]

    def eq_key(pred: A.Expr, x: str):
        """(attr, key, residual_pred_or_None) — first eq-conjunct whose
        key is free of the binder and the table wins."""
        cs = conjuncts(pred)
        for i, c in enumerate(cs):
            match c:
                case A.EBinop("OEq", lhs, rhs):
                    a = _attr_access(lhs, x)
                    key = rhs if a is not None else None
                    if key is None:
                        a = _attr_access(rhs, x)
                        key = lhs if a is not None else None
                    if a is not None and key is not None and not _mentions(key, x, t):
                        rest = cs[:i] + cs[i + 1:]
                        residual = None
                        for r in rest:
                            residual = r if residual is None else A.EBinop("OAnd", residual, r)
                        # residual must not re-touch the table
                        if residual is not None and _mentions(residual, None, t):
                            return None
                        return a, key, residual
        return None

    match e:
        case A.EFilter(tag, l, x, p) if _is_loc(l, t):
            hit = eq_key(p, x)
            if hit:
                return hit[0], hit[1], x, None, tag, None, hit[2]
        case A.EFlatmap(tag, l, x, A.EIf(p, body, nil)) if _is_loc(l, t) and _is_nil(nil):
            hit = eq_key(p, x)
            if hit:
                return hit[0], hit[1], x, body, tag, nil, hit[2]
    return None


def _const_str(e: A.Expr) -> str | None:
    if isinstance(e, A.EAtom) and isinstance(e.a, A.AString):
        return e.a.s
    return None


def _mentions(e, x: str | None, t: str | None) -> bool:
    """Does ``e`` reference variable ``x`` or location ``t``?"""
    import dataclasses

    if isinstance(e, A.EVar) and e.x == x:
        return True
    if isinstance(e, A.ELoc) and e.x == t:
        return True
    if dataclasses.is_dataclass(e):
        vals = [getattr(e, f.name) for f in dataclasses.fields(e)]
    elif isinstance(e, (tuple, list)):
        vals = list(e)
    else:
        return False
    return any(_mentions(v, x, t) for v in vals)


def _insert_pattern(c: A.Command, t: str):
    """``t := OCons(row, !t)`` with a row that does not read ``t`` —
    the insert shape every cons_to_* maintenance head requires
    (SumAgg.v:150-156, DictIndexImpl.v:571-588)."""
    match c:
        case A.CAssign(x, A.EBinop("OCons", row, A.ELoc(x2))) if x == t and x2 == t:
            if not _mentions(row, None, t):
                return row
    return None


# -- the analyzer (the 'choose' the reference leaves to annotations) --------


def _walk_exprs(c: A.Command):
    """Every expression in a command, with a flag for being inside a
    CForeach body (the repetition context that amortizes index builds)."""

    def go(cmd, in_loop):
        match cmd:
            case A.CSkip():
                return
            case A.CSeq(c1, c2):
                yield from go(c1, in_loop)
                yield from go(c2, in_loop)
            case A.CLet(e, _, body) | A.CLetMut(e, _, body):
                yield e, in_loop
                yield from go(body, in_loop)
            case A.CAssign(_, e):
                yield e, in_loop
            case A.CIf(e, c1, c2):
                yield e, in_loop
                yield from go(c1, in_loop)
                yield from go(c2, in_loop)
            case A.CForeach(e, _, body):
                yield e, in_loop
                yield from go(body, True)

    yield from go(c, False)


def _subexprs(e: A.Expr):
    import dataclasses

    yield e
    if dataclasses.is_dataclass(e):
        for f in dataclasses.fields(e):
            v = getattr(e, f.name)
            if isinstance(v, A.Expr):
                yield from _subexprs(v)
            elif isinstance(v, tuple):
                for item in v:
                    if isinstance(item, tuple) and len(item) == 2 and isinstance(item[1], A.Expr):
                        yield from _subexprs(item[1])
                    elif isinstance(item, A.Expr):
                        yield from _subexprs(item)


def _tables_of(c: A.Command, store_tables: set[str]) -> dict[str, dict]:
    """Per-table facts: CLetMut-bound?, insert-mutated?, disqualified?
    (non-insert reassignment or shadowing rebind)."""
    facts: dict[str, dict] = {
        t: {"letmut": False, "inserted": False, "bad": False} for t in store_tables
    }

    def note(t):
        return facts.setdefault(t, {"letmut": False, "inserted": False, "bad": False})

    def go(cmd, bound):
        match cmd:
            case A.CSeq(c1, c2):
                go(c1, bound)
                go(c2, bound)
            case A.CLet(_, _, body):
                go(body, bound)
            case A.CLetMut(_, x, body):
                f = note(x)
                if x in bound or x in store_tables:
                    f["bad"] = True  # shadowing rebind — aux scope unclear
                f["letmut"] = True
                go(body, bound | {x})
            case A.CAssign(x, _):
                if _insert_pattern(cmd, x) is not None:
                    note(x)["inserted"] = True
                elif x in bound or x in store_tables:
                    note(x)["bad"] = True  # arbitrary reassignment
            case A.CIf(_, c1, c2):
                go(c1, bound)
                go(c2, bound)
            case A.CForeach(_, _, body):
                go(body, bound)
            case _:
                pass

    go(c, set())
    return facts


def choose_indexes(c: A.Command, store_tables: set[str] | None = None) -> dict[str, list]:
    """Derive per-table index choices from a command — the automatic
    replacement for OptimizeAnno.v's manual ``all_index_choices``
    annotation. ``store_tables`` names pre-existing store relations
    (tables not bound by a CLetMut inside ``c``)."""
    facts = _tables_of(c, store_tables or set())
    out: dict[str, list] = {}
    for t, f in facts.items():
        if f["bad"]:
            continue
        choices: list = []
        sum_attrs: set[str] = set()
        min_attrs: set[str] = set()
        dict_attrs: set[str] = set()
        bitmap_keys: set[tuple[str, str]] = set()
        def scan_eq(sub: A.Expr, binders: frozenset, in_loop: bool):
            """Binder-aware eq-lookup scan: a DictIdx pays off when the
            lookup repeats — inside a CForeach loop (in_loop), or keyed
            by an ENCLOSING COMPREHENSION BINDER (one lookup per outer
            row — the reference's fold_command_with_globals applies
            eq_filter_to_lookup_head at any depth, join-nested sites
            included; IndexTransf.v:862-872)."""
            hit = _eq_lookup(sub, t)
            if hit is not None:
                attr, key, _x, _body, _tag, _nil, residual = hit
                cv = _const_str(key)
                if cv is not None:
                    # residual-carrying sites qualify too: the rewrite
                    # becomes bitmap-scan + residual filter, same as
                    # DictIdx conjunction sites (BitmapIndex.v:811-831
                    # composed under IndexTransf.v:862-872)
                    bitmap_keys.add((attr, cv))
                elif cv is None and (
                    in_loop or any(_mentions(key, b, None) for b in binders)
                ):
                    dict_attrs.add(attr)
            import dataclasses

            match sub:
                case A.EFlatmap(_, l, x, body) | A.EFilter(_, l, x, body) | A.EProj(_, l, x, body):
                    scan_eq(l, binders, in_loop)
                    scan_eq(body, binders | {x}, in_loop)
                case A.EJoin(_, l1, l2, x, y, p, r):
                    scan_eq(l1, binders, in_loop)
                    scan_eq(l2, binders, in_loop)
                    scan_eq(p, binders | {x, y}, in_loop)
                    scan_eq(r, binders | {x, y}, in_loop)
                case A.EFold(e1, e2, v, acc, e3):
                    scan_eq(e1, binders, in_loop)
                    scan_eq(e2, binders, in_loop)
                    scan_eq(e3, binders | {v, acc}, in_loop)
                case _ if dataclasses.is_dataclass(sub):
                    for fd in dataclasses.fields(sub):
                        v = getattr(sub, fd.name)
                        if isinstance(v, A.Expr):
                            scan_eq(v, binders, in_loop)
                        elif isinstance(v, tuple):
                            for item in v:
                                if isinstance(item, tuple) and len(item) == 2 and isinstance(item[1], A.Expr):
                                    scan_eq(item[1], binders, in_loop)
                                elif isinstance(item, A.Expr):
                                    scan_eq(item, binders, in_loop)

        for e, in_loop in _walk_exprs(c):
            scan_eq(e, frozenset(), in_loop)
            for sub in _subexprs(e):
                a = _sum_read(sub, t)
                if a is not None and f["inserted"]:
                    sum_attrs.add(a)
                a = _min_read(sub, t)
                if a is not None and f["inserted"]:
                    min_attrs.add(a)
        choices += [SumAggChoice(a) for a in sorted(sum_attrs)]
        choices += [MinAggChoice(a) for a in sorted(min_attrs)]
        choices += [DictIdxChoice(a) for a in sorted(dict_attrs)]
        choices += [BitmapIdxChoice(a, v) for a, v in sorted(bitmap_keys)]
        if choices:
            out[t] = choices
    return out


# -- aux construction (mk_idx, OptimizeAnno.v:139-173) ----------------------


def _aux_name(t: str, ch) -> str:
    if isinstance(ch, BitmapIdxChoice):
        return f"__idx_bitmap__{t}__{ch.attr}__{ch.val}"
    return f"__idx_{ch.kind.split('_')[0]}__{t}__{ch.attr}"


def _proj_of(t: str, attr: str) -> A.Expr:
    return A.EProj(
        "LikeBag", A.ELoc(t), "__x", A.EAccess(A.EVar("__x"), attr)
    )


def to_idx_fold(t: str, attr: str, key_ty: A.Type, row_ty: A.Type) -> A.Expr:
    """The VERBATIM to_idx program (DictIndexImpl.v:25-33): fold the
    table into key ↦ bag-of-rows. compile's `_lift_table_aggs`
    recognizes this exact shape and evaluates it as one distributed
    group-by (`operators.aggregates.dict_index`) instead of the naive
    sequential fold — the same special-casing the reference's verified
    implementation applies to its own to_idx."""
    x, acc = "__x", "__acc"
    key = A.EAccess(A.EVar(x), attr)
    prior = A.EOptMatch(
        A.EBinop("OLookup", A.EVar(acc), key),
        A.EAtom(A.ANil(row_ty)),
        "__b",
        A.EVar("__b"),
    )
    return A.EFold(
        A.ELoc(t),
        A.EAtom(A.AEmptyDict((key_ty, A.TList(row_ty)))),
        x,
        acc,
        A.ETernop("OInsert", A.EVar(acc), key, A.EBinop("OCons", A.EVar(x), prior)),
    )


def _init_expr(t: str, ch, row_ty: A.TRecord) -> A.Expr:
    fields = dict(row_ty.fields)
    if isinstance(ch, SumAggChoice):
        return A.EACFold("AGSum", _proj_of(t, ch.attr))
    if isinstance(ch, MinAggChoice):
        return A.EACIFold("AGMin", _proj_of(t, ch.attr))
    if isinstance(ch, DictIdxChoice):
        return to_idx_fold(t, ch.attr, fields[ch.attr], row_ty)
    if isinstance(ch, BitmapIdxChoice):
        # list-typed so the OCons maintenance keeps the slot's type
        # (canonical order; every rewritten read re-canonicalizes to its
        # site's collection tag)
        return A.ESort(
            "LikeList",
            A.EFilter(
                "LikeBag",
                A.ELoc(t),
                "__x",
                A.EBinop(
                    "OEq", A.EAccess(A.EVar("__x"), ch.attr), A.EAtom(A.AString(ch.val))
                ),
            ),
        )
    raise ValueError(ch)


def _update_cmd(aux: str, ch, row: A.Expr, row_ty: A.TRecord) -> A.Command:
    """Per-insert maintenance — cons_to_add (SumAgg.v:150-156),
    cons_to_min (MinAgg.v:150-162), cons_to_insert
    (DictIndexImpl.v:571-588), cons_to_bitmap_update. Each touches only
    the new row and the aux state: O(1) per insert, no table scan."""
    r = "__r"
    attr_of_r = A.EAccess(A.EVar(r), ch.attr)
    if isinstance(ch, SumAggChoice):
        upd = A.EBinop("OPlus", A.ELoc(aux), attr_of_r)
    elif isinstance(ch, MinAggChoice):
        upd = A.EOptMatch(
            A.ELoc(aux),
            A.EUnop("OSome", attr_of_r),
            "__m",
            A.EUnop(
                "OSome",
                A.EIf(
                    A.EBinop("OLess", attr_of_r, A.EVar("__m")),
                    attr_of_r,
                    A.EVar("__m"),
                ),
            ),
        )
    elif isinstance(ch, DictIdxChoice):
        prior = A.EOptMatch(
            A.EBinop("OLookup", A.ELoc(aux), attr_of_r),
            A.EAtom(A.ANil(row_ty)),
            "__b",
            A.EVar("__b"),
        )
        upd = A.ETernop(
            "OInsert", A.ELoc(aux), attr_of_r, A.EBinop("OCons", A.EVar(r), prior)
        )
    elif isinstance(ch, BitmapIdxChoice):
        upd = A.EIf(
            A.EBinop("OEq", attr_of_r, A.EAtom(A.AString(ch.val))),
            A.EBinop("OCons", A.EVar(r), A.ELoc(aux)),
            A.ELoc(aux),
        )
    else:
        raise ValueError(ch)
    return A.CAssign(aux, A.ELet(row, r, upd))


# -- the rewrite (apply_optimize_anno, OptimizeAnno.v:298-309) --------------


def apply_auto_index(
    c: A.Command,
    gstore: dict,
    genv: dict,
    choices: dict[str, list] | None = None,
) -> tuple[A.Command, AutoIndexReport]:
    """Command → command: introduce aux store slots for each chosen
    index, rewrite reads to aux lookups and inserts to aux maintenance.
    Tables bound by CLetMut get their auxes immediately below the
    binder (apply_below_letmut); pre-existing store tables get them at
    the root. Returns the rewritten command + a report naming every
    introduced slot."""
    if choices is None:
        choices = choose_indexes(c, {t for t, ty in gstore.items()})
    report = AutoIndexReport(choices=choices, aux={})

    def row_type_of(t: str, gstore_now: dict) -> A.TRecord:
        ty = gstore_now[t]
        et = elem_type(ty)
        if not isinstance(et, A.TRecord):
            raise TypeError(f"auto-index target {t} is not a record table: {ty}")
        return et

    def rewrite_expr(
        e: A.Expr, active: dict[str, list], row_tys: dict, canonical: bool = False
    ):
        """Bottom-up read rewrite for every active (table, choice).

        ``canonical`` marks a site whose element ORDER is unobservable
        (the direct child of ESort/EBagOf/ESetOf). LikeList-tagged read
        sites are rewritten ONLY there: the aux buckets hold rows in
        canonical/maintenance order, not base-table order, so a bare
        list read through the index could reorder (the reference's
        rewrite lemmas preserve order because its indexes store Gallina
        lists in table order — ours are bags by construction)."""
        if isinstance(e, (A.ESort, A.EBagOf, A.ESetOf)):
            inner = rewrite_expr(e.l, active, row_tys, canonical=True)
            if isinstance(e, A.ESort):
                return A.ESort(e.tag, inner)
            return type(e)(inner)
        for t, chs in active.items():
            for ch in chs:
                aux = _aux_name(t, ch)
                if isinstance(ch, SumAggChoice) and _sum_read(e, t) == ch.attr:
                    return A.ELoc(aux)
                if isinstance(ch, MinAggChoice) and _min_read(e, t) == ch.attr:
                    return A.ELoc(aux)
                hit = _eq_lookup(e, t)
                if hit is not None:
                    attr, key, x, body, tag, nil, residual = hit
                    if tag == "LikeList" and not canonical:
                        continue
                    if isinstance(ch, DictIdxChoice) and ch.attr == attr and _const_str(key) is None:
                        looked = A.EOptMatch(
                            A.EBinop(
                                "OLookup",
                                A.ELoc(aux),
                                rewrite_expr(key, active, row_tys),
                            ),
                            A.EAtom(A.ANil(row_tys[t])),
                            "__b",
                            A.EVar("__b"),
                        )
                        if body is None:
                            if residual is not None:
                                # index-scan + residual filter: EFilter
                                # re-canonicalizes per its own tag
                                return A.EFilter(
                                    tag, looked, x,
                                    rewrite_expr(residual, active, row_tys),
                                )
                            # re-canonicalize: buckets are built sorted
                            # but maintained by O(1) prepend (bag
                            # semantics); the original EFilter's tag
                            # canonicalizes, so the rewrite must too
                            if tag == "LikeSet":
                                return A.ESetOf(looked)
                            if tag == "LikeBag":
                                return A.EBagOf(looked)
                            return looked  # LikeList under a canonicalizer
                        new_body = rewrite_expr(body, active, row_tys)
                        if residual is not None:
                            new_body = A.EIf(
                                rewrite_expr(residual, active, row_tys),
                                new_body,
                                nil,
                            )
                        return A.EFlatmap(tag, looked, x, new_body)
                    if (
                        isinstance(ch, BitmapIdxChoice)
                        and ch.attr == attr
                        and _const_str(key) == ch.val
                    ):
                        if body is None:
                            if residual is not None:
                                # bitmap-scan + residual filter, the
                                # same index-scan+residual plan DictIdx
                                # sites get (BitmapIndex.v:811-831 under
                                # IndexTransf.v:862-872); EFilter
                                # re-canonicalizes per its own tag
                                return A.EFilter(
                                    tag, A.ELoc(aux), x,
                                    rewrite_expr(residual, active, row_tys),
                                )
                            # re-canonicalize the list-typed aux to the
                            # read site's collection tag
                            if tag == "LikeSet":
                                return A.ESetOf(A.ELoc(aux))
                            return A.EBagOf(A.ELoc(aux))
                        new_body = rewrite_expr(body, active, row_tys)
                        if residual is not None:
                            new_body = A.EIf(
                                rewrite_expr(residual, active, row_tys),
                                new_body,
                                nil,
                            )
                        return A.EFlatmap(tag, A.ELoc(aux), x, new_body)
        # structural recursion
        import dataclasses

        if not dataclasses.is_dataclass(e):
            return e
        changed = False
        kwargs = {}
        for f in dataclasses.fields(e):
            v = getattr(e, f.name)
            if isinstance(v, A.Expr):
                nv = rewrite_expr(v, active, row_tys)
                kwargs[f.name] = nv
                changed = changed or nv is not v
            elif isinstance(v, tuple) and v and all(
                isinstance(i, tuple) and len(i) == 2 for i in v
            ):
                nv = tuple(
                    (n, rewrite_expr(fe, active, row_tys)) for n, fe in v
                )
                kwargs[f.name] = nv
                changed = changed or nv != v
            else:
                kwargs[f.name] = v
        return dataclasses.replace(e, **kwargs) if changed else e

    def wrap_aux(t: str, body: A.Command, gstore_now: dict) -> A.Command:
        row_ty = row_type_of(t, gstore_now)
        wrapped = body
        for ch in reversed(choices[t]):
            aux = _aux_name(t, ch)
            report.aux[aux] = (t, ch.kind + ":" + ch.attr)
            wrapped = A.CLetMut(_init_expr(t, ch, row_ty), aux, wrapped)
        return wrapped

    def rewrite_cmd(cmd: A.Command, active: dict[str, list], row_tys: dict, gstore_now: dict, genv_now: dict) -> A.Command:
        rx = lambda e: rewrite_expr(e, active, row_tys)  # noqa: E731
        match cmd:
            case A.CSkip():
                return cmd
            case A.CSeq(c1, c2):
                n1 = rewrite_cmd(c1, active, row_tys, gstore_now, genv_now)
                g1 = _gstore_after(c1, gstore_now, genv_now)
                return A.CSeq(n1, rewrite_cmd(c2, active, row_tys, g1, genv_now))
            case A.CLet(e, x, body):
                t = synthesize(e, gstore_now, genv_now)
                return A.CLet(
                    rx(e), x, rewrite_cmd(body, active, row_tys, gstore_now, {**genv_now, x: t})
                )
            case A.CLetMut(e, x, body):
                t_ty = synthesize(e, gstore_now, genv_now)
                g2 = {**gstore_now, x: t_ty}
                if x in choices:
                    row_tys2 = {**row_tys, x: elem_type(t_ty)}
                    active2 = {**active, x: choices[x]}
                    new_body = rewrite_cmd(body, active2, row_tys2, g2, genv_now)
                    return A.CLetMut(e, x, wrap_aux(x, new_body, g2))
                return A.CLetMut(
                    rx(e), x, rewrite_cmd(body, active, row_tys, g2, genv_now)
                )
            case A.CAssign(x, e):
                if x in active:
                    row = _insert_pattern(cmd, x)
                    if row is not None:
                        row_ty = row_tys[x]
                        if not isinstance(row_ty, A.TRecord):
                            raise TypeError(f"insert target {x} rows are not records")
                        out: A.Command = A.CAssign(x, A.EBinop("OCons", rx(row), A.ELoc(x)))
                        for ch in active[x]:
                            out = A.CSeq(
                                out, _update_cmd(_aux_name(x, ch), ch, rx(row), row_ty)
                            )
                        return out
                return A.CAssign(x, rx(e))
            case A.CIf(e, c1, c2):
                return A.CIf(
                    rx(e),
                    rewrite_cmd(c1, active, row_tys, gstore_now, genv_now),
                    rewrite_cmd(c2, active, row_tys, gstore_now, genv_now),
                )
            case A.CForeach(e, x, body):
                t = synthesize(e, gstore_now, genv_now)
                return A.CForeach(
                    rx(e),
                    x,
                    rewrite_cmd(body, active, row_tys, gstore_now, {**genv_now, x: elem_type(t)}),
                )
        raise TypeError(f"unknown command {cmd!r}")

    def _gstore_after(cmd: A.Command, gstore_now: dict, genv_now: dict) -> dict:
        from fiat2_spark.plans.typecheck import typecheck_command

        try:
            return typecheck_command(cmd, gstore_now, genv_now)
        except Exception:
            return gstore_now

    # pre-existing store tables: aux slots wrap the whole command
    root_active = {t: choices[t] for t in choices if t in gstore}
    row_tys0 = {t: elem_type(gstore[t]) for t in root_active}
    out = rewrite_cmd(c, root_active, row_tys0, dict(gstore), dict(genv))
    for t in root_active:
        out = wrap_aux(t, out, gstore)
    report.command = out
    return out, report


def run_command_auto(
    c: A.Command, store, env, spark, typecheck: bool = True, explain: bool = False
):
    """`run_command` with automatic index selection: derive (Gstore,
    Genv) from the live store/env the way the interpreter's typecheck
    entry does, choose indexes, rewrite, execute. Returns
    (store, AutoIndexReport) — the report is the evidence surface for
    'the views were auto-introduced'. ``explain=True`` prints the
    decision (`AutoIndexReport.explain`) before executing, the way the
    reference surfaces its per-program ``heuristics`` lists."""
    from pyspark.sql import DataFrame

    from fiat2_spark.plans.interp import run_command
    from fiat2_spark.plans.typecheck import schema_type, type_of_value

    gstore = {
        k: schema_type(v) if isinstance(v, DataFrame) else type_of_value(v)
        for k, v in store.snapshot().items()
    }
    genv = {}
    for x, b in env.items():
        if b[0] == "df":
            genv[x] = schema_type(b[1])
        elif b[0] == "py":
            genv[x] = type_of_value(b[1])
        else:
            raise TypeError("run_command_auto needs a statically-typed env")
    choices = choose_indexes(c, set(gstore))
    c2, report = apply_auto_index(c, gstore, genv, choices)
    if explain:
        print(report.explain(), flush=True)
    run_command(c2, store, env, spark, typecheck=typecheck)
    return store, report
