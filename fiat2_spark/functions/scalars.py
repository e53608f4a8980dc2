"""Scalar function semantics of the reference language, as Spark Columns.

The reference's scalar operators (fiat2/src/fiat2/Language.v:70-111,
interpreter fiat2/src/fiat2/Interpret.v:33-210) differ from Spark/ANSI
defaults in three places, all handled here so every other layer can stay
on built-in JVM-side expressions (no Python UDFs anywhere in this module):

1. ``ODiv``/``OMod`` are Coq ``Z.div``/``Z.modulo``: **floor** division
   (round toward -inf) with the modulus taking the **divisor's sign**,
   and the total-function convention ``x / 0 = 0``, ``x mod 0 = x``
   (Interpret.v:147,150). Spark's ``div``/``%`` truncate toward zero.

2. Word arithmetic (``OWPlus`` … ``OWModS``, Interpret.v:139-150) is
   fixed-width wrap-around with unsigned/signed variants; Spark longs are
   signed 64-bit. We parameterize by width ``w`` and emulate: wrap via
   ``& mask`` + sign-extension for w < 64, native Java long wrap for
   w = 64, and unsigned 64-bit division via DECIMAL(20,0)
   reinterpretation.

3. ``OEq`` (Interpret.v:173) is total polymorphic equality over the value
   order, so ``None == None`` is **true** → null-safe ``<=>``.

All of these are pure Catalyst expressions: they stay inside whole-stage
codegen and cost nothing at 100 TB beyond the arithmetic itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_U64 = 18446744073709551616  # 2^64
_I64_MAX = 9223372036854775807


def _u64_lit() -> Column:
    """2^64 as a DECIMAL literal — it exceeds long, so F.lit(int) would
    fail at the py4j boundary; route through a string cast."""
    return F.lit(str(_U64)).cast("decimal(21,0)")


def _col(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# -- Coq integer division / modulo (Interpret.v:147,150) -------------------

def _floor_mod(a: Column, b: Column) -> Column:
    """Remainder with the divisor's sign (b != 0)."""
    m = a % b  # Spark: sign follows dividend
    return F.when((m != 0) & ((m < 0) != (b < 0)), m + b).otherwise(m)


def coq_mod(a, b) -> Column:
    """``Z.modulo``: sign follows divisor; ``x mod 0 = x``."""
    a, b = _col(a), _col(b)
    return F.when(b == 0, a).otherwise(_floor_mod(a, b))


def coq_div(a, b) -> Column:
    """``Z.div``: floor division; ``x / 0 = 0``.

    Exact over the full 64-bit range: ``a - floor_mod(a,b)`` is exactly
    divisible by ``b``, and the division runs in DECIMAL to avoid the
    double-precision 2^53 cliff.
    """
    a, b = _col(a), _col(b)
    exact = (a - _floor_mod(a, b)).cast("decimal(38,0)") / b.cast("decimal(38,0)")
    return F.when(b == 0, F.lit(0).cast("long")).otherwise(exact.cast("long"))


# -- word arithmetic (Interpret.v:139-150), width-parameterized ------------

def _mask(w: int) -> int:
    return (1 << w) - 1


def _wrap(c: Column, w: int) -> Column:
    """Reduce to the w-bit two's-complement representative, stored signed
    in a long (so w=64 is the identity — Java long wrap is the semantics)."""
    if w >= 64:
        return c
    u = c.bitwiseAND(F.lit(_mask(w)))
    return F.when(
        u.bitwiseAND(F.lit(1 << (w - 1))) != 0, u - F.lit(1 << w)
    ).otherwise(u)


def _unsigned(c: Column, w: int) -> Column:
    """Unsigned reinterpretation: long for w<64, DECIMAL(20,0) for w=64."""
    if w >= 64:
        d = c.cast("decimal(20,0)")
        return F.when(c < 0, d + _u64_lit()).otherwise(d)
    return c.bitwiseAND(F.lit(_mask(w)))


def _u64_to_long(d: Column) -> Column:
    """DECIMAL in [0, 2^64) → the signed long with that bit pattern."""
    return F.when(
        d > F.lit(_I64_MAX).cast("decimal(20,0)"),
        (d.cast("decimal(21,0)") - _u64_lit()).cast("long"),
    ).otherwise(d.cast("long"))


def word_add(a, b, w: int = 64) -> Column:
    return _wrap(_col(a) + _col(b), w)


def word_sub(a, b, w: int = 64) -> Column:
    return _wrap(_col(a) - _col(b), w)


def word_mul(a, b, w: int = 64) -> Column:
    return _wrap(_col(a) * _col(b), w)


def word_neg(a, w: int = 64) -> Column:
    return _wrap(-_col(a), w)


def _exact_div_nonneg(ua: Column, ub: Column) -> Column:
    """Truncating division of nonnegative operands, exact via DECIMAL."""
    ua38, ub38 = ua.cast("decimal(38,0)"), ub.cast("decimal(38,0)")
    return ((ua38 - ua38 % ub38) / ub38).cast("decimal(20,0)")


def word_divu(a, b, w: int = 64) -> Column:
    """Unsigned division; div-by-zero → 2^w - 1 (all-ones, the RISC-V /
    bedrock2 convention)."""
    a, b = _col(a), _col(b)
    ua, ub = _unsigned(a, w), _unsigned(b, w)
    if w >= 64:
        q = _u64_to_long(_exact_div_nonneg(ua, ub))
        return F.when(b == 0, F.lit(-1).cast("long")).otherwise(q)
    # all-ones sign-extends to -1 in the stored w-bit signed representation
    q = _exact_div_nonneg(ua, ub).cast("long")
    return F.when(ub == 0, F.lit(-1).cast("long")).otherwise(_wrap(q, w))


def word_modu(a, b, w: int = 64) -> Column:
    a, b = _col(a), _col(b)
    ua, ub = _unsigned(a, w), _unsigned(b, w)
    if w >= 64:
        return F.when(b == 0, a).otherwise(_u64_to_long(ua % ub))
    return F.when(ub == 0, _wrap(ua, w)).otherwise(_wrap(ua % ub, w))


def word_divs(a, b, w: int = 64) -> Column:
    """Signed truncating division of the w-bit signed interpretations;
    div-by-zero → -1 (all-ones)."""
    sa, sb = _wrap(_col(a), w), _wrap(_col(b), w)
    q = ((sa - sa % sb).cast("decimal(38,0)") / sb.cast("decimal(38,0)")).cast("long")
    return F.when(sb == 0, _wrap(F.lit(-1).cast("long"), w)).otherwise(_wrap(q, w))


def word_mods(a, b, w: int = 64) -> Column:
    sa, sb = _wrap(_col(a), w), _wrap(_col(b), w)
    return F.when(sb == 0, sa).otherwise(_wrap(sa % sb, w))


def word_ltu(a, b, w: int = 64) -> Column:
    return _unsigned(_col(a), w) < _unsigned(_col(b), w)


def word_lts(a, b, w: int = 64) -> Column:
    return _wrap(_col(a), w) < _wrap(_col(b), w)


# -- polymorphic total equality (Interpret.v:173, Value.v:116-149) ---------

def eq_value(a, b) -> Column:
    """fiat2 ``OEq``: total equality over the value order — ``None == None``
    is true → Spark null-safe equality ``<=>``. Works on structs/arrays
    too (Spark compares them structurally, matching the reference's
    lexicographic value order on name-sorted records)."""
    return _col(a).eqNullSafe(_col(b))


# -- option eliminator (EOptMatch, Interpret.v:340-345) --------------------

def opt_match(opt: Column, none_val, some_fn) -> Column:
    """``match opt with None => none_val | Some x => some_fn x end``."""
    return F.when(opt.isNull(), _col(none_val)).otherwise(some_fn(opt))


def int_to_string(c) -> Column:
    """OIntToString (Interpret.v:56): decimal string rendering."""
    return _col(c).cast("string")
