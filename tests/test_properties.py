"""Property-based differential tests (SURVEY §5 port strategy): the
scalar semantics layer vs a direct Python model of the reference
interpreter (fiat2/src/fiat2/Interpret.v:33-210). Python's // and % ARE
Coq's Z.div/Z.modulo (floor division, modulus takes the divisor's sign),
so the model is one line per operator; hypothesis drives the operand
space including signs, zero divisors, and width extremes.

Domain note: TInt maps to 64-bit long (SURVEY §1.4 documents the
departure from unbounded Z); the int-division domain here stays within
±2^62 so the model's intermediate b·⌊a/b⌋ also fits — the engine's own
DECIMAL path is exact over the full long range.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from fiat2_spark.functions import scalars as S

_SPECIALS = [0, 1, -1, 2, -2, 7, -7, 100, -100]
_INT62 = st.one_of(
    st.sampled_from(_SPECIALS + [2**62, -(2**62)]),
    st.integers(-(2**62), 2**62),
)
_LONG = st.one_of(
    st.sampled_from(_SPECIALS + [2**63 - 1, -(2**63), 2**31, -(2**31)]),
    st.integers(-(2**63), 2**63 - 1),
)
_PAIRS62 = st.lists(st.tuples(_INT62, _INT62), min_size=1, max_size=64)
_PAIRS64 = st.lists(st.tuples(_LONG, _LONG), min_size=1, max_size=64)
_WIDTH = st.sampled_from([8, 16, 32, 64])

_SCHEMA = StructType([StructField("a", LongType()), StructField("b", LongType())])

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _run(spark, pairs, cols):
    df = spark.createDataFrame(pairs, schema=_SCHEMA)
    return df.select(*[c.alias(f"c{i}") for i, c in enumerate(cols)]).collect()


# -- Python model of the reference semantics --------------------------------

def m_div(a, b):  # Z.div with x/0 = 0 (Interpret.v:147)
    return a // b if b != 0 else 0


def m_mod(a, b):  # Z.modulo with x mod 0 = x (Interpret.v:150)
    return a % b if b != 0 else a


def m_wrap(x, w):
    u = x & ((1 << w) - 1)
    return u - (1 << w) if u & (1 << (w - 1)) else u


def m_uns(x, w):
    return x & ((1 << w) - 1)


def m_trunc_div(a, b):
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def m_divu(a, b, w):  # div-by-zero → all-ones (bedrock2 convention)
    ua, ub = m_uns(a, w), m_uns(b, w)
    return m_wrap((1 << w) - 1, w) if ub == 0 else m_wrap(ua // ub, w)


def m_modu(a, b, w):
    ua, ub = m_uns(a, w), m_uns(b, w)
    return m_wrap(ua, w) if ub == 0 else m_wrap(ua % ub, w)


def m_divs(a, b, w):  # signed truncating; div-by-zero → -1
    sa, sb = m_wrap(a, w), m_wrap(b, w)
    return m_wrap(-1, w) if sb == 0 else m_wrap(m_trunc_div(sa, sb), w)


def m_mods(a, b, w):
    sa, sb = m_wrap(a, w), m_wrap(b, w)
    return sa if sb == 0 else m_wrap(sa - m_trunc_div(sa, sb) * sb, w)


# -- properties -------------------------------------------------------------

@settings(**_SETTINGS)
@given(pairs=_PAIRS62)
def test_coq_div_mod(spark, pairs):
    rows = _run(
        spark, pairs, [S.coq_div(F.col("a"), F.col("b")), S.coq_mod(F.col("a"), F.col("b"))]
    )
    for (a, b), r in zip(pairs, rows):
        assert r["c0"] == m_div(a, b), f"div {a}/{b}: {r['c0']} != {m_div(a, b)}"
        assert r["c1"] == m_mod(a, b), f"mod {a}%{b}: {r['c1']} != {m_mod(a, b)}"


@settings(**_SETTINGS)
@given(pairs=_PAIRS64, w=_WIDTH)
def test_word_ring_ops(spark, pairs, w):
    rows = _run(
        spark,
        pairs,
        [
            S.word_add(F.col("a"), F.col("b"), w),
            S.word_sub(F.col("a"), F.col("b"), w),
            S.word_mul(F.col("a"), F.col("b"), w),
            S.word_neg(F.col("a"), w),
        ],
    )
    for (a, b), r in zip(pairs, rows):
        assert r["c0"] == m_wrap(a + b, w)
        assert r["c1"] == m_wrap(a - b, w)
        assert r["c2"] == m_wrap(a * b, w)
        assert r["c3"] == m_wrap(-a, w)


@settings(**_SETTINGS)
@given(pairs=_PAIRS64, w=_WIDTH)
def test_word_division(spark, pairs, w):
    rows = _run(
        spark,
        pairs,
        [
            S.word_divu(F.col("a"), F.col("b"), w),
            S.word_modu(F.col("a"), F.col("b"), w),
            S.word_divs(F.col("a"), F.col("b"), w),
            S.word_mods(F.col("a"), F.col("b"), w),
        ],
    )
    for (a, b), r in zip(pairs, rows):
        assert r["c0"] == m_divu(a, b, w), f"divu {a},{b},w{w}"
        assert r["c1"] == m_modu(a, b, w), f"modu {a},{b},w{w}"
        assert r["c2"] == m_divs(a, b, w), f"divs {a},{b},w{w}"
        assert r["c3"] == m_mods(a, b, w), f"mods {a},{b},w{w}"


@settings(**_SETTINGS)
@given(pairs=_PAIRS64, w=_WIDTH)
def test_word_comparisons(spark, pairs, w):
    rows = _run(
        spark,
        pairs,
        [S.word_ltu(F.col("a"), F.col("b"), w), S.word_lts(F.col("a"), F.col("b"), w)],
    )
    for (a, b), r in zip(pairs, rows):
        assert r["c0"] == (m_uns(a, w) < m_uns(b, w))
        assert r["c1"] == (m_wrap(a, w) < m_wrap(b, w))


def test_eq_value_null_semantics(spark):
    """OEq on options: None == None is TRUE (Interpret.v:173) — the spot
    where Spark's default `=` (null-propagating) would silently differ."""
    df = spark.createDataFrame(
        [(None, None), (None, 1), (1, None), (1, 1), (1, 2)],
        schema=StructType([StructField("a", LongType()), StructField("b", LongType())]),
    )
    got = [r["e"] for r in df.select(S.eq_value(F.col("a"), F.col("b")).alias("e")).collect()]
    assert got == [True, False, False, True, False]
