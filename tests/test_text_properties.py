"""Property-based verification of the repetition-signal formulas
against a direct Python model — a THIRD implementation independent of
both the Spark plan and the DuckDB oracle (those two share the tagged-
union formulation; this one counts n-grams with dicts), so a shared
misreading of the definitions can't pass. Drives duplicate-saturated,
single-token, and empty documents."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fiat2_spark.operators.text import repetition_stats

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_DOCS = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=12), min_size=1, max_size=6
)


def _model(toks):
    def grams(n):
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    def counts(gs):
        c = {}
        for g in gs:
            c[g] = c.get(g, 0) + 1
        return c

    ttr = round(len(set(toks)) / max(len(toks), 1), 6)
    bg = counts(grams(2)) if len(toks) >= 2 else {}
    top_bg = round(max(bg.values()) / sum(bg.values()), 6) if bg else 0.0
    tg = counts(grams(3)) if len(toks) >= 3 else {}
    dup_tg = (
        round(sum(v for v in tg.values() if v > 1) / sum(tg.values()), 6) if tg else 0.0
    )
    ug = counts(toks)
    if ug:
        n = sum(ug.values())
        ent = round(math.log(n) - sum(c * math.log(c) for c in ug.values()) / n, 6)
    else:
        ent = 0.0
    return (ttr, top_bg, dup_tg, ent)


@settings(**_SETTINGS)
@given(docs=_DOCS)
def test_repetition_stats_match_python_model(spark, docs):
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)], "doc_id long, toks array<string>"
    )
    got = {
        r["doc_id"]: (
            r["ttr"], r["top_bigram_frac"], r["dup_trigram_frac"], r["unigram_entropy"]
        )
        for r in repetition_stats(df, "toks", "doc_id").collect()
    }
    want = {i: _model(toks) for i, toks in enumerate(docs)}
    for i in want:
        for a, b in zip(got[i], want[i]):
            assert abs(a - b) < 1e-9, (i, got[i], want[i])


def test_dsir_scores_rank_target_like_docs_first(spark):
    """DSIR property (Xie et al. 2023): a pool document written in the
    target corpus vocabulary must outscore one written in vocabulary
    the target never uses — the importance log-ratio is positive for
    target-heavy buckets and negative for pool-only buckets. Also pins
    the bag-of-ngrams semantics: MORE in-distribution n-grams add up
    (counts, not presence) — while repeating a short phrase does NOT
    help, because the repetition wrap-around bigram ('scala spark') is
    pool-only and the doc's own occurrences inflate the pool counts
    (DSIR raw-side smoothing is self-penalizing for spam)."""
    from fiat2_spark.operators.text import dsir_importance

    target = spark.createDataFrame(
        [(100 + i, "spark scala catalyst tungsten shuffle partition") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "spark scala catalyst tungsten"),                   # in-distribution
            (2, "llama alpaca vicuna gnu"),                          # out-of-distribution
            (3, "spark scala catalyst tungsten shuffle partition"),  # fully in-distribution, longer
            (4, "spark llama"),                                      # mixed
            (5, "spark scala spark scala spark scala"),              # phrase spam
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in dsir_importance(raw, target, "doc_id", "text", buckets=64, k=10).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1] > got[2], got
    assert got[3] > got[1], "more in-distribution n-grams add up"
    assert got[1] > got[4] > got[2], got
    assert got[5] < got[1], "phrase spam must not outrank clean in-distribution text"
