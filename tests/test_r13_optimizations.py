"""Focused pins for the r13 optimization-round rewrites — each test
locks the CONTRACT an optimization preserved, so a future edit that
re-breaks it fails here instead of at the oracle gate.

Covered rewrites:
* bpe_learn_from_words driver path: below BPE_DRIVER_VOCAB_LIMIT the
  merge loop runs on collected rows with zero Spark jobs per merge —
  it must stay bit-identical to the distributed argmax loop (merge
  list AND final vocabulary), on ASCII and non-ASCII symbols alike.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _learn_both_paths(spark, monkeypatch, texts, n_merges, tokenizer=None):
    """(driver, distributed) results of bpe_learn on the same corpus:
    each is (sorted words rows, merge list)."""
    import fiat2_spark.operators.text as TX

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    kw = {"tokenizer": tokenizer} if tokenizer is not None else {}
    out = []
    for limit in (TX.BPE_DRIVER_VOCAB_LIMIT, 0):
        monkeypatch.setattr(TX, "BPE_DRIVER_VOCAB_LIMIT", limit)
        wdf, mdf = TX.bpe_learn(df, "text", n_merges=n_merges, **kw)
        words = sorted(
            (r["word"], r["wrapped"], r["freq"]) for r in wdf.collect()
        )
        merges = [
            (r["step"], r["lhs"], r["rhs"], r["freq"])
            for r in mdf.orderBy("step").collect()
        ]
        out.append((words, merges))
    return out


def test_bpe_learn_driver_matches_distributed(spark, monkeypatch):
    """The r13 driver-side merge loop is bit-identical to the
    distributed argmax loop: same merge list (order, pair, freq — the
    (freq desc, lhs, rhs) tie-break decides several steps here) and
    same final wrapped vocabulary, exercised on overlapping runs
    (aaaa/aaa), alternations (abab) and frequency ties."""
    texts = [
        "aaaa aaa abab abab baba",
        "the cat sat on the mat the cat",
        "aa ab ba bb aa ab",
    ]
    (d_words, d_merges), (x_words, x_merges) = _learn_both_paths(
        spark, monkeypatch, texts, n_merges=8
    )
    assert d_merges == x_merges
    assert d_words == x_words
    assert len(d_merges) == 8


def test_bpe_learn_driver_matches_distributed_unicode(spark, monkeypatch):
    """Same bit-identity under tokens_unicode with non-ASCII symbols —
    the argmax tie-break compares symbol strings, and Python's
    code-point order must agree with UTF8String's byte order on
    multi-byte characters."""
    from fiat2_spark.operators.text import tokens_unicode

    texts = [
        "été étage été étage über übel",
        "мама мыла раму мама мыла",
        "日本 日本語 語学 日本",
    ]
    (d_words, d_merges), (x_words, x_merges) = _learn_both_paths(
        spark, monkeypatch, texts, n_merges=6, tokenizer=tokens_unicode
    )
    assert d_merges == x_merges
    assert d_words == x_words
    assert len(d_merges) == 6


def test_bpe_learn_driver_early_break_and_empty(spark, monkeypatch):
    """Degenerate corpora take the same early exits on both paths: a
    vocabulary of single-symbol words merges only with the end marker
    and then runs out of pairs before n_merges; an empty corpus yields
    zero merges and an empty vocabulary."""
    import fiat2_spark.operators.text as TX

    (d_words, d_merges), (x_words, x_merges) = _learn_both_paths(
        spark, monkeypatch, ["a b a", "b a"], n_merges=8
    )
    assert d_merges == x_merges and d_words == x_words
    assert 0 < len(d_merges) < 8

    empty = spark.createDataFrame([], "text string")
    wdf, mdf = TX.bpe_learn(empty, "text", n_merges=4)
    assert mdf.count() == 0 and wdf.count() == 0


def test_bpe_learn_driver_path_runs_no_jobs_per_merge(spark):
    """The driver path's job count is independent of n_merges: learning
    2 vs 10 merges on the same tiny vocabulary costs the same number of
    Spark jobs (the checkpoint materialization + the bounded probe) —
    the per-merge argmax jobs are gone."""
    from fiat2_spark.operators.text import bpe_learn

    df = spark.createDataFrame(
        [("aaaa aaa abab the cat sat on the mat",)], "text string"
    )
    sc = spark.sparkContext

    def jobs(n_merges: int) -> int:
        j0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        bpe_learn(df, "text", n_merges=n_merges)
        return len(sc.statusTracker().getJobIdsForGroup(None) or []) - j0

    assert jobs(10) == jobs(2)
