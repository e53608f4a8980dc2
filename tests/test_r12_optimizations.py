"""Focused pins for the r12 optimization-round rewrites — each test
locks the CONTRACT an optimization preserved, so a future edit that
re-breaks it fails here instead of at the oracle gate.

Covered rewrites:
* lm_perplexity / lm_perplexity3: the every-doc (0, 0) row now rides
  the scoring explode itself (explode_outer + pre-mapping flag) — the
  former distinct()+join-back is gone, the contract must not be;
* bpe_encode / bpe_encode_ids ``words=``: same-corpus vocabulary reuse
  must be row-identical to the generic merge-replay path;
* dup_clusters: the convergence flag rides the label-update row — a
  chain component (diameter > 1, several propagation rounds) must
  still converge to the transitive closure.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_lm_perplexity_every_doc_contract(spark):
    """Docs with <2 (resp. <3) tokens — including empty and NULL text,
    and a duplicate id split across rows — still score exactly one row
    each, (0, 0) when nothing is scorable."""
    from fiat2_spark.operators.text import lm_perplexity, lm_perplexity3

    rows = [
        (1, "the cat sat on the mat"),
        (2, "single"),
        (3, ""),
        (4, None),
        (5, "two tokens"),
        (5, "the cat"),  # duplicate id: transitions aggregate per id
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = df.filter(F.col("doc_id") == 1)

    out2 = {r["doc_id"]: (r["n_trans"], r["nll_q"])
            for r in lm_perplexity(df, ref, "doc_id", "text").collect()}
    assert set(out2) == {1, 2, 3, 4, 5}
    assert out2[2] == (0, 0) and out2[3] == (0, 0) and out2[4] == (0, 0)
    assert out2[1][0] == 5          # 6 tokens -> 5 transitions
    assert out2[5][0] == 2          # 1 + 1 transitions across the two rows
    assert out2[1][1] > 0

    out3 = {r["doc_id"]: (r["n_trans"], r["nll_q"])
            for r in lm_perplexity3(df, ref, "doc_id", "text").collect()}
    assert set(out3) == {1, 2, 3, 4, 5}
    assert out3[2] == (0, 0) and out3[3] == (0, 0) and out3[4] == (0, 0)
    assert out3[5] == (0, 0)        # each duplicate row has only 2 tokens
    assert out3[1] == (4, out3[1][1])


def test_bpe_encode_words_reuse_matches_replay(spark):
    """bpe_encode/bpe_encode_ids with the learner's words= relation are
    row-identical to the generic merge-replay path on the same corpus."""
    from fiat2_spark.operators.text import bpe_encode, bpe_encode_ids, bpe_learn

    docs = [(1, "low lower lowest"), (2, "new newer lowest low"),
            (3, "low low newer"), (4, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    words, mdf = bpe_learn(df, "text", n_merges=5)
    merges = [(r["lhs"], r["rhs"]) for r in mdf.orderBy("step").collect()]

    fast = _rows(bpe_encode(df, "doc_id", "text", merges, words=words),
                 "doc_id", "n_words", "n_bpe_tokens")
    slow = _rows(bpe_encode(df, "doc_id", "text", merges),
                 "doc_id", "n_words", "n_bpe_tokens")
    assert fast == slow and fast  # non-empty, doc 4 absent from both

    fast_ids = _rows(bpe_encode_ids(df, "doc_id", "text", merges, words=words),
                     "doc_id", "pos", "token_id")
    slow_ids = _rows(bpe_encode_ids(df, "doc_id", "text", merges),
                     "doc_id", "pos", "token_id")
    assert fast_ids == slow_ids and fast_ids


def test_dup_clusters_chain_converges(spark):
    """A chain component (diameter 4 — multiple min-label rounds) still
    reaches the transitive closure with the fused improved-flag check."""
    from fiat2_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "id_a long, id_b long"
    )
    got = {r["doc"]: r["cluster"] for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}
