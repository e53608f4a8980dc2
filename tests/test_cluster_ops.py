"""Unit tests for duplicate clustering and interpolated percentiles."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fiat2_spark.operators.dedup import dup_clusters


def test_dup_clusters_chain_multi_iteration(spark):
    """A 6-node chain needs several propagation rounds: min label must
    travel the full diameter. Second component + a self-contained pair
    check isolation."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (20, 21), (21, 20)],
        "id_a long, id_b long",
    )
    got = {r["doc"]: r["cluster"] for r in dup_clusters(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
        10: 10, 11: 10,
        20: 20, 21: 20,
    }


def test_dup_clusters_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dup_clusters(pairs).count() == 0


def test_percentile_cont_matches_native(spark):
    """The explicit sorted-array interpolation in the percentile_cont
    workload equals Spark's native `percentile` to 1e-9 (same
    percentile_cont semantics, different evaluation)."""
    from fiat2_spark.workloads.core import percentile_cont
    from tests.conftest import SF_SMOKE
    from fiat2_spark.workloads.util import tbl

    ours = {
        r["prio"]: (r["p50"], r["p90"])
        for r in percentile_cont(spark, SF_SMOKE).collect()
    }
    native = {
        r["prio"]: (r["p50"], r["p90"])
        for r in tbl(spark, SF_SMOKE, "orders")
        .groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        )
        .collect()
    }
    assert ours.keys() == native.keys() and len(ours) > 0
    for k in ours:
        assert abs(ours[k][0] - native[k][0]) < 1e-9
        assert abs(ours[k][1] - native[k][1]) < 1e-9


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.slow  # >=15s model-differential sweep; default run deselects (pytest.ini)
def test_dup_clusters_star_long_chain_and_random(spark):
    """Star contraction (Kiveris et al. 2014) must label a 60-node
    chain — diameter far beyond its O(log²) round budget — plus a
    random graph, identically to a union-find ground truth AND to the
    propagation-based dup_clusters."""
    import random

    from fiat2_spark.operators.dedup import dup_clusters_star

    rng = random.Random(7)
    chain = [(i, i + 1) for i in range(100, 160)]
    blob = [(rng.randrange(0, 40), rng.randrange(0, 40)) for _ in range(60)]
    blob = [(a, b) for a, b in blob if a != b]
    edges = chain + blob
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    want = _uf_components(edges)
    got = {r["doc"]: r["cluster"] for r in dup_clusters_star(pairs).collect()}
    assert got == want
    prop = {r["doc"]: r["cluster"] for r in dup_clusters(pairs, max_iter=100).collect()}
    assert got == prop


def test_dup_clusters_star_empty(spark):
    from fiat2_spark.operators.dedup import dup_clusters_star

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dup_clusters_star(pairs).count() == 0


def test_recursive_cte_cap_reaches_fixpoint(spark):
    """bfs_recursive_cte's depth cap (6, derived from measured source
    eccentricity <=3 across shipped SFs, x2 margin) must be SUFFICIENT:
    the capped engine-run closure has to equal the driver-orchestrated
    `bfs` fixpoint, which terminates on the true empty frontier. If the
    testdata generator ever reshapes the part graph past the cap, this
    fails before the oracle window does."""
    from fiat2_spark.workloads import QUERIES
    from tests.conftest import SF_SMOKE

    cte = {
        (r["node"], r["depth"])
        for r in QUERIES["bfs_recursive_cte"](spark, SF_SMOKE).collect()
    }
    fix = {(r["node"], r["depth"]) for r in QUERIES["bfs"](spark, SF_SMOKE).collect()}
    assert cte == fix


def test_substring_dedup_stats_hand_case(spark):
    """Hand-computable corpus for the k-gram substring dedup (k=4):
    doc 2 embeds doc 1's 6-token passage at offset 3 (shifted alignment
    — invisible to fixed segments), doc 3 is clean, doc 4 repeats its
    own first 4 tokens verbatim at its tail (self-repetition)."""
    from fiat2_spark.operators.dedup import substring_dedup_stats

    passage = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"{passage} one two three"),
            (2, f"x y z {passage} seven"),
            (3, "totally unrelated words with no overlap here at all"),
            (4, "p q r s filler filler2 p q r s"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc"]: (r["n_tokens"], r["n_spans"], r["n_removed_tokens"], r["n_dup_grams"])
        for r in substring_dedup_stats(docs, "doc_id", "text", k=4).collect()
    }
    # doc 2: grams at pos 3..5 (within the 6-token passage) duplicate
    # doc 1's pos 0..2 → one span [3, 9) = 6 tokens, 3 dup grams
    assert got[2] == (10, 1, 6, 3)
    # doc 4: gram "p q r s" at pos 6 duplicates its own pos 0
    assert got[4] == (10, 1, 4, 1)
    assert got[1] == (9, 0, 0, 0)
    assert got[3] == (9, 0, 0, 0)


def test_substring_dedup_apply_agrees_with_stats(spark):
    """apply and stats are two views of the same spans: kept tokens =
    n_tokens - removed, and the kept text of the shifted-passage doc
    drops exactly the embedded passage."""
    from fiat2_spark.operators.dedup import (
        substring_dedup_apply, substring_dedup_stats,
    )

    passage = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"{passage} one two three"),
            (2, f"x y z {passage} seven"),
            (3, "totally unrelated words with no overlap here at all"),
            (4, "p q r s filler filler2 p q r s"),
        ],
        "doc_id long, text string",
    )
    stats = {
        r["doc"]: r for r in substring_dedup_stats(docs, "doc_id", "text", k=4).collect()
    }
    applied = {
        r["doc"]: r for r in substring_dedup_apply(docs, "doc_id", "text", k=4).collect()
    }
    for doc in (1, 2, 3, 4):
        assert (
            applied[doc]["n_kept_tokens"]
            == stats[doc]["n_tokens"] - stats[doc]["n_removed_tokens"]
        ), doc
    assert applied[2]["kept_text"] == "x y z seven"
    assert applied[4]["kept_text"] == "p q r s filler filler2"
    assert applied[1]["kept_text"].startswith("alpha")


def test_substring_dedup_apply_chunked_reassembly_exact(spark):
    """The two-level reassembly (VERDICT r7 task 6: bound the
    pathological-document buffer) must be EXACT across chunk
    boundaries: with a tiny chunk size every document crosses many
    chunks, and the cleaned text must be byte-identical to the
    single-chunk path — order preserved, no separator artifacts at the
    seams, empty-chunk docs intact."""
    from fiat2_spark.operators.dedup import substring_dedup_apply

    passage = "alpha beta gamma delta epsilon zeta"
    long_tail = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, f"{passage} {long_tail}"),
            (2, f"{long_tail} {passage} end"),
            (3, "no duplicated content in this one at all"),
        ],
        "doc_id long, text string",
    )
    one_chunk = {
        r["doc"]: r
        for r in substring_dedup_apply(
            docs, "doc_id", "text", k=4, chunk_tokens=1_000_000
        ).collect()
    }
    tiny_chunks = {
        r["doc"]: r
        for r in substring_dedup_apply(
            docs, "doc_id", "text", k=4, chunk_tokens=5
        ).collect()
    }
    assert set(one_chunk) == set(tiny_chunks) == {1, 2, 3}
    for doc in (1, 2, 3):
        assert tiny_chunks[doc]["kept_text"] == one_chunk[doc]["kept_text"], doc
        assert tiny_chunks[doc]["n_kept_tokens"] == one_chunk[doc]["n_kept_tokens"]
    # sanity on content: doc 2 keeps its tail minus the passage
    assert "alpha" not in tiny_chunks[2]["kept_text"]
    assert tiny_chunks[2]["kept_text"].endswith("end")
    # order across the chunk seams: tail tokens stay strictly increasing
    toks = tiny_chunks[3]["kept_text"].split()
    assert toks == "no duplicated content in this one at all".split()


def test_boilerplate_remove_hand_case(spark):
    """Boilerplate = a 4-token segment recurring across >=2 DISTINCT
    docs; within-doc repeats alone don't qualify; reassembly preserves
    segment order; a doc that is ALL boilerplate survives as ''."""
    from fiat2_spark.operators.dedup import boilerplate_remove

    bp = "click here to subscribe"
    docs = spark.createDataFrame(
        [
            # doc 1: boilerplate + unique tail (two segments)
            (1, f"{bp} alpha beta gamma delta"),
            # doc 2: unique head + the same boilerplate segment
            (2, f"epsilon zeta eta theta {bp}"),
            # doc 3: a WITHIN-doc repeat that no other doc shares
            (3, "iota kappa mu nu iota kappa mu nu"),
            # doc 4: all boilerplate
            (4, bp),
            # doc 5: empty text
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_remove(docs, "doc_id", "text", seg_len=4, min_docs=2).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert (out[1]["n_segs"], out[1]["n_removed"]) == (2, 1)
    assert out[2]["clean_text"] == "epsilon zeta eta theta"
    assert (out[2]["n_segs"], out[2]["n_removed"]) == (2, 1)
    # within-doc repeat is NOT corpus boilerplate (1 distinct doc)
    assert out[3]["clean_text"] == "iota kappa mu nu iota kappa mu nu"
    assert out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 1
    assert (out[5]["n_segs"], out[5]["n_removed"], out[5]["clean_text"]) == (0, 0, "")


def test_boilerplate_remove_threshold_and_order(spark):
    """min_docs=3 spares a 2-doc repeat; surviving segments reassemble
    in seg_idx order across a removed middle segment."""
    from fiat2_spark.operators.dedup import boilerplate_remove

    seg = "one two three four"
    docs = spark.createDataFrame(
        [
            (1, f"a b c d {seg} e f g h"),
            (2, f"{seg} x y z w"),
            (3, f"p q r s {seg}"),
            (4, "v w u t only here once more words"),
        ],
        "doc_id long, text string",
    )
    out3 = {
        r["doc_id"]: r
        for r in boilerplate_remove(docs, "doc_id", "text", seg_len=4, min_docs=3).collect()
    }
    # seg recurs in docs 1,2,3 -> removed at min_docs=3; doc 1's
    # surviving head and tail reassemble around the removed middle
    assert out3[1]["clean_text"] == "a b c d e f g h"
    assert out3[4]["n_removed"] == 0
    out9 = {
        r["doc_id"]: r
        for r in boilerplate_remove(docs, "doc_id", "text", seg_len=4, min_docs=9).collect()
    }
    assert all(r["n_removed"] == 0 for r in out9.values())
