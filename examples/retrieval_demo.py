#!/usr/bin/env python
"""Retrieval / RAG walkthrough — the search surface of this engine on
one SparkSession, composing the registered, oracle-checked operators:

1. gate      — `quality_filter_apply`'s integer-threshold C4/Gopher
               rulebook keeps the clean corpus;
2. chunk     — `sliding_chunks` splits survivors into overlapping
               64-token windows (zero-shuffle generate);
3. lexical   — Okapi BM25 over the corpus for a query-term bag
               (`bm25_scores`: pre-explode term filter, broadcast
               stats);
4. vector    — exact cosine top-k against a query embedding
               (`cosine_topk`: broadcast query, partial
               WindowGroupLimit below the exchange);
5. fuse      — Reciprocal Rank Fusion (integer ranks → engine-exact);
6. eval      — `knn_label_vote` accuracy of the embedding space.

Every ranking is deterministic (6dp scores + id tiebreaks), so the
retrieved set is reproducible across runs and engines.

Run: python examples/retrieval_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fiat2_spark.operators import similarity as SIM
from fiat2_spark.operators import text as TX
from fiat2_spark.session import get_spark
from fiat2_spark.workloads import QUERIES
from fiat2_spark.workloads.util import tbl


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="fiat2-retrieval-demo")

    docs = tbl(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 1. quality gate (the applied rulebook, same plan the gate checks)
    clean = QUERIES["quality_filter_apply"](spark, sf_dir)
    n_clean = clean.count()
    print(f"== quality gate: {n_clean}/{n_docs} documents survive ==")

    # 2. chunking for retrieval granularity
    chunks = docs.join(clean.select("doc_id"), "doc_id").select(
        "doc_id",
        F.explode(TX.sliding_chunks(TX.tokens(F.col("text")), 64, 32)).alias("c"),
    )
    print(f"== chunking: {chunks.count()} overlapping 64-token windows ==")

    # 3+4+5. hybrid retrieval: BM25 ⊕ cosine via RRF (the registered
    # composition; ranks are integers so the fusion is engine-exact)
    hits = QUERIES["hybrid_rrf_retrieval"](spark, sf_dir)
    print("== hybrid top-10 (doc_id, rrf) ==")
    hits.show(10, truncate=False)
    assert hits.count() == 10

    # 6. embedding-space quality: kNN label-vote accuracy
    knn = QUERIES["knn_label_vote"](spark, sf_dir)
    acc = knn.agg(F.avg(F.col("correct").cast("double")).alias("acc")).first()["acc"]
    print(f"== kNN(5) label-vote accuracy over held-out vectors: {acc:.3f} ==")

    # sanity: the retrieval legs really pruned before fusing — the
    # hybrid plan's final windows touch a constant-bounded candidate set
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    print("== plan check: top-k prune present before fusion ==")


if __name__ == "__main__":
    main()
