#!/usr/bin/env python
"""One-off sfN scaling probe for the iterative/heavy pipeline family
(VERDICT r4 task 6): derive a ~10x documents/embeddings corpus from the
read-only sf0.1 testdata, run the five heavy queries at both scales, and
record wall-time ratios. The point is to surface super-linear surprises
the per-round sf0.1 bench cannot see — band-bucket occupancy blowups,
label-propagation round growth, packing prefix-sum skew.

Derivation (deterministic, no RNG): FACTOR replicas of each document
with doc_id offset by 10M per replica; replica 0 is the original, every
other replica gets a 1-token prefix so replicas stay NEAR-duplicates
(same Jaccard regime the dedup family targets) without being byte-equal.
This makes the probe corpus duplicate-HEAVY (~90% of docs are members of
a near-dup cluster) — deliberately the adversarial regime for
dedup_fuzzy_apply, whose r4 weak flag was exactly "what if losers is
most of the corpus". Embeddings likewise replicate with a per-replica
1e-6 nudge on every component. All other tables are symlinked from
sf0.1 unchanged.

Round 6 widens the probe to the shuffle-heavy OLAP family (VERDICT r5
task 7): lineitem and orders are ALSO replicated — orderkeys offset by
10M per replica so orders⋈lineitem referential integrity holds and
lineitem self-joins (Q21) keep constant per-order group sizes, while
dimension keys (custkey/suppkey/partkey) stay unchanged so per-dim
groups and window partitions grow ~FACTOR — the realistic fact-growth
regime for TPC-H shapes and per-entity windows.

Usage: python tools/scaling_probe.py [factor] [out_md] [query ...]
Writes SCALING_r05.md (or out_md) at the repo root; an explicit query
list overrides the default HEAVY set. The derived-corpus marker records
the factor (_BUILT_<factor>), so switching factors rebuilds instead of
silently reusing the old corpus (ADVICE r5).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fiat2_spark.session import get_spark
from fiat2_spark.workloads import QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfprobe/sf1"
OFFSET = 10_000_000

HEAVY = [
    "dedup_fuzzy_apply",
    "kmeans_lloyd",
    "dedup_clusters_star",
    "span_dedup",
    "pipeline_training_set",
    # round-5 ops: the first four scale like their audited parents; the
    # kNN eval is the DELIBERATELY quadratic exact baseline (queries and
    # corpus both grow, work grows ~factor² — the number the ANN paths
    # exist to beat), kept in the probe so the trade is measured, not
    # assumed
    "quality_filter_apply",
    "mad_scalable",
    "hybrid_rrf_retrieval",
    "knn_label_vote",
]


def build(spark, factor: int) -> None:
    if os.path.exists(os.path.join(DST, f"_BUILT_{factor}")):
        return
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    reps = spark.range(factor).select(F.col("id").alias("__r"))

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    docs_n = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("__r") * OFFSET)
        .withColumn(
            "text",
            F.when(F.col("__r") == 0, F.col("text")).otherwise(
                F.concat(F.lit("v"), F.col("__r").cast("string"), F.lit(" "), F.col("text"))
            ),
        )
        .drop("__r")
    )
    docs_n.write.mode("overwrite").parquet(os.path.join(DST, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    emb_n = (
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("__r") * OFFSET)
        .withColumn(
            "embedding",
            F.transform(
                "embedding", lambda x: x + F.col("__r").cast("float") * F.lit(1e-6)
            ),
        )
        .drop("__r")
    )
    emb_n.write.mode("overwrite").parquet(os.path.join(DST, "embeddings.parquet"))

    # fact tables for the OLAP probe: orderkeys offset per replica so
    # orders⋈lineitem joins stay 1:N with constant per-order group
    # sizes; dim keys untouched → per-dim groups grow ~factor
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        t = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        t_n = (
            t.crossJoin(reps)
            .withColumn(key, F.col(key) + F.col("__r").cast(t.schema[key].dataType.simpleString()) * OFFSET)
            .drop("__r")
        )
        t_n.write.mode("overwrite").parquet(os.path.join(DST, f"{name}.parquet"))

    replicated = ("documents.parquet", "embeddings.parquet", "lineitem.parquet", "orders.parquet")
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f not in replicated:
            os.symlink(os.path.join(SRC, f), os.path.join(DST, f))
    open(os.path.join(DST, f"_BUILT_{factor}"), "w").close()


LDST = "/tmp/sfprobe/longdocs"


def build_longdocs(spark, factor: int) -> None:
    """Derived corpus scaling doc LENGTH instead of doc count (VERDICT
    r7 task 6's probe axis): each document's text becomes ``factor``
    prefix-varied copies of itself concatenated — ×factor tokens per
    doc at constant doc count, with long internal duplicated runs (the
    adversarial regime for the per-doc reassembly path in
    `substring_dedup_apply`, whose chunked aggregation this probes)."""
    if os.path.exists(os.path.join(LDST, f"_BUILT_{factor}")):
        return
    shutil.rmtree(LDST, ignore_errors=True)
    os.makedirs(LDST, exist_ok=True)
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    long_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(factor - 1)),
            lambda r: F.concat(F.lit("v"), r.cast("string"), F.lit(" "), F.col("text")),
        ),
    )
    docs.withColumn("text", long_text).write.mode("overwrite").parquet(
        os.path.join(LDST, "documents.parquet")
    )
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "documents.parquet":
            os.symlink(os.path.join(SRC, f), os.path.join(LDST, f))
    open(os.path.join(LDST, f"_BUILT_{factor}"), "w").close()


def minhash_pair_counts(spark, sf_dir: str) -> dict:
    """Decompose the dedup_minhash probe point (VERDICT r7 'what's
    missing' #3): count the banded LSH CANDIDATE pairs and the
    VERIFIED (jac >= threshold) pairs at a given scale, with the same
    parameters the registered query uses. Candidate growth ~ true-pair
    growth means the workload grew (replication inflates real near-dup
    pairs by construction); candidates growing much faster than
    verified pairs would mean band-occupancy overhead — re-tune
    bands/rows or add the size-ratio prefilter."""
    from fiat2_spark.operators.dedup import minhash_candidates
    from fiat2_spark.session import release_checkpoint_blocks
    from fiat2_spark.workloads.util import tbl

    d = tbl(spark, sf_dir, "documents")
    cand, sh = minhash_candidates(d, "doc_id", "text", n_hashes=16, n_bands=4, shingle_n=3)
    n_cand = cand.count()
    a = sh.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
    n_ver = cand.join(a, "id_a").join(b, "id_b").filter(jac >= 0.7).count()
    release_checkpoint_blocks(spark)
    return {"candidates": n_cand, "verified": n_ver}


def corpus_growth_probe(spark, factor: int) -> dict:
    """A LIVE SemanticDedupCorpus whose n grows ×factor (VERDICT r8
    task 4's probe row): ingest the derived corpus replica-by-replica
    (id-ordered slices, each the size of the original corpus) on two
    paths — centroids FROZEN at construction k=8, vs `recluster(k ∝ n)`
    at every corpus doubling (after batches 2, 4, 8). The number that
    diverges when frozen k slides into the quadratic per-cluster
    regime is the FINAL batch's ingest wall (pair work ≈ |state|·|batch|
    / k); recluster totals INCLUDE the recluster calls themselves —
    the path has to win with its maintenance cost counted."""
    from fiat2_spark.operators.dedup import lloyd_centroids, quantize_embeddings
    from fiat2_spark.streaming.maintenance import SemanticDedupCorpus

    e = spark.read.parquet(os.path.join(DST, "embeddings.parquet"))
    out = {}
    for mode in ("frozen", "recluster"):
        first = e.filter(F.col("vec_id") < OFFSET)
        cent = lloyd_centroids(
            quantize_embeddings(first, "vec_id", "embedding"), 8, 2
        )
        corpus = SemanticDedupCorpus(spark, cent)
        times, recluster_s = [], 0.0
        for r in range(factor):
            batch = e.filter(
                (F.col("vec_id") >= r * OFFSET) & (F.col("vec_id") < (r + 1) * OFFSET)
            )
            t0 = time.perf_counter()
            corpus.ingest(batch, "vec_id", "embedding").write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
            if mode == "recluster" and r + 1 in (2, 4, 8):
                t0 = time.perf_counter()
                corpus.recluster(k=8 * (r + 1), iters=2)
                recluster_s += time.perf_counter() - t0
        corpus.close()
        out[mode] = {
            "total_s": round(sum(times) + recluster_s, 2),
            "last_batch_s": round(times[-1], 2),
            "recluster_s": round(recluster_s, 2),
        }
    return out


def run_once(spark, name: str, sf_dir: str) -> tuple[float, int]:
    """(min wall-time of 2 noop-sink reps, output row count). The count
    runs OUTSIDE the timed region (one extra execution) — VERDICT r11
    task 6: a wall-time ratio without the output cardinality hides
    output-growth regimes (the 7.56× dedup row was true-pair growth,
    which the pair count makes self-evident)."""
    from fiat2_spark.session import release_checkpoint_blocks

    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        # sweep localCheckpoint blocks between reps: accumulated blocks
        # from checkpoint-heavy queries (dedup_semantic's membership,
        # the DSIR feature pass) pile up across a long probe session and
        # GC-thrash LATER queries' timings (observed: url_dedup — a tiny
        # partial agg that never changed — drifting 0.56 s → 14.5 s by
        # probe position). run_gate.py sweeps for the same reason.
        release_checkpoint_blocks(spark)
    n = QUERIES[name](spark, sf_dir).count()
    spark.catalog.clearCache()
    release_checkpoint_blocks(spark)
    return best, n


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "SCALING_r05.md")
    queries = sys.argv[3:] or HEAVY
    spark = get_spark(app_name="fiat2-scaling-probe")
    build(spark, factor)
    n_docs = spark.read.parquet(os.path.join(DST, "documents.parquet")).count()
    rows = []
    pair_decomp = None
    growth = None
    for name in queries:
        base, n_base = run_once(spark, name, SRC)
        big, n_big = run_once(spark, name, DST)
        rows.append((name, base, big, big / base, n_base, n_big))
        print(json.dumps({"q": name, "sf0.1": round(base, 2), "sf1": round(big, 2),
                          "ratio": round(big / base, 2),
                          "rows": [n_base, n_big]}), flush=True)
        if name == "dedup_minhash":
            pair_decomp = (minhash_pair_counts(spark, SRC),
                           minhash_pair_counts(spark, DST))
            print(json.dumps({"q": "dedup_minhash_pairs",
                              "sf0.1": pair_decomp[0], "sf1": pair_decomp[1]}),
                  flush=True)
        if name == "dedup_semantic":
            # SemDeDup's pair stage is Σ|cluster|²: with k FROZEN (the
            # registered query pins k=8 to its oracle) a ×factor corpus
            # grows every cluster ×factor and pairs ×factor² — the
            # quadratic regime the paper's k ∝ n rule exists to avoid.
            # Probe the OPERATOR on the scale path too: k scaled with
            # the corpus, cluster size ~constant, pairs ~linear.
            from fiat2_spark.operators.dedup import semantic_dedup

            def run_op(sf_dir, kk):
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
                    semantic_dedup(e, "vec_id", "embedding", k=kk, iters=2).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                    spark.catalog.clearCache()
                return best

            scaled_k = run_op(DST, 8 * factor)
            rows.append((f"{name} (k scaled ×{factor})", base, scaled_k, scaled_k / base,
                         None, None))
            print(json.dumps({"q": f"{name}@k{8 * factor}", "sf0.1": round(base, 2),
                              "sf1": round(scaled_k, 2),
                              "ratio": round(scaled_k / base, 2)}), flush=True)
            growth = corpus_growth_probe(spark, factor)
            print(json.dumps({"q": "semantic_corpus_growth", **growth}), flush=True)
        if name == "substring_dedup_apply":
            # doc-LENGTH axis: same doc count, ×factor tokens per doc
            build_longdocs(spark, factor)
            long_t, long_n = run_once(spark, name, LDST)
            rows.append((f"{name} (×{factor} doc LENGTH)", base, long_t, long_t / base,
                         n_base, long_n))
            print(json.dumps({"q": f"{name}@longdocs", "sf0.1": round(base, 2),
                              "long": round(long_t, 2),
                              "ratio": round(long_t / base, 2)}), flush=True)
    with open(out_md, "w") as fh:
        fh.write(
            f"# {os.path.basename(out_md).removesuffix('.md')} — sf0.1 → ~sf1 wall-time scaling probe\n\n"
            f"Derived corpus: {factor}x documents ({n_docs:,} docs) / embeddings /\n"
            "lineitem / orders via `tools/scaling_probe.py` (deterministic\n"
            "replication; docs near-dup-heavy by construction — ~90 percent sit in\n"
            "a near-dup cluster, the adversarial regime for the dedup family;\n"
            "fact-table orderkeys offset per replica so joins keep referential\n"
            "integrity with constant per-order group sizes while per-dim groups\n"
            "and window partitions grow ~factor). Dim tables unchanged (symlinked\n"
            "sf0.1). local[32], min of 2 reps, noop sink, cache cleared\n"
            "between runs.\n\n"
            f"| query | sf0.1 (s) | ~sf1 (s) | ratio (data x{factor}) | rows (sf0.1 → ~sf1) |\n|---|---|---|---|---|\n"
        )
        for name, base, big, ratio, n_base, n_big in rows:
            rc = f"{n_base:,} → {n_big:,}" if n_base is not None else "—"
            fh.write(f"| {name} | {base:.2f} | {big:.2f} | {ratio:.2f}× | {rc} |\n")
        if pair_decomp is not None:
            p1, pn = pair_decomp
            cr = pn["candidates"] / max(p1["candidates"], 1)
            vr = pn["verified"] / max(p1["verified"], 1)
            fh.write(
                "\n## dedup_minhash pair decomposition\n\n"
                "| scale | LSH candidate pairs | verified (jac ≥ 0.7) pairs |\n"
                "|---|---|---|\n"
                f"| sf0.1 | {p1['candidates']:,} | {p1['verified']:,} |\n"
                f"| ~sf1 (×{factor}) | {pn['candidates']:,} | {pn['verified']:,} |\n"
                f"| growth | {cr:.1f}× | {vr:.1f}× |\n\n"
                "Candidates growing in step with verified pairs means the\n"
                "wall-time ratio reflects TRUE near-dup growth (the replicated\n"
                "corpus inflates real pairs by construction), not band-occupancy\n"
                "overhead; candidates outgrowing verified pairs would instead\n"
                "flag banding that stopped pruning (re-tune bands/rows or add\n"
                "the size-ratio prefilter `ngram_jaccard_pairs` uses).\n"
            )
        if growth is not None:
            fr, rc = growth["frozen"], growth["recluster"]
            fh.write(
                "\n## live SemanticDedupCorpus growth (n ×" + str(factor) + ")\n\n"
                "Replica-sized id-ordered batches ingested into a LIVE corpus;\n"
                "frozen construction-time k=8 vs `recluster(k ∝ n)` at every\n"
                "corpus doubling (recluster wall INCLUDED in its path's total).\n\n"
                "| path | total (s) | final-batch ingest (s) | recluster cost (s) |\n"
                "|---|---|---|---|\n"
                f"| frozen k=8 | {fr['total_s']} | {fr['last_batch_s']} | — |\n"
                f"| recluster k∝n | {rc['total_s']} | {rc['last_batch_s']} | {rc['recluster_s']} |\n\n"
                "The final-batch column is the divergence signal: under frozen k\n"
                "the per-batch pair work grows ~|state|/k linearly with corpus\n"
                "age (quadratic cumulative), while the recluster path holds\n"
                "cluster sizes — and therefore per-batch cost — bounded.\n"
            )
        fh.write(
            "\nInterpretation: a ratio ≲ 12× on a 10× corpus is at-or-below\n"
            "linear once per-query fixed costs (plan/codegen, small-side aggs)\n"
            "are amortized; anything well above would flag super-linear state\n"
            "(band-bucket occupancy, iteration-count growth) for the operator.\n"
        )
    print(f"wrote {out_md}")
    spark.stop()


if __name__ == "__main__":
    main()
