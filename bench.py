#!/usr/bin/env python
"""Benchmark harness: runs the headline workloads at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan build + execution); results are
drained with a count-style action so the driver-side collect cost of huge
outputs doesn't dominate what is meant to measure engine throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fiat2_spark.session import get_spark
from fiat2_spark.workloads import QUERIES

HEADLINE = [
    "groupby_agg",        # TPC-H Q1 shape: scan + partial/final agg
    "join_fk",            # broadcast FK join
    "join_three_way",     # multi-join + pushed filter
    "filter_scan",        # pushdown scan
    "semi_join",          # existence join
    "anti_join",          # anti join
    "set_of_distinct",    # dedup aggregate
    "triangle",           # triple self-join
    "window_rownum",      # window functions
    "top_k",              # TakeOrderedAndProject
    "coq_div_mod",        # scalar semantics layer
    "proj_compute",       # computed projection
    "dsl_employee_join",  # fiat2 AST -> compiled join plan
    "dedup_minhash",      # MinHash+LSH near-dup
    "dedup_simhash",      # SimHash nibble-banded near-dup
    "dedup_embedding",    # LSH-bucketed cosine near-dup pairs
    "ann_bruteforce",     # exact cosine top-k
    "ann_lsh",            # LSH-bucketed ANN
    "ann_ivf",            # IVF inverted-list ANN
    "text_quality",       # text scoring (pure Catalyst)
    "dedup_exact",        # fingerprint hash-groupBy
    "stream_window_agg",  # tumbling-window aggregation
    "sessionize",         # gap-based sessionization
    "multimodal_bytes",   # Arrow-batched pandas feature extraction
    "survey_join",        # hyphenated-field join (Ex_Survey)
    "proj_feed_pipeline", # projection-feed + sum/min (PipelineEx)
    "dict_fold",          # EDictFold over sorted entries
    "dsl_orders_agg",     # DSL fold -> lifted agg plan
    "text_fingerprint",   # md5 + rolling hash
    "asof_join",          # union+window as-of join
    "range_join_binned",  # binned interval join
    "json_extract",       # JVM-side JSON field extraction
    "rollup_multires",    # grouping-sets rollup
    "pipeline_e2e",       # composed prep pipeline
    "sample_strata",      # deterministic md5-threshold sampling (scan-side)
    "vocab_topn",         # explode + partial-agg word count, top-k
    "dedup_clusters",     # connected components over near-dup pairs
    "dedup_editdist",     # length-blocked prefix edit distance
    "stream_stream_join", # watermarked interval join (batch form)
    "window_frames",      # lag/lead + ROWS-frame moving average
    "tpch_q3_shape",      # composed flagship: pushdown+broadcast+agg+topk
    # round-4 additions
    "grouped_rownum_scalable",      # per-group numbering, no 5-task window
    "grouped_rank_family_scalable", # full rank family over quantile buckets
    "text_langid",                  # stopword argmax, 10 languages
    "text_langid_trigram",          # trigram profiles via broadcast relation
    "tpch_q18_shape",               # HAVING-filtered agg feeding joins + top-k
    "agg_reuse",                    # one materialized agg, two consumers
    "pack_sequences",               # scalable prefix sum → context packing
    "decontaminate",                # 3-gram overlap vs broadcast benchmark set
    "text_repetition",              # Gopher repetition signals, tagged n-gram explode
    "sample_mixture",               # domain rebalancing, broadcast count agg
    "dedup_incremental_batch",      # batch-vs-corpus anti-join delta dedup
    "embedding_centroids",          # IVF-training means, explode + partial agg
    "profile_columns",              # one-scan ANALYZE stats, Expand multi-distinct
    "upsert_keyed",                 # MERGE via single full outer join
    "group_concat_scalable",        # ordered LISTAGG, no window operator
    "text_redact_pii",              # ordered-rule PII masking, map-only
    "span_dedup",                   # C4-style duplicated-span removal
    "chunk_sliding",                # RAG chunker, zero-shuffle generate
    "bm25_retrieval",               # lexical retrieval, broadcast stats
    "embedding_quantize",           # SQ8 int8 quantizer, map-only
    "stratified_split",             # md5 train/val/test assignment
    "pagerank3",                    # iterative joins, checkpointed state
    "tpch_q5_shape",                # six-table join, broadcast dim chain
    "tpch_q14_shape",               # conditional aggregation ratio
    "funnel_conversion",            # two-step event funnel, user-keyed aggs
    "retention_cohorts",            # cohort retention matrix, no windows
    "anomaly_zscore",               # one-pass moments, broadcast scoring
    "gapfill_daily",                # time-series densification, in-row grid
    "length_histogram",             # corpus length distribution
    "tpch_q1_shape",                # scan-heavy pricing summary, 8 aggs
    "tpch_q10_shape",               # returned-item top-20, AQE fact join
    "tpch_q19_shape",               # disjunctive pushdown (OR-of-ANDs)
    "tpch_q16_shape",               # distinct-count agg + broadcast anti
    "tpch_q22_shape",               # global-avg threshold + anti join
    "dpp_partitioned_join",         # dynamic partition pruning via dim join
    "bloom_pruned_join",            # runtime bloom semi-join reduction
    "dedup_fuzzy_apply",            # pairs -> components -> dedup'd corpus
    "kmeans_lloyd",                 # declarative iterative training loop
    "tpch_q4_shape",                # correlated EXISTS as semi join
    "tpch_q21_shape",               # semi + anti correlated self-joins
    "window_nav",                   # first/last/nth_value navigation
    "zonemap_range_scan",           # sorted-layout row-group skipping
    "tpch_q9_shape",                # five-table star join profit rollup
    "bfs_recursive_cte",            # engine-run WITH RECURSIVE fixpoint
    "tpch_q8_shape",                # per-group share-of-total ratio
    "tpch_q13_shape",               # count-of-counts distribution
    "tpch_q17_shape",               # below-group-average correlated filter
    "tpch_q7_shape",                # dual-role dimension nation pairs
    # round-5 additions
    "tpch_q6_shape",                # purest pushdown probe, single stage
    "tpch_q15_shape",               # revenue view reused twice + scalar max
    "mad_scalable",                 # JVM-only MAD via two percentile passes
    "quality_filter_apply",         # applied C4/Gopher corpus gate
    "knn_label_vote",               # kNN label-vote embedding eval
    "dsl_comprehension",            # Notations.v sugar -> theta-join plan
    "asof_tolerance_join",          # staleness-bounded as-of, post-predicate
    "ewma_user_value",              # exact-fold EWMA, per-entity sequential
    "hybrid_rrf_retrieval",         # BM25 + cosine reciprocal-rank fusion
    "rolling_7day_revenue",         # time-interval RANGE frame per customer
    # round-6 additions
    "dsl_auto_index",               # OptimizeAnno auto index selection, O(1) loop
    "multimodal_wav_real",          # real RIFF/WAVE parse + windowed RMS
    "multimodal_ppm_real",          # real PPM parse + channel statistics
    "tfidf_retrieval",              # classical TF-IDF ranking, hits-only shuffle
    # round-7 additions
    "substring_dedup",              # arbitrary-offset exact-substring dedup (k-gram anchors)
    "dsl_auto_index_join",          # auto-indexed lookup under a comprehension → broadcast join
    "dsl_auto_index_dist",          # distributed dict index above FOLD_COLLECT_LIMIT
    "substring_dedup_apply",        # cleaned-corpus output, ordered reassembly
    "hard_negatives",               # label-mismatch cosine top-k mining
    "shuffle_shards",               # deterministic global shuffle + sharding
    # round-8 additions
    "dedup_semantic",               # SemDeDup: cluster + within-cluster cosine prune
    "dsir_select",                  # DSIR hashed-ngram importance scoring, hard top-k
    "dsir_resample",                # DSIR Gumbel top-k resampling
    # round-9 additions
    "perplexity_filter",            # CCNet bigram-LM quality gate, broadcast LM tables
    "domain_filter",                # C4/RefinedWeb host blocklist + per-domain cap
    "url_dedup",                    # canonical-URL exact dedup, scan-side normalize
    "decontaminate_semantic",       # embedding-space eval decontamination
    "boilerplate_dedup",            # CCNet/RefinedWeb corpus-frequent segment removal
    "gopher_quality",               # Gopher per-rule quality table, one scan
    "quality_classifier",           # fastText-style NB keep/drop classifier
    "budget_select",                # token-budget greedy fill, bucketed prefix sum
    "doremi_reweight",              # DoReMi Group-DRO domain mixture step
    "bpe_pair_counts",              # BPE first-iteration pair counts
    "bpe_merges",                   # BPE 8-merge learner, vocab-sized iterations
    "bpe_encode",                   # apply_bpe: chained-replace vocab, per-doc counts
    # round-10 additions
    "bpe_encode_ids",               # order-preserving encode: real token-ID sequences
    "pipeline_tokenize_pack",       # learn -> encode_ids -> 512-token context packing
    "doremi_trajectory",            # Algorithm 1: T rounds, trajectory-averaged mixture
    "text_unicode_pipeline",        # \p{L}\p{N} tokenizer contract: langid + BPE composed
    "length_bucket_batches",        # padded-batch construction by length band
    # round-11 additions
    "unicode_corpus_tokens",        # corpus-scale unicode tokenize, map-only
    "perplexity_filter_unicode",    # LM gate under tokens_unicode, multilingual fixture
    "ccnet_bucket_assign",          # per-language perplexity terciles (head/middle/tail)
    "dedup_minhash_unicode",        # multilingual MinHash+LSH over the fixture
    # round-12 additions
    "langid_multiscript",           # script ID + transliterated-table language ID
    "cjk_segment_tokens",           # no-space-script contract + per-codepoint fallback
    "lm_stupid_backoff",            # trigram LM, full multi-order stupid backoff
]


def control_query_sec(spark, reps: int = 5) -> float:
    """Host-regime calibration (VERDICT r9 #2: identical code measured
    per-query swings up to 5× between driver runs — ±25% on control
    geomeans — purely from host oscillation): a FIXED, registry- and
    data-independent job — range → codegen'd projection → hash-shuffle
    aggregate → 1-row total — timed ``reps`` times, median reported.
    Embedded in the bench artifact as ``control_sec`` (pre/post the
    suite), so a reader comparing two rounds can divide out the host
    regime instead of mistaking it for an engine change
    (tools/compare_bench.py prints the normalized ratio when both
    artifacts carry it)."""
    from pyspark.sql import functions as F

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select((F.col("id") % 9973).alias("k"), (F.col("id") % 7).alias("v"))
            .groupBy("k").agg(F.sum("v").alias("s"))
            .agg(F.sum("s").alias("t"))
            .collect()
        )
        times.append(time.perf_counter() - t0)
    return round(sorted(times)[len(times) // 2], 3)


def control_scan_sec(spark, sf_dir: str, reps: int = 5) -> float:
    """SCAN-BOUND host-regime calibration (VERDICT r11 #2: the CPU-only
    control is range-fed — pure codegen + a 9,973-key shuffle, no
    parquet scan, no page-cache sensitivity — so IO-regime swings,
    which drove most of the observed same-code oscillation, passed
    through unnormalized): a FIXED wide aggregate over the lineitem
    parquet — four columns decoded end to end, a 4-group hash agg, a
    1-row answer — timed ``reps`` times, median reported. Together the
    two controls factor the host regime into its CPU and IO components;
    tools/compare_bench.py normalizes round-over-round totals by the
    geometric-mean blend when both artifacts carry both."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        (
            li.groupBy("l_returnflag")
            .agg(
                F.sum("l_quantity").alias("q"),
                F.sum("l_extendedprice").alias("p"),
                F.sum("l_discount").alias("d"),
            )
            .agg(F.count(F.lit(1)).alias("n"), F.sum("q").alias("tq"))
            .collect()
        )
        times.append(time.perf_counter() - t0)
    return round(sorted(times)[len(times) // 2], 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fiat2-spark-bench")
    # warm the JVM + parquet footers once
    QUERIES["join_fk"](spark, sf_dir).count()
    control_pre = control_query_sec(spark)
    scan_pre = control_scan_sec(spark, sf_dir)

    # Each query is timed SPARK_GRAFT_BENCH_REPS times (default 2) and the
    # min is reported: the first execution carries one-off Janino/codegen
    # compilation of the query's generated classes (hundreds of ms to
    # seconds of jitter unrelated to engine throughput); the min is the
    # steady-state cost a warm cluster pays per run.
    # (3, not 2: the multi-second dedup family shows first-rep outliers
    # of 2-3x — measured 6.9s then 2.5/2.6/2.3/2.3 back-to-back — so a
    # min-of-2 can still land on a warmup pair; the third rep makes the
    # min robust)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # Sub-second queries are the noise movers (r5/r6 both measured
    # byte-unchanged sub-second queries swinging 1.4-1.7x round-over-
    # round): at <1s absolutes, one GC pause or codegen hiccup IS the
    # measurement. Pin them to min-of-5 — the extra reps cost little
    # exactly where they're needed.
    subsec_reps = int(os.environ.get("SPARK_GRAFT_BENCH_SUBSEC_REPS", "5"))
    timings: dict[str, float] = {}
    from fiat2_spark.session import release_checkpoint_blocks

    for name in HEADLINE:
        if name not in QUERIES:
            continue
        best = None
        done = 0
        while True:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
            done += 1
            # operators that persist intermediates (LSH signatures) must
            # not hold executor memory against the next measurement, and
            # checkpoint blocks from shared-intermediate queries must not
            # accumulate across the 100-query run
            spark.catalog.clearCache()
            release_checkpoint_blocks(spark)
            target = subsec_reps if best < 1.0 else reps
            if done >= target:
                break
        timings[name] = round(best, 3)

    control_post = control_query_sec(spark)
    scan_post = control_scan_sec(spark, sf_dir)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    summary = {
        "metric": "headline_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # host-regime calibration: the same two fixed control jobs (CPU-
        # bound range agg; scan-bound lineitem agg) before and after the
        # suite; each *_sec is the pre/post mean. control_sec stays the
        # CPU control under its historical name so older artifacts remain
        # comparable; compare_bench normalizes by the cpu×scan blend when
        # both sides carry both.
        "control_sec": round((control_pre + control_post) / 2, 3),
        "control_pre": control_pre,
        "control_post": control_post,
        "control_scan_sec": round((scan_pre + scan_post) / 2, 3),
        "control_scan_pre": scan_pre,
        "control_scan_post": scan_post,
    }
    # Full detail first (one JSON line + a committed file), then a compact
    # summary as the FINAL stdout line: the driver records only a bounded
    # tail of output, and with 90+ queries the full dict alone exceeds
    # that window (BENCH_r04 `parsed: null`). The last line must stay
    # short enough (~1.5 KB) that the tail-parse always lands, so its
    # "queries" keeps only the slowest entries that fit the budget.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_detail.json")
    with open(detail_path, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(json.dumps(summary, separators=(",", ":")))
    print(compact_summary(summary))
    spark.stop()


def compact_summary(summary: dict, budget: int = 1400) -> str:
    """The FINAL stdout line: a budget-bounded JSON summary whose
    "queries" keeps only the slowest entries that fit, so the driver's
    bounded tail-capture always lands a parseable object (BENCH_r04's
    `parsed: null` came from a full per-query dict overflowing the tail
    window). Contract pinned in tests/test_contract.py."""
    timings = summary["queries"]
    compact = dict(summary)
    compact["n_queries"] = len(timings)
    compact["detail"] = "bench_detail.json"
    # r13 (VERDICT r12 #7): a query absent from the kept tail is NOT
    # absent from the run — it ran fast and fell below the cutoff (the
    # r12 PERF diff misread 12 such queries, several of them that
    # round's best wins, as "dropped_from_bench"). Publish the dropped
    # remainder explicitly: n_below_cutoff + their summed seconds, so
    # value == sum(queries.values()) + others_total always holds and a
    # comparer can tell "fast" from "gone" without the detail file.
    # Seed with the worst-case value so the budget loop accounts for
    # the key's width.
    compact["others_total"] = round(sum(timings.values()), 3)
    compact["n_below_cutoff"] = len(timings)
    kept: dict[str, float] = {}
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        kept[name] = sec
        compact["queries"] = kept
        if len(json.dumps(compact, separators=(",", ":"))) > budget:
            kept.pop(name)
            break
    compact["queries"] = kept
    compact["others_total"] = round(
        sum(sec for name, sec in timings.items() if name not in kept), 3
    )
    compact["n_below_cutoff"] = len(timings) - len(kept)
    return json.dumps(compact, separators=(",", ":"))


if __name__ == "__main__":
    main()
