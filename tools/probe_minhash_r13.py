#!/usr/bin/env python
"""Minhash-internals decomposition probe (r13, VERDICT item 4): times
each stage of minhash_candidates separately — the shingle checkpoint,
the signature/band checkpoint in its current per-seed lane-min fold
form vs a posexplode+groupBy alternative — and the downstream
candidate+verify execution, for both tokenizers. Same-session
best-of-N; measurement only, no engine change."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fiat2_spark.session import get_spark, release_checkpoint_blocks
from fiat2_spark.operators import dedup as D
from fiat2_spark.operators import text as TX
from fiat2_spark.operators.dedup import (
    MINHASH_LANES, cpu_partitions, minhash_bands, seeded_digests, shingles,
)
from fiat2_spark.workloads.pipeline import multilingual_documents, tbl


def timeit(fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r13-minhash-probe")
    tbl(spark, sf_dir, "documents").count()  # warm

    n_hashes, n_bands, shingle_n = 16, 4, 3
    rows = n_hashes // n_bands
    n_seeds = -(-n_hashes // MINHASH_LANES)

    for label, df, tokenizer in (
        ("ascii", tbl(spark, sf_dir, "documents"), TX.tokens),
        ("unicode", multilingual_documents(spark, sf_dir), TX.tokens_unicode),
    ):
        toks = tokenizer(F.col("text"))
        base = df.repartition(cpu_partitions(df)).select(
            F.col("doc_id").alias("doc"),
            shingles(toks, shingle_n).alias("sh"),
        ).filter(F.size(F.col("sh")) > 0)

        def mk_sh():
            sh = base.localCheckpoint()
            return sh

        t_sh = timeit(lambda: (release_checkpoint_blocks(spark), mk_sh()))
        sh = mk_sh()

        # current form: per-seed lane-min fold
        def lane_mins(digests):
            init = F.struct(*[F.lit("zzzzzzzz").alias(f"m{j}") for j in range(MINHASH_LANES)])
            return F.aggregate(
                digests, init,
                lambda acc, h: F.struct(*[
                    F.least(acc[f"m{j}"], F.substring(h, 8 * j + 1, 8)).alias(f"m{j}")
                    for j in range(MINHASH_LANES)
                ]),
            )

        def banded_fold():
            hashed = sh.select(
                "doc",
                *[lane_mins(seeded_digests(F.col("sh"), d)).alias(f"s{d}") for d in range(n_seeds)],
            )
            sigs = [F.col(f"s{k // MINHASH_LANES}")[f"m{k % MINHASH_LANES}"] for k in range(n_hashes)]
            return hashed.select(
                "doc", F.explode(minhash_bands(F.array(*sigs), n_bands, rows)).alias("b"),
            ).select("doc", F.col("b.band_idx").alias("band_idx"), F.col("b.band_hash").alias("band_hash"))

        # alternative: posexplode shingles to rows, codegen'd md5 per
        # (row, seed), partial-agg min per lane, groupBy doc
        def banded_explode():
            ex = sh.select("doc", F.explode("sh").alias("s"))
            proj = ex.select(
                "doc",
                *[F.md5(F.concat(F.lit(f"{d}#"), F.col("s"))).alias(f"h{d}") for d in range(n_seeds)],
            )
            aggs = []
            for d in range(n_seeds):
                for j in range(MINHASH_LANES):
                    aggs.append(
                        F.min(F.substring(F.col(f"h{d}"), 8 * j + 1, 8)).alias(f"sig{d*MINHASH_LANES+j}")
                    )
            hashed = proj.groupBy("doc").agg(*aggs)
            sigs = [F.col(f"sig{k}") for k in range(n_hashes)]
            return hashed.select(
                "doc", F.explode(minhash_bands(F.array(*sigs), n_bands, rows)).alias("b"),
            ).select("doc", F.col("b.band_idx").alias("band_idx"), F.col("b.band_hash").alias("band_hash"))

        t_fold = timeit(lambda: banded_fold().localCheckpoint())
        t_expl = timeit(lambda: banded_explode().localCheckpoint())

        # sanity: identical band digests either way
        a = banded_fold().orderBy("doc", "band_idx").collect()
        b = banded_explode().orderBy("doc", "band_idx").collect()
        same = a == b

        banded = banded_fold().localCheckpoint()

        def cand_verify():
            left = banded.alias("l")
            right = banded.alias("r")
            cand = (
                left.join(
                    right,
                    (F.col("l.band_idx") == F.col("r.band_idx"))
                    & (F.col("l.band_hash") == F.col("r.band_hash"))
                    & (F.col("l.doc") < F.col("r.doc")),
                )
                .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
                .distinct()
            )
            av = sh.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
            bv = sh.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
            out = (
                cand.join(av, "id_a").join(bv, "id_b")
                .select("id_a", "id_b", F.round(D.jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jac"))
                .filter(F.col("jac") >= 0.7)
            )
            out.write.format("noop").mode("overwrite").save()

        t_cv = timeit(cand_verify)
        print(f"{label:8s} sh_ckpt {t_sh:6.3f}  banded_fold {t_fold:6.3f}  "
              f"banded_explode {t_expl:6.3f}  cand+verify {t_cv:6.3f}  identical={same}")
        release_checkpoint_blocks(spark)
    spark.stop()


if __name__ == "__main__":
    main()
