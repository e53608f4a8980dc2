"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the standard near-dup stack for training-data
pipelines, built Spark-first.

Scale design (the part that matters at 100 TB):

* Exact dedup is a hash aggregate — partial dedup map-side, then one
  shuffle of distinct keys.
* MinHash/LSH shuffles **band buckets** (a few short strings per doc),
  never document pairs: candidate generation is a self-equi-join on
  (band_idx, band_hash), so cost tracks the number of *colliding* pairs,
  not n². Signatures are md5-based and engine-portable (the DuckDB
  oracle computes the identical signature).
* SimHash banding splits the 16-bit signature into 4 nibbles; by
  pigeonhole any pair within Hamming distance 3 shares ≥ 1 intact
  nibble, so the banded join is **lossless** for distance ≤ 3 — the
  oracle brute-forces all pairs and must agree exactly.
* Embedding near-dup: exact mode is a blocked self-join (for oracle
  parity); the scale path is random-hyperplane LSH (similarity.py).

No Python UDFs anywhere — signatures, bands, and verification are
Catalyst expressions (md5 / transform / aggregate / array ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fiat2_spark.operators.text import tokens


# -- exact ------------------------------------------------------------------

def exact_dedup(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """Keep the lowest-id row per content key (hash-groupBy dedup)."""
    return (
        df.select(key.alias("dedup_key"), F.col(id_col))
        .groupBy("dedup_key")
        .agg(F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
    )


# -- MinHash + LSH ----------------------------------------------------------

def shingles(toks: Column, n: int = 1) -> Column:
    """Word n-gram shingle *set* (distinct). n=1 → token set."""
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.array_distinct(grams)


def minhash_signature(sh: Column, n_hashes: int = 8) -> Column:
    """MinHash signature as an array of n lexicographic-min md5 digests,
    one per seeded hash family member: sig_i = min_{s∈shingles}
    md5(i ‖ '#' ‖ s). String-min avoids any hex→int conversion and is
    identical across engines."""
    def seeded(i: int):
        return lambda s: F.md5(F.concat(F.lit(f"{i}#"), s))

    sigs = [F.array_min(F.transform(sh, seeded(i))) for i in range(n_hashes)]
    return F.array(*sigs)


def minhash_bands(sig: Column, n_bands: int, rows_per_band: int) -> Column:
    """Band digests: array of (band_idx, band_hash) structs. Docs agreeing
    on any band become candidates."""
    bands = []
    for b in range(n_bands):
        lo = b * rows_per_band
        segment = F.concat_ws("|", *[sig.getItem(lo + r) for r in range(rows_per_band)])
        bands.append(F.struct(F.lit(b).alias("band_idx"), F.md5(segment).alias("band_hash")))
    return F.array(*bands)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard on two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, 0.0).otherwise(inter / union)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    n_bands: int = 4,
    shingle_n: int = 1,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact Jaccard verification.

    Returns (id_a, id_b, jac) with id_a < id_b, jac >= threshold, jac
    rounded to 6 decimals. The banded candidate join shuffles
    n_bands short digests per doc; only colliding candidates pay the
    exact verification (which re-joins the shingle sets by id).
    """
    rows = n_hashes // n_bands
    toks = tokens(F.col(text_col))
    sh = df.select(
        F.col(id_col).alias("doc"),
        shingles(toks, shingle_n).alias("sh"),
    ).filter(F.size(F.col("sh")) > 0)
    sh = sh.persist()

    banded = sh.select(
        "doc",
        F.explode(minhash_bands(minhash_signature(F.col("sh"), n_hashes), n_bands, rows)).alias("b"),
    ).select("doc", F.col("b.band_idx").alias("band_idx"), F.col("b.band_hash").alias("band_hash"))

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

    a = sh.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jac"))
        .filter(F.col("jac") >= threshold)
    )
    return verified


# -- SimHash ----------------------------------------------------------------

_HIGH_HEX = ["8", "9", "a", "b", "c", "d", "e", "f"]


def simhash16(toks: Column) -> Column:
    """16-bit SimHash: bit b is the sign of the vote sum over tokens of
    ±1 according to the high bit of hex digit b of md5(token). Token
    multiplicity counts (it's a weighted vote)."""
    def voter(b: int):
        return lambda acc, t: acc + F.when(
            F.substring(F.md5(t), b + 1, 1).isin(*_HIGH_HEX), 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for b in range(16):
        vote = F.aggregate(toks, F.lit(0).cast("long"), voter(b))
        out = out + F.when(vote > 0, F.lit(1 << b)).otherwise(0)
    return out


def simhash_dedup_pairs(df: DataFrame, id_col: str, text_col: str, max_dist: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_dist, found via
    nibble banding: 16 bits → 4 nibbles; distance ≤ 3 pairs share ≥ 1
    intact nibble (pigeonhole) so the banded equi-join is lossless.
    Returns (id_a, id_b, dist)."""
    assert max_dist <= 3, "nibble banding is lossless only for dist <= 3"
    sh = df.select(F.col(id_col).alias("doc"), simhash16(tokens(F.col(text_col))).alias("sh")).persist()
    nib = sh.select(
        "doc",
        "sh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("nib_idx"),
                    F.shiftright(F.col("sh"), 4 * i).bitwiseAND(F.lit(15)).alias("nib_val"),
                )
                for i in range(4)
            ])
        ).alias("nb"),
    ).select("doc", "sh", F.col("nb.nib_idx").alias("nib_idx"), F.col("nb.nib_val").alias("nib_val"))

    l, r = nib.alias("l"), nib.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.nib_idx") == F.col("r.nib_idx"))
            & (F.col("l.nib_val") == F.col("r.nib_val"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("id_a"),
            F.col("r.doc").alias("id_b"),
            F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh"))).alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )
    return cand


# -- n-gram Jaccard (direct) ------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 1,
    threshold: float = 0.9,
    block_col: str | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold, optionally blocked on a
    column (language, length bucket) to bound the quadratic join. The
    un-blocked form is the oracle-checkable baseline; production use
    should block or prefer minhash_dedup_pairs."""
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc"),
        shingles(toks, shingle_n).alias("sh"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    l, r = base.alias("l"), base.alias("r")
    cond = F.col("l.doc") < F.col("r.doc")
    if block_col:
        cond = cond & (F.col("l.blk") == F.col("r.blk"))
    return (
        l.join(r, cond)
        .select(
            F.col("l.doc").alias("id_a"),
            F.col("r.doc").alias("id_b"),
            F.round(jaccard(F.col("l.sh"), F.col("r.sh")), 6).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


# -- embedding cosine near-dup ---------------------------------------------

def embedding_dedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
) -> DataFrame:
    """Exact cosine near-dup pairs (id_a < id_b, cos >= threshold).
    This is the O(n²) baseline the LSH path (similarity.ann_lsh) prunes;
    at 100 TB run it only inside LSH buckets."""
    from fiat2_spark.operators.similarity import cosine

    base = df.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("v"))
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(r, F.col("l.doc") < F.col("r.doc"))
        .select(
            F.col("l.doc").alias("id_a"),
            F.col("r.doc").alias("id_b"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
