"""Sources & sinks.

The reference has no file formats or connectors (SURVEY §2.1): data
enters via store locations (ELoc) and leaves via CAssign / the Haskell
demo server's JSON serialization (haskellServer/src/Extracted.hs:
3035-3038 generate_json). This module is the engine's I/O surface:
columnar parquet first (pushdown + pruning), the other Spark formats
behind one dispatcher, JSON record output for server parity, and
bucketed writes — the physical realization of the reference's DictIndex
(a bucketed table IS a persisted hash index: joins/lookups on the
bucket key skip the shuffle).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from fiat2_spark.catalog import TPCH_TABLES

_FORMATS = ("parquet", "orc", "json", "csv")


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", schema=None, **options) -> DataFrame:
    """Read one table. Schema required for json/csv at scale (inference
    is a full extra pass over 100 TB)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (delta/iceberg need jars absent here)")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    **options,
) -> None:
    """Write a table; ``partition_by`` gives write-time partition pruning
    for the columns the reference would bitmap-index (BitmapIndex.v
    intent → directory-level data skipping)."""
    if fmt == "csv":
        options.setdefault("header", "true")
    w = df.write.mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).save(path)


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 32, mode: str = "overwrite"
) -> None:
    """Persisted hash index (DictIndexImpl.v to_idx intent): bucketing by
    the lookup attribute lets every later equi-join/point-lookup on it
    co-locate without a shuffle."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def write_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_ranges: int = 8,
    rowgroup_bytes: int = 65536,
    mode: str = "overwrite",
) -> None:
    """Persisted ZONE-MAP index (the third physical-layout knob after
    partitionBy and bucketBy): range-repartition + sort within
    partitions on the scan attribute, written with small parquet row
    groups, so every row group's min/max footer statistics become a
    tight value interval — a later range/point predicate on
    ``sort_col`` skips whole row groups at the reader, before any
    Spark filtering. The BitmapIndex.v intent for RANGE predicates,
    where directory partitioning (categorical) doesn't apply.
    Verified by scan output-row metrics in test_plans.py."""
    (
        df.repartitionByRange(n_ranges, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .option("parquet.block.size", rowgroup_bytes)
        .parquet(path)
    )


def write_zorder(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    bits_per_dim: int = 8,
    n_ranges: int = 16,
    rowgroup_bytes: int = 32768,
    mode: str = "overwrite",
) -> None:
    """Z-ORDER clustering: multi-dimensional zone maps from ONE sorted
    layout. Each dimension is rank-quantized onto 2^bits_per_dim
    buckets via approxQuantile cut points (rank, not min-max — skewed
    value distributions would otherwise collapse into one bucket), the
    bucket indices are bit-interleaved into a Morton code, and rows are
    range-partitioned + sorted on it. Every row group then covers a
    small HYPER-RECTANGLE of the value space, so range predicates on
    EITHER column prune row groups from the same layout — what
    single-column `write_sorted` cannot give the second column. The
    cut-point collect is 2×2^bits_per_dim scalars; everything else is
    pure expressions. Verified by scan metrics in test_plans.py."""
    from pyspark.sql import functions as F

    z = None
    for col in cols:
        b = 1 << bits_per_dim
        probs = [i / b for i in range(1, b)]
        cuts = sorted(set(df.approxQuantile(col, probs, 0.01)))
        if cuts:
            cut_arr = F.array(*[F.lit(c) for c in cuts])
            idx = F.size(F.filter(cut_arr, lambda c: c < F.col(col).cast("double")))
        else:
            # constant column: every quantile collapses to one value and
            # F.array() would be array<void> (lambda comparison fails
            # analysis) — the dimension carries no information, bucket 0
            idx = F.lit(0)
        dim_off = 0 if z is None else 1
        bits = None
        for i in range(bits_per_dim):
            bit = F.shiftright(idx, i).bitwiseAND(F.lit(1)) * F.lit(
                1 << (2 * i + dim_off)
            )
            bits = bit if bits is None else bits + bit
        z = bits if z is None else z + bits
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_ranges, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .option("parquet.block.size", rowgroup_bytes)
        .parquet(path)
    )


def compact_files(
    spark: SparkSession,
    path: str,
    target_files: int,
    out_path: str | None = None,
) -> int:
    """Small-files compaction — the operational tail of every streaming
    or highly-parallel write: thousands of KB-sized parquet files make
    later scans metadata-bound (one footer read + task per file). Read
    the directory, coalesce to ``target_files`` (narrow — no shuffle;
    partitions merge on the same executors), and rewrite. Returns the
    number of data files written. When ``out_path`` is None the swap is
    two renames (original aside, compacted in) so the dataset path is
    never missing: a crash between them leaves the data at
    ``path + ".old"`` rather than gone. (True atomicity needs a table
    format's metadata commit — Iceberg/Delta — not a filesystem move.)"""
    import shutil
    import tempfile

    df = spark.read.parquet(path)
    dest = out_path or tempfile.mkdtemp(prefix="compact_", dir=os.path.dirname(path))
    df.coalesce(target_files).write.mode("overwrite").parquet(dest)
    if out_path is None:
        old = path.rstrip("/") + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
        os.rename(dest, path)
        shutil.rmtree(old)
        dest = path
    return len([f for f in os.listdir(dest) if f.endswith(".parquet")])


def register_views(spark: SparkSession, sf_dir: str, tables=TPCH_TABLES) -> None:
    """Register the testdata tables as temp views for spark.sql use."""
    from fiat2_spark.workloads.util import tbl

    for t in tables:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            tbl(spark, sf_dir, t).createOrReplaceTempView(t)


def to_json_records(df: DataFrame, n: int | None = None) -> list[str]:
    """JSON record serialization — the extracted server's generate_json
    output shape (Extracted.hs:3035-3038): one JSON object per row.
    Driver-side by design (it's the HTTP boundary, small results)."""
    it = df.toJSON().toLocalIterator()
    out = []
    for i, rec in enumerate(it):
        if n is not None and i >= n:
            break
        out.append(rec)
    return out
