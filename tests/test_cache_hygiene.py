"""Cache-hygiene contract (session.py): structural classification of
resident RDDs, and per-insert retirement of superseded state snapshots
in the long-lived maintenance indexes (streaming/maintenance.py).

The r6 classifier substring-matched the RDD callsite string
('ocalCheckpoint'); the r7 advisor flagged it as build-specific and
spoofable. These tests pin the structural replacement AND the negative
case the gate relies on: a deliberate DataFrame persist MUST classify
as a cache entry (the leak class run_gate asserts to zero)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fiat2_spark.session import (
    cache_entries,
    local_checkpoint_tracked,
    release_blocks,
    release_checkpoint_blocks,
)


def _resident_ids(spark):
    return set(dict(spark.sparkContext._jsc.getPersistentRDDs()).keys())


def test_persist_classifies_as_cache_entry_not_checkpoint(spark):
    """Negative test (VERDICT r6 'what's wrong' #2): a leaked persist
    must trip the gate's cache-hygiene assert — i.e. land in the CACHE
    bucket, not be excused as a checkpoint block."""
    release_checkpoint_blocks(spark)
    base_ckpt, base_cache = cache_entries(spark)
    leaked = spark.range(500).selectExpr("id", "id * 7 as v").persist()
    leaked.count()
    try:
        ckpt, cache = cache_entries(spark)
        assert len(cache) == len(base_cache) + 1, (ckpt, cache)
        assert len(ckpt) == len(base_ckpt)
    finally:
        leaked.unpersist(True)


def test_checkpoint_block_classifies_structurally(spark):
    """localCheckpoint blocks classify via isLocallyCheckpointed (not a
    callsite-string match) and are freed by the sweep."""
    release_checkpoint_blocks(spark)
    _, base_cache = cache_entries(spark)
    ck = spark.range(300).selectExpr("id", "id * 3 as v").localCheckpoint()
    ckpt, cache = cache_entries(spark)
    assert len(ckpt) >= 1
    assert len(cache) == len(base_cache)
    freed = release_checkpoint_blocks(spark)
    assert freed >= 1
    ckpt2, _ = cache_entries(spark)
    assert ckpt2 == []
    del ck


def test_dataframe_unpersist_does_not_free_checkpoint_blocks(spark):
    """The property that forces targeted release by block id: on this
    build DataFrame.unpersist() leaves localCheckpoint blocks resident
    (so a retire path built on it silently leaks — MomentsView's r6
    ingest did exactly that). If a Spark upgrade makes this pass start
    failing, local_checkpoint_tracked/release_blocks can be simplified."""
    release_checkpoint_blocks(spark)
    ck, blocks = local_checkpoint_tracked(spark.range(100).selectExpr("id"))
    assert blocks and blocks <= _resident_ids(spark)
    ck.unpersist(False)
    assert blocks <= _resident_ids(spark), "unpersist freed blocks — simplify!"
    assert release_blocks(spark, blocks) == len(blocks)
    assert not (blocks & _resident_ids(spark))


def test_group_index_insert_retires_superseded_snapshots(spark):
    """GroupIndex (r7 advisor, medium): per insert, exactly the retired
    state snapshot's blocks are freed — repeated inserts hold O(1)
    resident state, and the index stays readable (no missing-block
    errors) without any global sweep."""
    from fiat2_spark.streaming.maintenance import GroupIndex

    release_checkpoint_blocks(spark)
    idx = GroupIndex(["g"], {"n": ("count", F.lit(1)), "s": ("sum", F.col("v"))})
    idx.init(spark.createDataFrame([("a", 1), ("b", 2)], "g string, v long"))
    after_init = _resident_ids(spark)
    for i in range(5):
        idx.insert(spark.createDataFrame([("a", 10 + i)], "g string, v long"))
        assert len(_resident_ids(spark)) == len(after_init), f"insert {i} leaked"
    rows = {r["g"]: (r["n"], r["s"]) for r in idx.read().collect()}
    assert rows == {"a": (6, 1 + 10 + 11 + 12 + 13 + 14), "b": (1, 2)}
    release_blocks(spark, idx._blocks)


def test_moments_view_ingest_retires_superseded_snapshots(spark):
    from fiat2_spark.streaming.maintenance import MomentsView

    release_checkpoint_blocks(spark)
    view = MomentsView(spark, "k", "v")
    baseline = len(_resident_ids(spark))
    for i in range(4):
        view.ingest(spark.createDataFrame([("x", float(i))], "k string, v double"))
        assert len(_resident_ids(spark)) == baseline, f"ingest {i} leaked"
    st = {r["k"]: r["n"] for r in view.state.collect()}
    assert st == {"x": 4}
    release_blocks(spark, view._blocks)
