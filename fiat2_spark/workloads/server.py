"""REST-server parity workloads — the two queries the reference's
extracted Haskell server exposes (haskellServer/src/Lib.hs:28-33,
Extracted.hs:3035-3074): artist filter by id, album⋈artist FK join.
Artist/album stand-ins derive from nation/supplier; the JSON boundary
(generate_json) is `sources.io.to_json_records`, unit-tested separately.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fiat2_spark.workloads.util import tbl

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return reg


def artist_less_than(spark, sf_dir, n: int):
    """The :n-parameterized body behind GET /get_artist_less_than/:n —
    shared by the registered parity query (n=10) and the HTTP shim
    (`fiat2_spark.serving`)."""
    nat = tbl(spark, sf_dir, "nation")
    return nat.filter(F.col("n_nationkey") < n).select(
        F.col("n_nationkey").cast("long").alias("artist_id"),
        F.col("n_name").alias("name"),
    )


def album_and_artist(spark, sf_dir, n: int):
    """The :n-parameterized body behind GET /get_album_and_artist/:n."""
    s = tbl(spark, sf_dir, "supplier")
    nat = tbl(spark, sf_dir, "nation").filter(F.col("n_nationkey") < n)
    return s.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")).select(
        F.col("s_suppkey").alias("album_id"),
        F.col("s_name").alias("title"),
        F.col("n_name").alias("artist"),
    )


@q(
    "server_artist_filter",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS artist_id, n_name AS name
    FROM nation WHERE n_nationkey < 10
    """,
)
def server_artist_filter(spark, sf_dir):
    """GET /get_artist_less_than/:n (Lib.hs:28-30): filter artists by
    id < n — exported_get_artist (Extracted.hs:3035-3048)."""
    return artist_less_than(spark, sf_dir, 10)


@q(
    "server_album_join",
    """
    SELECT s_suppkey AS album_id, s_name AS title, n_name AS artist
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_nationkey < 10
    """,
)
def server_album_join(spark, sf_dir):
    """GET /get_album_and_artist/:n: albums⋈artists on artist_id
    (exported_get_album_and_artist, Extracted.hs:3050-3074)."""
    return album_and_artist(spark, sf_dir, 10)
