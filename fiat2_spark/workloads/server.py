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
    n = tbl(spark, sf_dir, "nation")
    return n.filter(F.col("n_nationkey") < 10).select(
        F.col("n_nationkey").cast("long").alias("artist_id"),
        F.col("n_name").alias("name"),
    )


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
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 10)
    return s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
        F.col("s_suppkey").alias("album_id"),
        F.col("s_name").alias("title"),
        F.col("n_name").alias("artist"),
    )
