"""Structured Streaming surface.

The reference has no streaming operators (SURVEY §2.10); its
query-in-a-loop + insert pattern (Ex_Sum.v:30) is incremental view
maintenance, which maps to update-mode stateful aggregation. This
module provides the streaming realizations; `maintenance.py` provides
the batch/driver realization of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_agg(events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window count/sum per event_type. Works identically on a
    batch DataFrame (F.window is a plain expression) and a streaming one
    (where the watermark bounds state for late data)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )


def stream_from_parquet(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream over a parquet directory — the local smoke
    harness for streaming queries (prod: Kafka/Kinesis source, same
    downstream plan)."""
    return spark.readStream.format("parquet").schema(schema).load(path)


def run_streaming_window_smoke(spark: SparkSession, parquet_path: str) -> list:
    """Drive the windowed aggregation as a real streaming query against
    the events parquet via the memory sink; returns the collected rows.
    `processAllAvailable` makes it synchronous for tests."""
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(parquet_path)  # ts arrives as long nanos
    # FileStreamSource wants a directory; stage the file via symlink
    stage = tempfile.mkdtemp(prefix="fiat2_stream_")
    os.symlink(os.path.abspath(parquet_path), os.path.join(stage, "part-0.parquet"))
    stream = stream_from_parquet(spark, stage, static.schema)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
        )
    agg = windowed_agg(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("fiat2_stream_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql("SELECT * FROM fiat2_stream_smoke").collect()
    finally:
        q.stop()


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per-user session ids via gap detection — lag(ts)
    + cumulative sum over the gap indicator (the batch analog of
    streaming session_window). Returns per-session bounds and counts."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.col("ts").cast("long")
        - F.lag(F.col("ts").cast("long"), 1, None).over(w)
    )
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    with_id = events.withColumn(
        "session_id", F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return with_id.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
