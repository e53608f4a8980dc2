"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract as Arrow-batched Pandas stages.

The container has no image/audio codecs, so the decode step is STUBBED
(`decode_media` raises NotImplementedError unless given the
deterministic fake) — but the Spark-side plumbing is real and tested:
binary payload columns, metadata structs, `mapInPandas` batch iterators
with explicit output schemas, and the partitioning story (binary blobs
are large → keep them out of shuffles; extract features early, carry
ids + features forward, re-join payloads only at the sink).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, checksum bigint, head_hex string"


def to_binary_table(df: DataFrame, id_col: str, payload_col: str, kind: str) -> DataFrame:
    """Wrap a column as an opaque media payload with typed metadata —
    the canonical multimodal table shape: (id, payload: binary,
    meta: struct<kind, n_bytes>)."""
    payload = F.encode(F.col(payload_col), "utf-8") if kind == "text" else F.col(payload_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(kind: str):
    """Real decoders are not available in this container. Gate them so
    the plumbing (schemas, batching) is testable with the fake."""
    if kind in ("image", "audio", "video"):
        raise NotImplementedError(
            f"{kind} decoding requires codec libraries not present in this "
            "environment; use extract_byte_features (deterministic fake) "
            "to exercise the pipeline plumbing."
        )
    return lambda b: b


def extract_byte_features(binary_df: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Deterministic fake 'feature extraction' over binary payloads via
    mapInPandas: per-payload byte count, additive checksum mod 997, and
    head bytes as hex. Arrow-batched — the exact shape a real decoder
    UDF takes (iterator of pandas batches in, schema'd batches out),
    so swapping in PIL/ffmpeg later changes one function body."""

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            # one concatenated buffer + reduceat beats a per-byte Python
            # loop ~30×: the additive checksum is a segmented sum over
            # byte boundaries (measured 4.7 s → <1 s at sf0.1)
            lens = payloads.map(len).to_numpy(dtype="int64")
            sums = np.zeros(len(lens), dtype="int64")
            nonzero = lens > 0
            if nonzero.any():
                # concat only the non-empty payloads: reduceat segment
                # starts then strictly increase and stay in bounds
                buf = np.frombuffer(b"".join(payloads[nonzero]), dtype=np.uint8)
                nz = lens[nonzero]
                starts = np.zeros(len(nz), dtype="int64")
                np.cumsum(nz[:-1], out=starts[1:])
                sums[nonzero] = np.add.reduceat(buf.astype("int64"), starts)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": lens,
                    "checksum": sums % 997,
                    "head_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
                }
            )

    # mapInPandas parallelism = input partition count. Pass n_partitions
    # (e.g. defaultParallelism) when the per-row work is heavy — a real
    # image/audio decode — and the input has few partitions; for cheap
    # extractors the Python-worker fan-out costs more than it saves
    # (measured: 32-way repartition of a 5k-row byte checksum was 10×
    # slower than the single-partition run).
    slim = binary_df.select("doc_id", "payload")
    if n_partitions is not None:
        slim = slim.repartition(n_partitions)
    return slim.mapInPandas(fe, FEATURE_SCHEMA)
