"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded via Arrow-batched ``mapInPandas``.

The real decode (PIL / torchaudio / ffmpeg frame sampling) is NOT
available in this container, so ``decode_stub`` produces a
DETERMINISTIC fake: features derived from sha256(payload).  The
Spark-side plumbing — binary column, metadata struct, mapInPandas batch
shape, output schema — is real and is what matters for the engine.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
payload bytes never pass through a shuffle — decode happens map-side on
the scan partitioning, and only the (small) extracted features flow
downstream.  Partition sizing: keep ``spark.sql.files.maxPartitionBytes``
low enough that a batch of payloads fits executor memory (binary columns
dominate row width).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, byte_len int, content_sha string, "
    "width int, height int, n_frames int, sample_rate int"
)


def with_media_payload(docs: DataFrame) -> DataFrame:
    """Attach a fake binary payload + typed metadata to the documents
    table (stands in for an image/audio/video blob column)."""
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        "doc_id",
        media_type.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").cast("int").alias("n_chars"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[str, int, int, int, int]:
    """Deterministic stand-in for the real decoder.

    Real implementation would be:
        image -> PIL.Image.open(io.BytesIO(payload)).size
        audio -> torchaudio.load(...)  (sample_rate, frames)
        video -> ffmpeg frame sampling
    none of which exist in this container.
    """
    sha = hashlib.sha256(payload).hexdigest()
    a = int(sha[:4], 16)
    b = int(sha[4:8], 16)
    if media_type == "image":
        return sha, 64 + a % 1024, 64 + b % 1024, 1, 0
    if media_type == "audio":
        return sha, 0, 0, 1 + a % 1000, 8000 + (b % 5) * 8000
    return sha, 64 + a % 1024, 64 + b % 1024, 1 + b % 300, 0


def decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: payload bytes → extracted features."""
    for pdf in batches:
        decoded = [
            _fake_decode(bytes(p), m)
            for p, m in zip(pdf["payload"], pdf["media_type"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_type": pdf["media_type"],
                "byte_len": [len(bytes(p)) for p in pdf["payload"]],
                "content_sha": [d[0] for d in decoded],
                "width": [d[1] for d in decoded],
                "height": [d[2] for d in decoded],
                "n_frames": [d[3] for d in decoded],
                "sample_rate": [d[4] for d in decoded],
            }
        )


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode of the payload column."""
    return media.mapInPandas(decode_stub, schema=DECODED_SCHEMA)
