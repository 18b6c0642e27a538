"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing here is real and tested — schema, partition
behavior, UDF signature, batch shape. The actual codec step (JPEG
decode, audio resample, video frame extraction) is STUBBED: the
sandbox has no image/audio libraries, so ``decode_stub`` either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
derived from the bytes (test mode). Swapping in PIL/torchaudio/ffmpeg
later changes ONE function, not the pipeline.

Scale design:
- payloads stay in executor memory as Arrow binary buffers; nothing is
  collected to the driver;
- ``mapInPandas`` streams batches (spark.sql.execution.arrow
  .maxRecordsPerBatch bounds peak memory per task), so a 100 TB media
  corpus processes at O(batch) memory;
- feature extraction is embarrassingly parallel — no shuffle at all;
  the scan partitioning is the parallelism.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video|text
        StructField("content", BinaryType()),     # opaque payload
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256_hex", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def to_media(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    media_type: str = "text",
    mime: str = "text/plain",
) -> DataFrame:
    """Wrap any column as an opaque binary media payload (the ingest
    boundary: raw bytes + typed metadata, ≙ the reference's opaque blob
    + metadata map, RouteIngestedFile.kt:35-36)."""
    content = (
        F.col(payload_col)
        if isinstance(df.schema[payload_col].dataType, BinaryType)
        else F.encode(F.col(payload_col), "UTF-8")
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        content.alias("content"),
        F.lit(mime).alias("mime"),
        F.octet_length(content).cast("long").alias("n_bytes"),
    )


def decode_stub(content: bytes, media_type: str, strict: bool = False) -> list[float]:
    """Codec stand-in. strict=True raises (production would plug a real
    decoder here); otherwise returns a deterministic 8-dim fake feature
    derived from the payload's sha256 — stable across runs/engines."""
    if strict:
        raise NotImplementedError(
            f"no codec for media_type={media_type!r} in this environment; "
            "plug a real decoder (PIL/torchaudio/ffmpeg) into decode_stub"
        )
    digest = hashlib.sha256(content or b"").digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    One ``mapInPandas`` pass: each Arrow batch arrives as a pandas
    DataFrame whose ``content`` column holds raw bytes; the decoder runs
    per payload inside the batch (vectorized transfer, batch-local
    loop — the codec itself is inherently per-object)."""
    dec = decoder or (lambda b, t: decode_stub(b, t))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(lambda b: len(b or b"")).astype("int64"),
                    "sha256_hex": content.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": content.combine(
                        pdf["media_type"], lambda b, t: dec(b, t)
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def frame_sample(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 16
) -> DataFrame:
    """Deterministic 1→N frame sampling (video → frames shape). Real
    decoders replace the byte-slice with codec frame extraction; the
    fan-out shape — one input row exploding to N child rows, all
    executor-side — is the part that matters (≙ the reference's
    decompress fan-out, FnDecompressor.kt:38-88)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = content or b""
                n = min(max_frames, max(1, len(b) // every_n_bytes))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
