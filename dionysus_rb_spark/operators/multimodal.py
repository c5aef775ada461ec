"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, with decode/feature steps as Arrow-batched
``mapInPandas`` stages (beyond-reference, BASELINE.json north star).

The container has no image/audio libraries, so the *decode* internals
are stubbed two ways (clearly marked): ``strict=True`` raises
NotImplementedError where PIL/ffmpeg would run; the default produces a
deterministic fake decode from the content hash. Everything around the
stub — binary schema, Arrow batch shape, partition sizing, metadata
struct contract — is real and tested; swapping the fake for a real
decoder changes only the inner function body.

Scale notes: binaries ride the DataFrame as opaque bytes; keep
``spark.sql.files.maxPartitionBytes`` sized so a partition of blobs
fits executor memory, and never groupBy/join on the blob itself — all
keyed ops use the metadata/digest columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),  # image/audio/video
        StructField("format", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Testdata stand-in: treat the utf-8 bytes of a text column as an
    opaque media blob (the plumbing neither knows nor cares)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
    )


def binary_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap JVM-side metadata: size + digest (no Python roundtrip)."""
    return df.withColumn("byte_len", F.octet_length(F.col(content_col)).cast("long")).withColumn(
        "digest", F.md5(F.col(content_col))
    )


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decode: dims derived from the
    content digest. NOT a real decode — see decode_media(strict=True)."""
    h = hashlib.md5(content).digest()
    return 64 + h[0] % 960, 64 + h[1] % 960, 1 + h[2] % 4


def decode_media(
    df: DataFrame,
    batch_size_hint: int = 256,
    strict: bool = False,
) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas.

    ``strict=True`` marks the real-decoder path: it raises
    NotImplementedError (PIL/torchvision/ffmpeg are not in this
    container). The default path runs the deterministic fake so the
    full pipeline — batch iteration, schema, null handling — executes
    for real."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (not in container); "
                    "run with strict=False for the deterministic stub"
                )
            out = {
                "media_id": pdf["media_id"],
                # NULL payload -> NULL features: a missing blob has no
                # length ("no bytes" != "zero bytes"), matching the
                # digest/dims columns and the SQL octet_length(NULL)
                # semantics (round-7 NULL-input fuzz)
                "byte_len": pdf["content"].map(
                    lambda b: len(b) if b is not None else None
                ),
                "digest": pdf["content"].map(
                    lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                ),
            }
            dims = pdf["content"].map(
                lambda b: _fake_decode(bytes(b)) if b is not None else (None, None, None)
            )
            out["width"] = dims.map(lambda d: d[0])
            out["height"] = dims.map(lambda d: d[1])
            out["channels"] = dims.map(lambda d: d[2])
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, DECODED_SCHEMA)


def content_embedding(content_col: F.Column, dim: int = 16) -> F.Column:
    """Deterministic stand-in for a learned media embedding: the md5
    digest's bytes, centered and scaled to [-1, 1] (dim <= 16). JVM-side
    built-ins so the whole multimodal->similarity pipeline stays
    codegen'd AND oracle-checkable; a real vision/audio encoder swaps in
    as an Arrow-batched mapInPandas stage with the same
    array<double> output contract (see decode_media for the shape)."""
    if not 1 <= dim <= 16:
        raise ValueError("md5 provides 16 bytes; dim must be in [1, 16]")
    h = F.md5(content_col)
    return F.array(
        *[
            (
                (F.conv(F.substring(h, 2 * i + 1, 2), 16, 10).cast("double") - 127.5)
                / 127.5
            )
            for i in range(dim)
        ]
    )


def frame_sample(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Video-style frame sampling stub: emit one row per sampled offset
    (JVM-side posexplode over computed offsets — the real sampler would
    decode at these offsets inside a mapInPandas stage)."""
    n_frames = F.least(
        F.floor(F.octet_length("content") / every_n_bytes) + 1, F.lit(max_frames)
    ).cast("int")
    return df.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "__f"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).cast("long").alias("byte_offset"),
    )


def chunk_media(
    df: DataFrame,
    chunk_bytes: int = 128,
    overlap_bytes: int = 32,
    content_col: str = "content",
) -> DataFrame:
    """Overlapping fixed-size chunking of opaque blobs — the audio/video
    analogue of text passage-splitting (whisper-style 30s windows with
    overlap, video GOP windows): one row per chunk with its byte extent
    and content digest, ready for a per-chunk Arrow decode stage.

    Pure codegen scan: offsets come from a row-local sequence explode,
    the chunk bytes are sliced JVM-side, and nothing shuffles — chunk
    rows inherit the scan's partitioning, so a following mapInPandas
    decoder sees whole batches of same-blob chunks without a sort.
    """
    n = F.octet_length(F.col(content_col))
    stride = chunk_bytes - overlap_bytes
    assert stride > 0, "overlap must be smaller than the chunk"
    n_chunks = F.when(n <= chunk_bytes, F.lit(1)).otherwise(
        F.ceil((n - chunk_bytes) / F.lit(stride)).cast("long") + 1
    )
    out = df.withColumn(
        "chunk_idx",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)),
    )
    offset = F.col("chunk_idx") * stride
    clen = F.least(F.lit(chunk_bytes).cast("long"), n - offset)
    chunk = F.expr(
        f"substring({content_col}, chunk_idx * {stride} + 1, "
        f"least({chunk_bytes}, octet_length({content_col}) - chunk_idx * {stride}))"
    )
    return out.select(
        "media_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        offset.cast("long").alias("byte_offset"),
        clen.cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_digest"),
    )
