"""Streaming near-duplicate gate — MinHash-LSH as an online filter.

Batch near-dup mining (operators/minhash.py) finds pairs within a
corpus. The streaming gate answers the online question instead: does
this INCOMING document collide with an already-curated index (the
training corpus, a benchmark's held-out set)? Same signature math, run
unchanged inside readStream; the index is a static frame of band keys.

Two join shapes, picked by index size:

- ``broadcast_index=True`` (default): the stream keeps its band-key
  ARRAY and the gate is one stream-static LEFT SEMI join on
  ``array_contains`` — each stream doc emits AT MOST ONCE regardless of
  how many bands collide, no state, no watermark. Right for
  decontamination gates, where the index (a benchmark suite) is
  broadcast-sized.
- ``broadcast_index=False``: band keys explode and the gate is an
  equi-join on band_key — the shape for a corpus-sized index (shuffled
  hash join, no broadcast). A doc colliding in several bands emits once
  per colliding band; the downstream idempotent sink (the F1-guarded
  MERGE) absorbs the duplicates, which is the same at-least-once
  contract the rest of the pipeline already holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.minhash import (
    BANDS,
    NUM_PERM,
    doc_shingles,
    minhash_signature,
)


def band_keys_frame(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, band_keys array<string>) for a batch or streaming frame —
    the expressions are identical either way."""
    rows = num_perm // bands
    signed = minhash_signature(
        doc_shingles(docs, text_col, id_col, k), num_perm, seed
    )
    keys = F.array(
        *[
            F.concat_ws(
                ",",
                F.lit(str(b)),
                *[
                    F.col("signature")[i].cast("string")
                    for i in range(b * rows, (b + 1) * rows)
                ],
            )
            for b in range(bands)
        ]
    )
    return signed.select("doc_id", keys.alias("band_keys"))


def near_dup_gate(
    stream_docs: DataFrame,
    index_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    seed: int = 42,
    broadcast_index: bool = True,
) -> DataFrame:
    """Rows of ``stream_docs`` whose MinHash bands collide with
    ``index_docs`` (LSH candidates — run exact Jaccard downstream if
    the gate must be exact rather than high-recall)."""
    stream_bands = band_keys_frame(
        stream_docs, text_col, id_col, k, num_perm, bands, seed
    )
    index_keys = (
        band_keys_frame(index_docs, text_col, id_col, k, num_perm, bands, seed)
        .select(F.explode("band_keys").alias("band_key"))
        .distinct()
    )
    if broadcast_index:
        return stream_bands.join(
            F.broadcast(index_keys),
            F.array_contains(F.col("band_keys"), F.col("band_key")),
            "left_semi",
        ).select("doc_id")
    exploded = stream_bands.select(
        "doc_id", F.explode("band_keys").alias("band_key")
    )
    return exploded.join(index_keys, "band_key").select("doc_id")
