"""Multimodal-plumbing + observer-join queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal
from ..tables import load_table
from .catalog import query


@query(
    "mm_binary_metadata",
    refs="beyond:multimodal",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS digest
    FROM documents
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: opaque blob + JVM-side metadata (size,
    digest) — no Python roundtrip for the cheap path. (DuckDB's md5
    takes VARCHAR, so the oracle hashes the text — identical bytes.)"""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary(docs, "text", "doc_id")
    return multimodal.binary_metadata(media).select("media_id", "byte_len", "digest")


@query(
    "mm_frame_sample",
    refs="beyond:multimodal",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(range(least(octet_length(encode(text)) // 64 + 1, 8)))
               AS INT) AS frame_idx,
           CAST(unnest(range(least(octet_length(encode(text)) // 64 + 1, 8))) * 64
               AS BIGINT) AS byte_offset
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled byte offset
    (posexplode over computed offsets; the real decoder would run at
    these offsets inside mapInPandas)."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary(docs, "text", "doc_id")
    return multimodal.frame_sample(media, every_n_bytes=64, max_frames=8)


def _hexbyte(pos: int) -> str:
    """DuckDB: md5-hex chars [pos, pos+1] as an int byte."""
    return (
        f"list_reduce(list_transform(split(substr(md5(text), {pos}, 2), ''),"
        " x -> CAST(strpos('0123456789abcdef', x) - 1 AS BIGINT)), (a,b) -> a*16+b)"
    )


@query(
    "mm_decode_features",
    refs="beyond:multimodal",
    bench=True,
    pure_plan=True,
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS digest,
           CAST(64 + ({_hexbyte(1)} % 960) AS INT) AS width,
           CAST(64 + ({_hexbyte(3)} % 960) AS INT) AS height,
           CAST(1 + ({_hexbyte(5)} % 4) AS INT) AS channels
    FROM documents
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode via mapInPandas (deterministic stub for the
    PIL-less container; the batch plumbing, schema, and null handling
    are the real article — the stub's md5-derived dims are mirrored
    bit-for-bit by the oracle, so even the Python stage is value-checked)."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary(docs, "text", "doc_id")
    return multimodal.decode_media(media)


_EMBED_DIM = 16
_EMBED_PLANES_SEED = 7


def _embed_sql() -> str:
    """DuckDB mirror of content_embedding over documents.text."""
    comps = ", ".join(
        f"(CAST({_hexbyte(2 * i + 1)} AS DOUBLE) - 127.5) / 127.5"
        for i in range(_EMBED_DIM)
    )
    return f"[{comps}]"


def _bucket_sql(plane_list: list[list[int]]) -> str:
    terms = []
    for p, w in enumerate(plane_list):
        lits = ", ".join(f"CAST({x} AS DOUBLE)" for x in w)
        terms.append(
            f"CASE WHEN list_reduce(list_transform(range(len(v)),"
            f" i -> v[i+1] * ([{lits}])[i+1]), (x,y) -> x+y) >= 0"
            f" THEN (CAST(1 AS BIGINT) << {p}) ELSE 0 END"
        )
    return " + ".join(terms)


def _mm_planes():
    from ..operators.similarity import planes

    return planes(num_planes=8, dim=_EMBED_DIM, seed=_EMBED_PLANES_SEED)


@query(
    "mm_embed_lsh",
    bench=True,
    pure_plan=True,
    refs="beyond:multimodal,beyond:similarity",
    oracle=f"""
    WITH base AS (
      SELECT doc_id AS media_id, {_embed_sql()} AS v FROM documents
    )
    SELECT media_id,
           round(sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)), 6)
               AS l2_norm,
           {_bucket_sql(_mm_planes())} AS bucket
    FROM base
    """,
)
def mm_embed_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal -> similarity integration: opaque blobs get a
    deterministic content embedding (stand-in for a learned encoder,
    value-checked bit-for-bit) and flow straight into the hyperplane-LSH
    bucketer — the same bucket column the ANN near-dup join keys on. One
    codegen scan end to end; with a real encoder only the embedding
    stage becomes an Arrow-batched Python stage."""
    from ..operators.similarity import _fold_sum, lsh_bucket

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary(docs, "text", "doc_id")
    emb = media.select(
        "media_id",
        multimodal.content_embedding(F.col("content"), _EMBED_DIM).alias("v"),
    )
    return emb.select(
        "media_id",
        F.round(
            F.sqrt(_fold_sum(F.transform("v", lambda x: x * x))), 6
        ).alias("l2_norm"),
        lsh_bucket("v", _mm_planes()).alias("bucket"),
    )


@query(
    "j3_observer_fanout",
    refs="J3,F11",
    oracle="""
    WITH changes AS (
      SELECT user_id,
             CASE WHEN value > 100 THEN ['acctbal', 'name']
                  ELSE ['comment'] END AS changed_cols
      FROM events
    ),
    hits AS (
      SELECT DISTINCT user_id FROM changes
      WHERE list_has_any(changed_cols, ['acctbal'])
    )
    SELECT DISTINCT o.o_orderkey, 'order_updated' AS event
    FROM hits h
    JOIN customer c ON c.c_custkey = h.user_id
    JOIN orders o ON o.o_custkey = c.c_custkey
    """,
)
def j3_observer_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 observer join (producer.rb:101-120, registry.rb:95-161):
    events whose changeset touches a watched attribute republish the
    associated records via the FK chain (multi-hop = chained joins).

    No broadcast hints: the hit set is derived from the full events
    table and is bounded only by customer cardinality, so a hot
    watched attribute makes it dimension-sized. AQE picks broadcast
    when the runtime stats say the side is actually small (same rule
    the PLANS.md forced-broadcast audit applied to t_lm_quality and
    f11); the per-batch registry fan-out path (registry.py) keeps its
    documented broadcast_hops opt-in for genuinely bounded batches."""
    ev = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    changes = ev.select(
        "user_id",
        F.when(F.col("value") > 100, F.array(F.lit("acctbal"), F.lit("name")))
        .otherwise(F.array(F.lit("comment")))
        .alias("changed_cols"),
    )
    watched = F.array(F.lit("acctbal"))
    hits = (
        changes.filter(F.arrays_overlap(F.col("changed_cols"), watched))
        .select("user_id")
        .distinct()
    )
    return (
        orders.join(
            customer.join(hits, customer.c_custkey == hits.user_id),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select("o_orderkey", F.lit("order_updated").alias("event"))
        .distinct()
    )


@query(
    "mm_chunk_media",
    refs="beyond:multimodal",
    oracle="""
    WITH sized AS (
      SELECT doc_id AS media_id, text,
             octet_length(encode(text)) AS n,
             CASE WHEN octet_length(encode(text)) <= 128 THEN 1
                  ELSE CAST(ceil((octet_length(encode(text)) - 128) / 96.0)
                       AS BIGINT) + 1 END AS n_chunks
      FROM documents
    ),
    chunks AS (
      SELECT media_id, text, n, unnest(range(n_chunks)) AS chunk_idx
      FROM sized
    )
    SELECT media_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * 96 AS BIGINT) AS byte_offset,
           CAST(least(128, n - chunk_idx * 96) AS BIGINT) AS chunk_len,
           md5(substr(text, CAST(chunk_idx * 96 + 1 AS BIGINT),
                      CAST(least(128, n - chunk_idx * 96) AS BIGINT)))
               AS chunk_digest
    FROM chunks
    """,
)
def mm_chunk_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping blob chunking (128-byte windows, 32-byte overlap —
    the whisper/GOP windowing shape): per-chunk byte extents + digests
    from one codegen scan, no shuffle; the testdata blob is the utf-8
    text so the oracle digests the identical bytes via substr."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary(docs, "text", "doc_id")
    return multimodal.chunk_media(media, chunk_bytes=128, overlap_bytes=32)


@query(
    "mm_shared_segments",
    refs="beyond:multimodal,beyond:dedup",
    oracle="""
    WITH sized AS (
      SELECT doc_id AS media_id, text,
             octet_length(encode(text)) AS n,
             CASE WHEN octet_length(encode(text)) <= 128 THEN 1
                  ELSE CAST(ceil((octet_length(encode(text)) - 128) / 96.0)
                       AS BIGINT) + 1 END AS n_chunks
      FROM documents
    ),
    chunks AS (
      SELECT media_id, text, n, unnest(range(n_chunks)) AS chunk_idx
      FROM sized
    ),
    digests AS (
      SELECT media_id,
             CAST(chunk_idx * 96 AS BIGINT) AS byte_offset,
             md5(substr(text, CAST(chunk_idx * 96 + 1 AS BIGINT),
                        CAST(least(128, n - chunk_idx * 96) AS BIGINT)))
                 AS chunk_digest
      FROM chunks
    )
    SELECT chunk_digest,
           CAST(count(DISTINCT media_id) AS BIGINT) AS n_media,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           min(media_id) AS first_media_id,
           min(byte_offset) AS min_offset
    FROM digests
    GROUP BY chunk_digest
    HAVING count(DISTINCT media_id) >= 2
    """,
)
def mm_shared_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-media repeated-segment detection (the shared-intro/outro/
    boilerplate report for video-audio corpora): chunk every blob, group
    by chunk digest, keep segments appearing in >= 2 distinct media.
    ONE shuffle keyed by the 16-byte digest — chunk bytes never move;
    at 100 TB this is the multimodal twin of passage-level text dedup
    (dd_passage_dedup) and feeds the same keep-one-owner policy."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary(docs, "text", "doc_id")
    chunks = multimodal.chunk_media(media, chunk_bytes=128, overlap_bytes=32)
    return (
        chunks.groupBy("chunk_digest")
        .agg(
            F.countDistinct("media_id").cast("long").alias("n_media"),
            F.count("*").cast("long").alias("n_occurrences"),
            F.min("media_id").alias("first_media_id"),
            F.min("byte_offset").alias("min_offset"),
        )
        .filter(F.col("n_media") >= 2)
    )
