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
    associated records via the FK chain (multi-hop = chained joins,
    dimension side broadcast)."""
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
            F.broadcast(customer.join(F.broadcast(hits), customer.c_custkey == hits.user_id)),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select("o_orderkey", F.lit("order_updated").alias("event"))
        .distinct()
    )
