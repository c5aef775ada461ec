"""Wire-format codec (SURVEY §2.2 P7, §2.3 D1, §2.1 S4/S10).

One Kafka record value is a JSON envelope carrying a batch of events:
    {"message": [{"event": ..., "model_name": ..., "data": [snapshot…]}, …]}
(ref lib/dionysus/producer/karafka_responder_generator.rb:42-57 for the
encode side; lib/dionysus/consumer/params_batch_processor.rb:15-27 for
decode). The record key is "Model:id" (lib/dionysus/producer/key.rb:11-13)
and a tombstone is a NULL value under an existing key
(lib/dionysus/producer/outbox/tombstone_publisher.rb:4-21).

Everything is built-in to_json/from_json + explode — JVM-side,
whole-stage-codegen, no UDFs; at scale the decode cost is the JSON
parse itself, which Spark vectorizes per-batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType


def envelope_schema(snapshot_schema: StructType) -> StructType:
    """Schema of the decoded envelope for a given record-snapshot schema."""
    event = StructType(
        [
            StructField("event", StringType()),
            StructField("model_name", StringType()),
            StructField("data", ArrayType(snapshot_schema)),
        ]
    )
    return StructType([StructField("message", ArrayType(event))])


def encode_envelope(
    df: DataFrame,
    event: Column,
    model_name: Column,
    data: Column,
    key: Column | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """P7: build ``(key, value)`` Kafka-shaped output. ``data`` must be an
    array<struct> column (one or more snapshots per event); ``keep_cols``
    pass through untouched (e.g. a partition-ordering column)."""
    value = F.to_json(
        F.struct(
            F.array(
                F.struct(
                    event.alias("event"),
                    model_name.alias("model_name"),
                    data.alias("data"),
                )
            ).alias("message")
        )
    )
    cols = [*keep_cols, value.alias("value")]
    if key is not None:
        cols.insert(len(keep_cols), key.alias("key"))
    return df.select(*cols)


def encode_envelope_batch(
    df: DataFrame,
    group_cols: list[str],
    event: Column,
    model_name: Column,
    snapshot: Column,
    order_col: str | None = None,
) -> DataFrame:
    """P7 with per-message batching: the reference's responder packs a
    BATCH of events into one Kafka record ({"message": [e1, e2, …]},
    karafka_responder_generator.rb:42-57). Events grouped by
    ``group_cols`` (typically the message key / partition) collect into
    one envelope, ordered by ``order_col`` for deterministic wire bytes.
    """
    evt = F.struct(
        event.alias("event"),
        model_name.alias("model_name"),
        F.array(snapshot).alias("data"),
    )
    if order_col is not None:
        pair = F.struct(F.col(order_col).alias("__o"), evt.alias("e"))
        packed = F.transform(
            F.array_sort(F.collect_list(pair)), lambda x: x["e"]
        )
    else:
        packed = F.collect_list(evt)
    return (
        df.groupBy(*group_cols)
        .agg(packed.alias("__events"))
        .select(
            *group_cols,
            F.to_json(F.struct(F.col("__events").alias("message"))).alias("value"),
        )
    )


def decode_envelope(
    df: DataFrame,
    snapshot_schema: StructType,
    value_col: str = "value",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """D1: envelope JSON -> one row per (event, snapshot).

    Output columns: ``keep_cols…, event, model_name, record`` where
    ``record`` is the typed snapshot struct. Tombstones (NULL value) and
    unparseable payloads yield a row with NULL ``record`` and NULL
    ``event`` — callers route them (delete branch / dead-letter)."""
    schema = envelope_schema(snapshot_schema)
    parsed = df.select(
        *keep_cols, F.from_json(F.col(value_col), schema).alias("__env"), F.col(value_col)
    )
    exploded = parsed.select(
        *keep_cols,
        F.col(value_col),
        F.explode_outer("__env.message").alias("__evt"),
    ).select(
        *keep_cols,
        F.col(value_col),
        F.col("__evt.event").alias("event"),
        F.col("__evt.model_name").alias("model_name"),
        F.explode_outer("__evt.data").alias("record"),
    )
    return exploded
