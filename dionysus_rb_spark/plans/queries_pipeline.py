"""Serialization-pipeline queries: wire-format codec and aggregate
assembly/dismantling, oracle-checked on the TPC-H-ish tables
(FIXTURES.md §7: orders+lineitem play parent+children aggregates)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..producer.serializer import ChildRel, serialize_aggregate
from ..sources.envelope import decode_envelope, encode_envelope
from ..tables import load_table
from .catalog import query

_SNAPSHOT = StructType(
    [StructField("id", LongType()), StructField("value", DoubleType())]
)


@query(
    "d1_envelope_roundtrip",
    refs="P7,D1,S4",
    oracle="""
    SELECT event_type || '_updated' AS event,
           'Event' AS model_name,
           event_id AS synced_id,
           value AS val
    FROM events
    """,
)
def d1_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 encode -> D1 decode roundtrip: each event becomes a one-event
    envelope ({"message":[{event,model_name,data:[snapshot]}]}), is
    serialized to the wire JSON, parsed back, exploded, and flattened.
    The oracle is the identity projection — any codec asymmetry
    (key order, type coercion, null handling) breaks the match."""
    ev = load_table(spark, sf_dir, "events")
    enveloped = encode_envelope(
        ev,
        event=F.concat(F.col("event_type"), F.lit("_updated")),
        model_name=F.lit("Event"),
        data=F.array(F.struct(F.col("event_id").alias("id"), F.col("value"))),
        key=F.concat(F.lit("Event:"), F.col("event_id").cast("string")),
    )
    decoded = decode_envelope(enveloped, _SNAPSHOT)
    return decoded.select(
        "event",
        "model_name",
        F.col("record.id").alias("synced_id"),
        F.col("record.value").alias("val"),
    )


@query(
    "d1_batched_envelope_roundtrip",
    refs="P7,D1,G4",
    oracle="""
    SELECT user_id, event_id AS synced_id, value AS val,
           event_type || '_updated' AS event
    FROM events
    """,
)
def d1_batched_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 batched encode -> D1 decode roundtrip: all of a user's events
    pack into ONE wire message ({"message":[e1,e2,…]}, the responder's
    buffering), then explode back out — counts and values must survive
    the pack/unpack exactly."""
    from pyspark.sql import functions as F

    from ..sources.envelope import encode_envelope_batch

    ev = load_table(spark, sf_dir, "events")
    packed = encode_envelope_batch(
        ev,
        ["user_id"],
        event=F.concat(F.col("event_type"), F.lit("_updated")),
        model_name=F.lit("Event"),
        snapshot=F.struct(F.col("event_id").alias("id"), F.col("value")),
        order_col="event_id",
    )
    decoded = decode_envelope(packed, _SNAPSHOT, keep_cols=("user_id",))
    return decoded.select(
        "user_id",
        F.col("record.id").alias("synced_id"),
        F.col("record.value").alias("val"),
        "event",
    )


@query(
    "p3_aggregate_assembly",
    refs="P1,P2,P3,J2",
    bench=True,
    oracle="""
    SELECT o.o_orderkey,
           o.o_custkey AS customer_id,
           count(l.l_orderkey) AS n_lines,
           coalesce(string_agg(CAST(l.l_linenumber AS VARCHAR), ','
                               ORDER BY l.l_linenumber), '') AS line_ids_csv
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_custkey
    """,
)
def p3_aggregate_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3 aggregate serialization (model_serializer.rb:63-89): orders
    sideload their lineitems — children grouped once on the FK
    (collect_list of id + object structs, deterministic order), one left
    join to the parent; the probe projects the payload struct back out."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    agg = serialize_aggregate(
        orders,
        parent_id="o_orderkey",
        attributes=["o_custkey", "o_totalprice"],
        to_one_links={"customer": "o_custkey"},
        has_many={
            "lineitems": ChildRel(
                child=lineitem,
                fk="l_orderkey",
                child_id="l_linenumber",
                attributes=["l_quantity", "l_extendedprice"],
                order_col="l_linenumber",
            )
        },
    )
    return agg.select(
        F.col("payload.id").alias("o_orderkey"),
        F.col("payload.links.customer").alias("customer_id"),
        # ids array is coalesced to [] for childless parents (sideload
        # objects stay NULL, matching "no inline children" semantics)
        F.size("payload.links.lineitems").alias("n_lines"),
        F.array_join(
            F.transform(F.col("payload.links.lineitems"), lambda x: x.cast("string")),
            ",",
        ).alias("line_ids_csv"),
    ).withColumn("n_lines", F.col("n_lines").cast("long"))


@query(
    "d8_synced_data_backfill",
    refs="D8",
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS INT) AS k
    FROM events
    """,
)
def d8_synced_data_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 column backfill from the archived payload
    (assign_columns_from_synced_data.rb:11-26): re-extract a chosen
    column from the stored JSON over the whole table —
    ``get_json_object`` stays JVM-side (no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
