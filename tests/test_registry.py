"""Registry tests mirroring the reference's declaration semantics:
topic naming, responder output (wire format + keys + partition keys),
dependency→parent fan-out lookup (J2), observer matching (J3), and the
consumer-side message-filter split (F4)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from dionysus_rb_spark.producer.serializer import ChildRel
from dionysus_rb_spark.registry import (
    ConsumerRegistry,
    ConsumerTopicDecl,
    ObserverDecl,
    ProducerRegistry,
    PublicationDecl,
    topic_name,
)


def _rentals_registry(spark):
    reg = ProducerRegistry(namespace="v3")
    reg.topic("rentals", genesis_replica=True, partition_key="account_id")
    fees = spark.createDataFrame(
        [(10, 1, 5.0), (11, 1, 7.0), (12, 2, 9.0)],
        "fee_id LONG, rental_id LONG, amount DOUBLE",
    )
    reg.publish(
        "rentals",
        PublicationDecl(
            resource="rental",
            attributes=("name", "account_id"),
            to_one_links={"account": "account_id"},
            has_many={
                "rentals_fees": ChildRel(
                    child=fees,
                    fk="rental_id",
                    child_id="fee_id",
                    attributes=["amount"],
                    order_col="fee_id",
                    entity="rentals_fee",
                )
            },
            observes=(
                ObserverDecl(
                    model="tax", attributes=("rate",), association_name="rental_id"
                ),
            ),
        ),
    )
    return reg, fees


def test_topic_naming_and_genesis_twin(spark):
    reg, _ = _rentals_registry(spark)
    decl = reg.topics["rentals"]
    assert decl.primary == "v3_rentals"
    assert decl.genesis == "v3_rentals_genesis"
    assert topic_name("bookings") == "dionysus_bookings"


def test_responder_wire_format(spark):
    reg, _ = _rentals_registry(spark)
    rentals = spark.createDataFrame(
        [(1, "Villa", 100), (2, "Flat", 200)],
        "id LONG, name STRING, account_id LONG",
    )
    respond = reg.responder("rentals", "rental")
    out = respond("updated", rentals).orderBy("key").collect()

    assert [r["key"] for r in out] == ["Rental:1", "Rental:2"]
    assert [r["partition_key"] for r in out] == ["100", "200"]
    env = json.loads(out[0]["value"])
    (msg,) = env["message"]
    assert msg["event"] == "rental_updated"
    assert msg["model_name"] == "Rental"
    (snap,) = msg["data"]
    assert snap["id"] == 1 and snap["name"] == "Villa"
    assert snap["links"]["account"] == 100
    assert snap["links"]["rentals_fees"] == [10, 11]
    assert [c["amount"] for c in snap["rentals_fees"]] == [5.0, 7.0]


def test_dependency_parent_fanout_lookup(spark):
    """J2: a change to a sideloaded child republishes its parents
    (producer.rb:56-75, outbox/publisher.rb:80-105)."""
    reg, fees = _rentals_registry(spark)
    hits = reg.parents_of_dependency("rentals_fee")
    assert len(hits) == 1
    topic, pub, rel = hits[0]
    assert topic.name == "rentals" and pub.resource == "rental"

    rentals = spark.createDataFrame(
        [(1, "Villa", 100), (2, "Flat", 200), (3, "Hut", 300)],
        "id LONG, name STRING, account_id LONG",
    )
    changed_fees = fees.filter(F.col("fee_id") == 12)  # belongs to rental 2
    events = reg.dependency_parent_events(
        "rentals_fee", changed_fees, {"rental": rentals}
    )
    (t, frame), = events
    assert t == "v3_rentals"
    got = frame.collect()
    assert [(r["id"], r["event"]) for r in got] == [(2, "rental_updated")]


def test_observer_matching():
    """J3: observers fire only when a watched attribute changed
    (registry.rb:95-161)."""
    reg = ProducerRegistry()
    reg.topic("rentals")
    reg.publish(
        "rentals",
        PublicationDecl(
            resource="rental",
            observes=(
                ObserverDecl("tax", ("rate", "kind"), "rental_id"),
                ObserverDecl("fee", ("amount",), "rental_id"),
            ),
        ),
    )
    assert len(reg.observers_for("tax", {"rate"})) == 1
    assert len(reg.observers_for("tax", {"name"})) == 0
    assert len(reg.observers_for("fee", {"amount", "x"})) == 1
    assert len(reg.observers_for("booking", {"amount"})) == 0


def test_association_chain_and_lambda_partition_key(spark):
    """Dotted observer chains resolve via chained joins; partition_key
    accepts a lambda of the resource frame (partition_key.rb:34-41)."""
    import pyspark.sql.functions as F

    reg = ProducerRegistry()
    reg.topic(
        "rentals",
        partition_key=lambda df: F.col("account_id") * 10,
    )
    reg.publish("rentals", PublicationDecl(resource="rental"))

    # chain: changed taxes -> bookings (tax.booking_id) -> rentals
    taxes = spark.createDataFrame([(1, 100), (2, 200)], "tax_id LONG, booking_id LONG")
    bookings = spark.createDataFrame(
        [(100, 7), (200, 8)], "booking_id LONG, rental_id LONG"
    )
    rentals = spark.createDataFrame(
        [(7, "Villa", 70), (8, "Flat", 80)], "id LONG, name STRING, account_id LONG"
    )
    resolved = reg.resolve_association_chain(
        taxes.filter(F.col("tax_id") == 2),
        [(bookings, "booking_id", "booking_id"), (rentals, "rental_id", "id")],
    )
    assert [r["name"] for r in resolved.collect()] == ["Flat"]

    respond = reg.responder("rentals", "rental")
    out = respond("updated", rentals).orderBy("key").collect()
    assert [r["partition_key"] for r in out] == ["700", "800"]


def test_publish_observer_updates_end_to_end(spark):
    """J3 executed: a watched-attribute change on taxes republishes the
    rentals reached through the booking->rental chain."""
    import pyspark.sql.functions as F

    from dionysus_rb_spark.producer.pipeline import publish_observer_updates

    reg = ProducerRegistry(namespace="v3")
    reg.topic("rentals")
    reg.publish(
        "rentals",
        PublicationDecl(
            resource="rental",
            observes=(
                ObserverDecl("tax", ("rate",), "booking.rental"),
            ),
        ),
    )
    taxes_changed = spark.createDataFrame(
        [(2, 100)], "tax_id LONG, booking_id LONG"
    )
    bookings = spark.createDataFrame(
        [(100, 7), (200, 8)], "booking_id LONG, rental_id LONG"
    )
    rentals = spark.createDataFrame(
        [(7, "Villa"), (8, "Flat")], "id LONG, name STRING"
    )
    chains = {
        "booking.rental": [
            (bookings, "booking_id", "booking_id"),
            (rentals, "rental_id", "id"),
        ]
    }
    # watched attr changed -> one topic frame with the reached rental
    out = publish_observer_updates(reg, "tax", taxes_changed, {"rate"}, chains)
    (topic, frame), = out
    assert topic == "v3_rentals"
    assert [(r["id"], r["event"]) for r in frame.collect()] == [(7, "rental_updated")]
    # unwatched attr -> nothing to publish
    assert publish_observer_updates(reg, "tax", taxes_changed, {"memo"}, chains) == []


def test_consumer_message_filter_split(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    reg = ConsumerRegistry(namespace="v3")
    decl = ConsumerTopicDecl(
        name="rentals",
        entity="rental",
        schema=StructType([StructField("id", LongType())]),
        message_filters=(lambda df: F.length("value") > 100,),
    )
    reg.topic(decl)
    assert decl.topic == "v3_rentals"

    df = spark.createDataFrame([("a" * 10,), ("b" * 200,)], "value STRING")
    kept, ignored = reg.apply_message_filters("rentals", df)
    assert kept.count() == 1 and ignored.count() == 1
    assert ignored.collect()[0]["value"].startswith("b")
