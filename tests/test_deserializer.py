"""Golden canonical-deserialization tests, mirroring the reference's
spec/dionysus/consumer/deserializer_spec.rb:10-159 (via FIXTURES.md §2):
a nested payload with polymorphic links, empty links, nil relationships,
and 3-level recursion pins its exact canonical form."""

from __future__ import annotations

import datetime as dt
import json

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dionysus_rb_spark.consumer.deserializer import (
    DeserializerConfig,
    deserialize,
)

RENTALS_FEE = StructType(
    [
        StructField("id", LongType()),
        StructField("amount", LongType()),
        StructField("links", StructType([])),
    ]
)
FEE = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("links", StructType([StructField("rentals_fee", LongType())])),
        StructField("rentals_fee", RENTALS_FEE),
    ]
)
BOOKABLE = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("links", StructType([])),
    ]
)
RENTAL = StructType(
    [
        StructField("id", LongType()),
        StructField("created_at", StringType()),
        StructField("updated_at", StringType()),
        StructField("canceled_at", StringType()),
        StructField("name", StringType()),
        StructField(
            "links",
            StructType(
                [
                    StructField("account", LongType()),
                    StructField("bookings", ArrayType(LongType())),
                    StructField(
                        "bookable",
                        StructType(
                            [StructField("type", StringType()), StructField("id", LongType())]
                        ),
                    ),
                    StructField(
                        "empty_bookable",
                        StructType(
                            [StructField("type", StringType()), StructField("id", LongType())]
                        ),
                    ),
                    StructField("tax", LongType()),
                ]
            ),
        ),
        StructField("bookable", BOOKABLE),
        StructField("fees", ArrayType(FEE)),
    ]
)

PAYLOAD = {
    "id": 1,
    "created_at": "2020-01-01 12:00:00",
    "updated_at": "2020-01-02 12:00:00",
    "canceled_at": None,
    "name": "Villa Saganaki",
    "links": {
        "account": 2,
        "bookings": [3, 4],
        "bookable": {"type": "Property", "id": 123},
        "empty_bookable": {},
        "tax": 7,
    },
    "bookable": {"id": 123, "name": "Prop 1", "links": {}},
    "fees": [
        {
            "id": 10,
            "name": "fee1",
            "links": {"rentals_fee": 77},
            "rentals_fee": {"id": 77, "amount": 5, "links": {}},
        },
        {"id": 11, "name": "fee2", "links": {}, "rentals_fee": None},
    ],
}


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame([(json.dumps(PAYLOAD),)], ["value"]).select(
        F.from_json("value", RENTAL).alias("record")
    )
    ents = deserialize(
        df,
        RENTAL,
        "rental",
        DeserializerConfig(),
        polymorphic_types={"bookable": ["Property"]},
    )
    return {(e.entity, e.relationship): e for e in ents}


def test_root_canonical_attributes(frames):
    row = frames[("rental", "root")].frame.collect()[0].asDict()
    assert row["synced_id"] == 1
    assert row["synced_created_at"] == dt.datetime(2020, 1, 1, 12, 0)
    assert row["synced_updated_at"] == dt.datetime(2020, 1, 2, 12, 0)
    assert row["synced_canceled_at"] is None
    assert row["name"] == "Villa Saganaki"
    # D3 link shapes
    assert row["synced_account_id"] == 2
    assert row["synced_booking_ids"] == [3, 4]
    assert row["synced_bookable_id"] == 123
    assert row["synced_bookable_type"] == "Property"
    assert row["synced_empty_bookable_id"] is None
    assert row["synced_empty_bookable_type"] is None
    assert row["synced_tax_id"] == 7
    # D7 archive retains the full payload
    archived = json.loads(row["synced_data"])
    assert archived["id"] == 1 and archived["links"]["account"] == 2


def test_polymorphic_has_one_routed_by_type(frames):
    # D5: bookable routed to entity "property" (underscored type name)
    e = frames[("property", "has_one")]
    assert e.parent_entity == "rental"
    row = e.frame.collect()[0].asDict()
    assert row["synced_id"] == 123
    assert row["name"] == "Prop 1"
    assert row["__parent_id"] == 1


def test_has_many_children(frames):
    e = frames[("fee", "has_many")]
    rows = {r["synced_id"]: r.asDict() for r in e.frame.collect()}
    assert set(rows) == {10, 11}
    assert rows[10]["synced_rentals_fee_id"] == 77
    assert rows[10]["__parent_id"] == 1


def test_three_level_recursion(frames):
    # fee -> rentals_fee nested has_one, parented to fee (3rd level)
    e = frames[("rentals_fee", "has_one")]
    assert e.parent_entity == "fee"
    rows = e.frame.collect()
    assert len(rows) == 1  # fee2's nil relationship yields no row
    row = rows[0].asDict()
    assert row["synced_id"] == 77 and row["amount"] == 5
    assert row["__parent_id"] == 10


def test_attribute_mapper_and_target_filter(spark):
    df = spark.createDataFrame([(json.dumps(PAYLOAD),)], ["value"]).select(
        F.from_json("value", RENTAL).alias("record")
    )
    cfg = DeserializerConfig(
        attribute_mappers={"rental": {"name": "rental_name"}},
        target_columns={"rental": ["synced_id", "rental_name"]},
    )
    ents = deserialize(df, RENTAL, "rental", cfg)
    root = [e for e in ents if e.relationship == "root"][0].frame
    assert set(root.columns) == {"synced_id", "rental_name", "synced_data"}
    assert root.collect()[0]["rental_name"] == "Villa Saganaki"
