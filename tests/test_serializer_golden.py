"""Golden case from the reference's model_serializer_spec.rb: one
record (id=1, name="name", account_id=2) with bookings [3].

- include=[] (no sideload): payload carries attributes + links only —
  {"id": 1, "name": "name", "links": {"account": 2, "bookings": [3]}}
- include=[:bookings]: the links stay identical and the child OBJECTS
  additionally sideload inline.

The oracle-certified queries (p3/d4) exercise the same machinery at
table scale; this pins the exact wire structure of the spec example.
"""

from __future__ import annotations

from dionysus_rb_spark.producer.serializer import ChildRel, serialize_aggregate


def _frames(spark):
    parent = spark.createDataFrame(
        [(1, "name", 2)], "id LONG, name STRING, account_id LONG"
    )
    bookings = spark.createDataFrame(
        [(3, 1)], "booking_id LONG, parent_id LONG"
    )
    return parent, bookings


def test_links_only_matches_spec(spark):
    parent, bookings = _frames(spark)
    out = serialize_aggregate(
        parent,
        parent_id="id",
        attributes=["name"],
        to_one_links={"account": "account_id"},
        has_many={
            "bookings": ChildRel(
                child=bookings,
                fk="parent_id",
                child_id="booking_id",
                sideload=False,
                order_col="booking_id",
            )
        },
    )
    row = out.select("payload").collect()[0]["payload"].asDict(recursive=True)
    assert row["id"] == 1
    assert row["name"] == "name"
    assert row["links"] == {"account": 2, "bookings": [3]}
    assert "bookings" not in {k for k in row if k != "links"} - {"id", "name"}


def test_sideload_matches_spec(spark):
    parent, bookings = _frames(spark)
    out = serialize_aggregate(
        parent,
        parent_id="id",
        attributes=["name"],
        to_one_links={"account": "account_id"},
        has_many={
            "bookings": ChildRel(
                child=bookings,
                fk="parent_id",
                child_id="booking_id",
                sideload=True,
                order_col="booking_id",
            )
        },
    )
    row = out.select("payload").collect()[0]["payload"].asDict(recursive=True)
    assert row["links"] == {"account": 2, "bookings": [3]}
    assert row["bookings"] == [{"booking_id": 3}]


def test_childless_parent_links_coalesce_to_empty(spark):
    """model_serializer.rb:68-75: a parent with no children still gets
    links.bookings = [] (not NULL) — 'no inline children' leaves the
    sideload objects NULL, but the id list is always an array."""
    parent, bookings = _frames(spark)
    no_children = bookings.filter("booking_id < 0")
    out = serialize_aggregate(
        parent,
        parent_id="id",
        attributes=["name"],
        has_many={
            "bookings": ChildRel(
                child=no_children,
                fk="parent_id",
                child_id="booking_id",
                sideload=True,
                order_col="booking_id",
            )
        },
    )
    row = out.select("payload").collect()[0]["payload"].asDict(recursive=True)
    assert row["links"] == {"bookings": []}
    assert row["bookings"] is None
