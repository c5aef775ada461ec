"""Property-based deserializer checks: for arbitrary payload values
(unicode attributes, NULLs, empty/absent links, variable-length child
arrays), the canonical flatten preserves every value and the aggregate
dismantle yields exactly the children that went in."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dionysus_rb_spark.consumer.deserializer import DeserializerConfig, deserialize
from dionysus_rb_spark.sources.envelope import decode_envelope

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("updated_at", StringType()),
        StructField("name", StringType()),
        StructField(
            "links",
            StructType(
                [
                    StructField("account", LongType()),
                    StructField("items", ArrayType(LongType())),
                ]
            ),
        ),
        StructField(
            "items",
            ArrayType(
                StructType(
                    [StructField("id", LongType()), StructField("qty", LongType())]
                )
            ),
        ),
    ]
)

name_strategy = st.one_of(
    st.none(), st.text(min_size=0, max_size=20)
)
child_strategy = st.lists(
    st.tuples(st.integers(1, 50), st.integers(0, 9)), max_size=4, unique_by=lambda c: c[0]
)
record_strategy = st.tuples(
    st.integers(1, 1000),  # id
    name_strategy,
    st.one_of(st.none(), st.integers(0, 99)),  # account link
    child_strategy,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(records=st.lists(record_strategy, min_size=1, max_size=5, unique_by=lambda r: r[0]))
def test_canonical_flatten_preserves_values(spark, records):
    envs = []
    for rid, name, account, children in records:
        snap = {
            "id": rid,
            "updated_at": "2024-01-01 10:00:00",
            "name": name,
            "links": {
                "account": account,
                "items": [c[0] for c in children],
            },
            "items": [{"id": c[0], "qty": c[1]} for c in children],
        }
        envs.append(
            json.dumps(
                {"message": [{"event": "thing_created", "model_name": "Thing", "data": [snap]}]}
            )
        )
    raw = spark.createDataFrame([(e,) for e in envs], "value STRING")
    decoded = decode_envelope(raw, SCHEMA)
    frames = deserialize(decoded, SCHEMA, "thing", DeserializerConfig())

    root = {r["synced_id"]: r for r in frames[0].frame.collect()}
    assert set(root) == {r[0] for r in records}
    for rid, name, account, children in records:
        row = root[rid]
        assert row["name"] == name
        assert row["synced_account_id"] == account
        assert list(row["synced_item_ids"] or []) == [c[0] for c in children]
        # D7 archive: the full payload survives verbatim
        archived = json.loads(row["synced_data"])
        assert archived["id"] == rid

    child_frames = [e for e in frames if e.relationship == "has_many"]
    got_children = {
        (r["__parent_id"], r["synced_id"]): r["qty"]
        for r in child_frames[0].frame.collect()
    }
    want_children = {
        (rid, c[0]): c[1] for rid, _, _, children in records for c in children
    }
    assert got_children == want_children
