"""Streaming operator tests: A2 run-length dedup as a stateful stream,
windowed latency metrics, the genesis backfill roundtrip, and the
progress monitor (T4/T6/T10 + SURVEY §7 hard part 1)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dionysus_rb_spark.consumer.persistor import EntitySink
from dionysus_rb_spark.producer.genesis import genesis_scan, genesis_stream
from dionysus_rb_spark.streaming.dedup_stream import consecutive_dedup_stream
from dionysus_rb_spark.streaming.monitor import ProgressMonitor, windowed_latency_metrics
from dionysus_rb_spark.streaming.pipeline import run_consumer_stream
from dionysus_rb_spark.streaming.snapshot_store import SnapshotStore


def test_consecutive_dedup_stream_run_length(spark, tmp_path):
    """Adjacent same-key rows collapse to the run's last row; the run
    spanning the micro-batch boundary stays one run; non-adjacent
    duplicates survive (duplicates_filter.rb:15-25 semantics)."""
    inp = tmp_path / "ob"
    inp.mkdir()
    # batch 1: A A B  -> emits A(seq2) when B arrives; B pending
    rows1 = [
        {"topic": "t1", "resource_id": 1, "event_name": "A", "seq": 1},
        {"topic": "t1", "resource_id": 1, "event_name": "A", "seq": 2},
        {"topic": "t1", "resource_id": 1, "event_name": "B", "seq": 3},
    ]
    # batch 2: B A  -> B run continues across the boundary (seq4 wins,
    # emitted when A arrives); A pending forever (never flushed here)
    rows2 = [
        {"topic": "t1", "resource_id": 1, "event_name": "B", "seq": 4},
        {"topic": "t1", "resource_id": 1, "event_name": "A", "seq": 5},
    ]
    (inp / "f1.jsonl").write_text("\n".join(json.dumps(r) for r in rows1))
    (inp / "f2.jsonl").write_text("\n".join(json.dumps(r) for r in rows2))

    schema = "topic STRING, resource_id LONG, event_name STRING, seq LONG"
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    deduped = consecutive_dedup_stream(
        src, ["topic"], ["resource_id", "event_name"], "seq"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("a2_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = {(r["event_name"], r["seq"]) for r in spark.sql("SELECT * FROM a2_out").collect()}
    assert emitted == {("A", 2), ("B", 4)}


def test_exact_dedup_stream_drops_replays(spark, tmp_path):
    from dionysus_rb_spark.streaming.dedup_stream import exact_dedup_stream

    inp = tmp_path / "replay"
    inp.mkdir()
    rows1 = [
        {"k": 1, "ts": "2024-01-01 10:00:00", "v": 1.0},
        {"k": 1, "ts": "2024-01-01 10:00:00", "v": 1.0},  # in-batch dup
        {"k": 2, "ts": "2024-01-01 10:00:01", "v": 2.0},
    ]
    rows2 = [
        {"k": 1, "ts": "2024-01-01 10:00:00", "v": 1.0},  # cross-batch replay
        {"k": 3, "ts": "2024-01-01 10:00:02", "v": 3.0},
    ]
    (inp / "f1.jsonl").write_text("\n".join(json.dumps(r) for r in rows1))
    (inp / "f2.jsonl").write_text("\n".join(json.dumps(r) for r in rows2))
    src = (
        spark.readStream.schema("k LONG, ts STRING, v DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = exact_dedup_stream(src, ["k"], "ts")
    q = (
        deduped.writeStream.format("memory")
        .queryName("exact_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["k"] for r in spark.sql("SELECT * FROM exact_out").collect())
    assert got == [1, 2, 3]


def test_windowed_latency_metrics(spark, tmp_path):
    inp = tmp_path / "lat"
    inp.mkdir()
    rows = [
        {"created_at": "2024-01-01 10:00:00", "published_at": "2024-01-01 10:00:05"},
        {"created_at": "2024-01-01 10:00:10", "published_at": "2024-01-01 10:00:25"},
        {"created_at": "2024-01-01 10:01:00", "published_at": "2024-01-01 10:01:30"},
    ]
    (inp / "f.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    src = (
        spark.readStream.schema("created_at STRING, published_at STRING")
        .json(str(inp))
        .select(
            F.col("created_at").cast("timestamp").alias("created_at"),
            F.col("published_at").cast("timestamp").alias("published_at"),
        )
    )
    metrics = windowed_latency_metrics(src)
    q = (
        metrics.writeStream.format("memory")
        .queryName("lat_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        str(r["window_start"]): (r["minimum"], r["maximum"], r["n_published"])
        for r in spark.sql("SELECT * FROM lat_out").collect()
    }
    assert got["2024-01-01 10:00:00"] == (5.0, 15.0, 2)
    assert got["2024-01-01 10:01:00"] == (30.0, 30.0, 1)


THING = StructType(
    [
        StructField("id", LongType()),
        StructField("updated_at", StringType()),
        StructField("name", StringType()),
    ]
)


def test_genesis_roundtrip(spark, tmp_path):
    """Producer genesis (filtered scan -> envelopes, batched by id) fed
    through the consumer stream reproduces the source table (T6)."""
    source = spark.createDataFrame(
        [
            (i, f"2024-01-{(i % 27) + 1:02d} 10:00:00", f"thing-{i}", None if i % 5 else "2024-02-01 00:00:00")
            for i in range(1, 26)
        ],
        "id LONG, updated_at STRING, name STRING, canceled_at STRING",
    )
    scanned = genesis_scan(
        source,
        updated_col="updated_at",
        from_ts="2024-01-01 00:00:00",
        to_ts="2024-12-31 00:00:00",
        canceled_col="canceled_at",
    )
    res = genesis_stream(
        scanned,
        out_dir=str(tmp_path / "topics"),
        topic="things",
        resource="thing",
        payload=F.struct(
            F.col("id"), F.col("updated_at"), F.col("name")
        ),
        id_col="id",
        batch_size=10,
        genesis_replica=True,
    )
    assert res.n_rows == 20  # 5 canceled rows filtered by F6
    assert res.n_batches == 2
    assert res.topics == ["things", "things_genesis"]

    store = SnapshotStore(str(tmp_path / "things_store"))
    mon = ProgressMonitor()
    spark.streams.addListener(mon)
    try:
        q = run_consumer_stream(
            spark,
            str(tmp_path / "topics" / "things_genesis"),
            str(tmp_path / "cp"),
            THING,
            "thing",
            {"thing": EntitySink(store)},
            available_now=True,
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)
    finally:
        spark.streams.removeListener(mon)

    got = {r["synced_id"]: r["name"] for r in store.read(spark).collect()}
    want = {r["id"]: r["name"] for r in scanned.collect()}
    assert got == want
    # T10: the monitor saw every genesis batch
    assert mon.total_input_rows() == 20
    assert not mon.stale(600)


def test_bucketed_store_matches_plain_and_prunes(spark, tmp_path):
    """The bucketed store produces byte-identical state to the plain one
    while rewriting ONLY the buckets a batch touches."""
    from dionysus_rb_spark.streaming.snapshot_store import BucketedSnapshotStore

    plain = SnapshotStore(str(tmp_path / "plain"))
    bucketed = BucketedSnapshotStore(str(tmp_path / "bucketed"), num_buckets=8)

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "synced_id LONG, synced_updated_at TIMESTAMP, val DOUBLE, "
            "synced_canceled_at TIMESTAMP, event STRING",
        )

    from datetime import datetime

    b1 = batch(
        [(i, datetime(2024, 1, 1, 10), float(i), None, "created") for i in range(1, 21)]
    )
    for s in (plain, bucketed):
        s.merge(spark, b1)
    manifest_before = dict(bucketed._manifest())

    # second batch: update key 5, destroy key 6 (hard), insert key 100
    b2 = batch(
        [
            (5, datetime(2024, 1, 2, 10), 55.0, None, "updated"),
            (6, datetime(2024, 1, 2, 10), None, None, "destroyed"),
            (100, datetime(2024, 1, 2, 10), 100.0, None, "created"),
        ]
    )
    for s in (plain, bucketed):
        s.merge(spark, b2)

    def state(s):
        return {
            r["synced_id"]: (r["synced_updated_at"], r["val"])
            for r in s.read(spark).collect()
        }

    assert state(plain) == state(bucketed)
    assert len(state(bucketed)) == 20  # 20 - 1 destroyed + 1 inserted

    # pruning: buckets untouched by batch 2 still point at their v1 files
    manifest_after = bucketed._manifest()
    touched = {
        str(r["__b"])
        for r in b2.select(bucketed._bucket_expr().alias("__b")).distinct().collect()
    }
    for b, path in manifest_before.items():
        if b not in touched:
            assert manifest_after[b] == path, f"untouched bucket {b} was rewritten"
    assert any(manifest_after[b] != manifest_before.get(b) for b in touched)

    # T1 idempotency on the bucketed path: replaying batch 2 is a no-op
    bucketed.merge(spark, b2)
    assert state(plain) == state(bucketed)

    # GC: after several merges, unreferenced version dirs are bounded
    import os

    from datetime import datetime as _dt

    for i in range(4):
        bucketed.merge(
            spark, batch([(5, _dt(2024, 1, 3 + i, 10), 60.0 + i, None, "updated")])
        )
    referenced = {p.split(os.sep, 1)[0] for p in bucketed._manifest().values()}
    on_disk = {
        d for d in os.listdir(bucketed.path)
        if d.startswith("v") and os.path.isdir(os.path.join(bucketed.path, d))
    }
    assert len(on_disk - referenced) <= 2  # grace window only


def test_hive_bucketed_target_skips_exchange(spark):
    """Evidence for the at-scale deployment note: a merge target stored
    as a Hive-bucketed table joins on its bucket key with NO exchange on
    the target side (only the batch side shuffles)."""
    import pyspark.sql.functions as F

    target = spark.range(0, 10_000).select(
        F.col("id").alias("synced_id"), (F.col("id") % 97).alias("val")
    )
    spark.sql("DROP TABLE IF EXISTS __bucketed_target")
    (
        target.write.bucketBy(8, "synced_id")
        .sortBy("synced_id")
        .mode("overwrite")
        .saveAsTable("__bucketed_target")
    )
    try:
        tgt = spark.table("__bucketed_target")
        batch = spark.range(0, 100).select(
            F.col("id").alias("synced_id"), F.lit(1).alias("delta")
        )
        plan = (
            tgt.join(batch, "synced_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # exactly one Exchange: the batch side repartitioning to the
        # table's bucketing; the bucketed scan feeds the join directly
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS __bucketed_target")


def test_tombstone_and_corrupt_payload_handling(spark, tmp_path):
    """S10: a NULL value under a 'Model:id' key hard-deletes that key.
    Corrupt payloads (unparseable JSON) land in the dead-letter store
    instead of vanishing (T9)."""
    import json as _json

    from dionysus_rb_spark.consumer.persistor import persist_batch

    store = SnapshotStore(str(tmp_path / "things"))
    dlq = SnapshotStore(str(tmp_path / "dlq"))

    def env(event, **attrs):
        return _json.dumps(
            {"message": [{"event": event, "model_name": "Thing", "data": [attrs]}]}
        )

    batch1 = spark.createDataFrame(
        [
            ("Thing:1", env("thing_created", id=1, updated_at="2024-01-01 10:00:00", name="A")),
            ("Thing:2", env("thing_created", id=2, updated_at="2024-01-01 10:00:00", name="B")),
        ],
        "key STRING, value STRING",
    )
    persist_batch(spark, batch1, THING, "thing", {"thing": EntitySink(store)})
    batch2 = spark.createDataFrame(
        [
            ("Thing:1", None),  # tombstone: delete key 1
            ("Thing:3", "{not json at all"),  # corrupt -> dead letter
        ],
        "key STRING, value STRING",
    )
    res = persist_batch(
        spark, batch2, THING, "thing", {"thing": EntitySink(store)},
        dead_letter_store=dlq,
    )
    state = {r["synced_id"] for r in store.read(spark).collect()}
    assert state == {2}
    assert res.dead_letter_count == 1
    assert dlq.read(spark).collect()[0]["value"].startswith("{not json")


def test_multi_entity_persist_sideloads(spark, tmp_path):
    """An aggregate envelope (parent + sideloaded children) persists the
    root AND each child entity into its own store (D4 + persist order,
    persistor.rb:102-151)."""
    import json as _json

    from pyspark.sql.types import ArrayType, DoubleType

    from dionysus_rb_spark.consumer.persistor import persist_batch

    order_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("updated_at", StringType()),
            StructField("total", DoubleType()),
            StructField(
                "items",
                ArrayType(
                    StructType(
                        [
                            StructField("id", LongType()),
                            StructField("qty", LongType()),
                        ]
                    )
                ),
            ),
        ]
    )
    env = _json.dumps(
        {
            "message": [
                {
                    "event": "order_created",
                    "model_name": "Order",
                    "data": [
                        {
                            "id": 1,
                            "updated_at": "2024-01-01 10:00:00",
                            "total": 42.0,
                            "items": [
                                {"id": 11, "qty": 2},
                                {"id": 12, "qty": 3},
                            ],
                        }
                    ],
                }
            ]
        }
    )
    raw = spark.createDataFrame([(env,)], "value STRING")
    order_store = SnapshotStore(str(tmp_path / "orders"))
    item_store = SnapshotStore(str(tmp_path / "items"))
    res = persist_batch(
        spark,
        raw,
        order_schema,
        "order",
        {"order": EntitySink(order_store), "item": EntitySink(item_store)},
    )
    assert res.persisted == {"order": 1, "item": 2}
    orders = {r["synced_id"]: r["total"] for r in order_store.read(spark).collect()}
    items = {r["synced_id"]: r["qty"] for r in item_store.read(spark).collect()}
    assert orders == {1: 42.0}
    assert items == {11: 2, 12: 3}

    # J4 reconciliation: a later aggregate listing only item 11 (with a
    # new qty) deletes the no-longer-present item 12
    env2 = _json.dumps(
        {
            "message": [
                {
                    "event": "order_updated",
                    "model_name": "Order",
                    "data": [
                        {
                            "id": 1,
                            "updated_at": "2024-01-02 10:00:00",
                            "total": 40.0,
                            "items": [{"id": 11, "qty": 5}],
                        }
                    ],
                }
            ]
        }
    )
    persist_batch(
        spark,
        spark.createDataFrame([(env2,)], "value STRING"),
        order_schema,
        "order",
        {"order": EntitySink(order_store), "item": EntitySink(item_store)},
    )
    items2 = {r["synced_id"]: r["qty"] for r in item_store.read(spark).collect()}
    assert items2 == {11: 5}


def test_multi_topic_runner(spark, tmp_path):
    """run_consumer_streams drives one independent query per declared
    topic from a ConsumerRegistry."""
    import json as _json

    from dionysus_rb_spark.registry import ConsumerRegistry, ConsumerTopicDecl
    from dionysus_rb_spark.streaming.pipeline import run_consumer_streams

    reg = ConsumerRegistry(namespace="v3")
    for name, entity in [("things", "thing"), ("gadgets", "gadget")]:
        reg.topic(ConsumerTopicDecl(name=name, entity=entity, schema=THING))

    base = tmp_path / "topics"
    for name, entity, n in [("v3_things", "thing", 3), ("v3_gadgets", "gadget", 2)]:
        d = base / name
        d.mkdir(parents=True)
        lines = [
            _json.dumps(
                {
                    "message": [
                        {
                            "event": f"{entity}_created",
                            "model_name": entity.capitalize(),
                            "data": [
                                {"id": i, "updated_at": "2024-01-01 10:00:00", "name": f"{entity}{i}"}
                            ],
                        }
                    ]
                }
            )
            for i in range(n)
        ]
        (d / "b.jsonl").write_text("\n".join(lines))

    stores = {
        "things": SnapshotStore(str(tmp_path / "things_store")),
        "gadgets": SnapshotStore(str(tmp_path / "gadgets_store")),
    }
    sinks = {
        "things": {"thing": EntitySink(stores["things"])},
        "gadgets": {"gadget": EntitySink(stores["gadgets"])},
    }
    queries = run_consumer_streams(
        spark, reg, str(base), str(tmp_path / "cp"), sinks, available_now=True
    )
    for q in queries.values():
        q.awaitTermination(120)
    assert stores["things"].read(spark).count() == 3
    assert stores["gadgets"].read(spark).count() == 2


def test_stream_applies_filters_and_transformation(spark, tmp_path):
    """Declared message filters divert poison rows before decode; the
    per-topic batch transformation reshapes the raw batch (here:
    dropping a marked prefix) — both hooks of the reference's consumer
    declaration, wired through the stream runner."""
    import json as _json

    from dionysus_rb_spark.registry import ConsumerRegistry, ConsumerTopicDecl
    from dionysus_rb_spark.streaming.pipeline import run_consumer_streams

    def env(i):
        return _json.dumps(
            {
                "message": [
                    {
                        "event": "thing_created",
                        "model_name": "Thing",
                        "data": [
                            {"id": i, "updated_at": "2024-01-01 10:00:00", "name": f"t{i}"}
                        ],
                    }
                ]
            }
        )

    d = tmp_path / "topics" / "v3_things"
    d.mkdir(parents=True)
    lines = [env(1), env(2), "POISON " + env(3), "SKIP:" + env(4)]
    (d / "b.jsonl").write_text("\n".join(lines))

    reg = ConsumerRegistry(namespace="v3")
    reg.topic(
        ConsumerTopicDecl(
            name="things",
            entity="thing",
            schema=THING,
            message_filters=(lambda df: F.col("value").startswith("POISON"),),
            batch_transformation=lambda df: df.withColumn(
                "value", F.regexp_replace("value", r"^SKIP:", "")
            ),
        )
    )
    store = SnapshotStore(str(tmp_path / "things_store"))
    dlq = SnapshotStore(str(tmp_path / "dlq"))

    # run_consumer_streams doesn't thread a DLQ; call the single-topic
    # runner directly to exercise filters + transformation + DLQ together
    from dionysus_rb_spark.streaming.pipeline import run_consumer_stream

    decl = reg.topics["things"]
    q = run_consumer_stream(
        spark,
        str(d),
        str(tmp_path / "cp"),
        decl.schema,
        decl.entity,
        {"thing": EntitySink(store)},
        dead_letter_store=dlq,
        available_now=True,
        batch_transformation=decl.batch_transformation,
        message_filters=decl.message_filters,
    )
    q.awaitTermination(120)

    ids = {r["synced_id"] for r in store.read(spark).collect()}
    assert ids == {1, 2, 4}  # 3 filtered to DLQ; 4 un-prefixed and kept
    assert dlq.read(spark).count() == 1


def test_outbox_drain_loop(spark):
    """The worker poll loop drains a topic in FIFO batches, stamps
    published_at, and leaves retry-parked + other-topic rows alone."""
    from datetime import datetime

    from dionysus_rb_spark.operators.outbox import drain_topic

    rows = []
    for i in range(250):
        rows.append((i, "clicks", datetime(2024, 1, 1, 10, 0, i % 60), None, None))
    rows.append((900, "clicks", datetime(2024, 1, 1, 9), None, datetime(2099, 1, 1)))
    rows.append((901, "views", datetime(2024, 1, 1, 9), None, None))
    ob = spark.createDataFrame(
        rows,
        "event_id LONG, topic STRING, created_at TIMESTAMP, "
        "published_at TIMESTAMP, retry_at TIMESTAMP",
    )
    import pyspark.sql.functions as F

    seen_batches = []
    final, cycles = drain_topic(
        ob,
        topic="clicks",
        batch_size=100,
        now=F.lit("2024-02-01 00:00:00").cast("timestamp"),
        pk="event_id",
        publish_fn=lambda b: seen_batches.append(b.count()),
    )
    assert cycles == 3 and seen_batches == [100, 100, 50]
    got = {r["event_id"]: r["published_at"] for r in final.collect()}
    assert sum(1 for v in got.values() if v is not None) == 250
    assert got[900] is None and got[901] is None  # parked + other topic


def test_backoff_matches_reference_golden_values(spark):
    """The literal table from exponential_backoff_spec.rb:
    backoff_for(multiplier=5, count=0..4) == 5, 10, 20, 40, 80."""
    from pyspark.sql import functions as F

    from dionysus_rb_spark.operators.outbox import retry_at_backoff

    df = spark.range(5).select(
        F.col("id").alias("count"),
        retry_at_backoff(F.col("id"), base_seconds=5).alias("backoff"),
    )
    got = {r["count"]: r["backoff"] for r in df.collect()}
    assert got == {0: 5, 1: 10, 2: 20, 3: 40, 4: 80}


def test_with_retries_backoff_and_give_up(spark):
    from dionysus_rb_spark.streaming.pipeline import with_retries

    calls = {"n": 0}

    def flaky(df, bid):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")

    with_retries(flaky, max_attempts=3, backoff_base_seconds=0.01)(None, 1)
    assert calls["n"] == 3  # two failures, one success

    dead = []

    def always_fails(df, bid):
        raise RuntimeError("poison")

    with_retries(
        always_fails,
        max_attempts=2,
        backoff_base_seconds=0.01,
        on_give_up=lambda df, bid, exc: dead.append((bid, str(exc))),
    )(None, 7)
    assert dead == [(7, "poison")]


def test_genesis_from_registry(spark, tmp_path):
    """Registry-driven genesis serializes the declared payload (attrs +
    to-one links) under the declared topic names."""
    import json as _json

    from dionysus_rb_spark.producer.genesis import genesis_from_registry
    from dionysus_rb_spark.registry import ProducerRegistry, PublicationDecl

    reg = ProducerRegistry(namespace="v3")
    reg.topic("rentals", genesis_replica=True)
    reg.publish(
        "rentals",
        PublicationDecl(
            resource="rental",
            attributes=("updated_at", "name"),
            to_one_links={"account": "account_id"},
        ),
    )
    df = spark.createDataFrame(
        [(1, "2024-01-05 00:00:00", "Villa", 10), (2, "2023-01-01 00:00:00", "Old", 20)],
        "id LONG, updated_at STRING, name STRING, account_id LONG",
    )
    res = genesis_from_registry(
        reg, "rentals", "rental", df, str(tmp_path),
        from_ts="2024-01-01 00:00:00", to_ts="2024-12-31 00:00:00",
    )
    assert res.n_rows == 1  # F5 window filters the 2023 row
    assert res.topics == ["v3_rentals", "v3_rentals_genesis"]
    line = next((tmp_path / "v3_rentals_genesis").glob("part-*")).read_text().strip()
    (msg,) = _json.loads(line)["message"]
    assert msg["event"] == "rental_updated" and msg["model_name"] == "Rental"
    (snap,) = msg["data"]
    assert snap == {
        "id": 1, "updated_at": "2024-01-05 00:00:00", "name": "Villa",
        "links": {"account": 10},
    }


def test_genesis_dependency_only_guard():
    import pytest

    with pytest.raises(ValueError, match="dependency-only"):
        genesis_stream(
            None,  # never touched: the guard fires first
            out_dir="/tmp/x",
            topic="fees",
            resource="fee",
            payload=None,
            dependency_only=True,
        )


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Streaming session_window sessionization emits exactly the
    sessions the same operator computes in batch over the same events —
    watermark-driven finalization changes WHEN sessions appear, never
    WHAT they contain."""
    from dionysus_rb_spark.streaming.sessionize import sessionize

    inp = tmp_path / "sess"
    inp.mkdir()
    # user 1: two sessions (09:00-09:10, then a >30min gap, 10:00);
    # user 2: one 3-event session straddling the two micro-batches
    batch1 = [
        {"user_id": 1, "ts": "2024-01-01 09:00:00"},
        {"user_id": 1, "ts": "2024-01-01 09:10:00"},
        {"user_id": 2, "ts": "2024-01-01 09:05:00"},
        {"user_id": 2, "ts": "2024-01-01 09:20:00"},
    ]
    batch2 = [
        {"user_id": 2, "ts": "2024-01-01 09:40:00"},
        {"user_id": 1, "ts": "2024-01-01 10:00:00"},
        # watermark pusher: far-future event finalizes everything above
        # (its own still-open session is the only one not emitted)
        {"user_id": 99, "ts": "2024-01-02 00:00:00"},
    ]
    (inp / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in batch1))
    (inp / "b2.jsonl").write_text("\n".join(json.dumps(r) for r in batch2))

    schema = "user_id LONG, ts STRING"
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        sessionize(src, ["user_id"], "ts", gap="30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }

    batch_df = (
        spark.read.schema(schema)
        .json(str(inp))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    want = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in sessionize(batch_df, ["user_id"], "ts", gap="30 minutes").collect()
        if r["user_id"] != 99  # watermark pusher's session never closes
    }
    assert want  # the batch reference actually produced sessions
    assert got == want
    # the cross-batch session merged into one row
    assert any(u == 2 and n == 3 for (u, _, _, n) in got)


def test_sessionize_stream_matches_lag_cumsum_on_subsecond_gaps(spark, tmp_path):
    """CROSS-IMPLEMENTATION parity (VERDICT r5 item 6): the streaming
    session_window path must agree with ev_sessionize's lag+cumsum batch
    plan on timestamps where SECOND-TRUNCATION flips the verdict — the
    exact bug class round 5 fixed in batch (ts.cast('long') truncated
    before differencing), which a future streaming refactor could
    reintroduce. Fixture:
      - user 1: gap 1800.4s (09:00:00.200 -> 09:30:00.600) — truncated
        longs differ by exactly 1800 and would MERGE; true micros split.
      - user 2: gap 1799.6s (09:00:00.600 -> 09:30:00.200) — must merge.
    Exact-1800.000000 gaps are excluded by construction: there the two
    shapes genuinely differ (batch splits only on gap > 30min strictly;
    session_window's end is exclusive), and micro-exact gaps are
    measure-zero on event data."""
    from pyspark.sql import Window

    from dionysus_rb_spark.streaming.sessionize import sessionize

    inp = tmp_path / "subsec"
    inp.mkdir()
    rows = [
        {"user_id": 1, "ts": "2024-01-01 09:00:00.200"},
        {"user_id": 1, "ts": "2024-01-01 09:30:00.600"},
        {"user_id": 2, "ts": "2024-01-01 09:00:00.600"},
        {"user_id": 2, "ts": "2024-01-01 09:30:00.200"},
        # watermark pusher: finalizes every session above in append mode
        {"user_id": 99, "ts": "2024-01-02 00:00:00"},
    ]
    (inp / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in rows))

    schema = "user_id LONG, ts STRING"
    src = (
        spark.readStream.schema(schema)
        .json(str(inp))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        sessionize(src, ["user_id"], "ts", gap="30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_subsec")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.sql("SELECT * FROM sess_subsec").collect()
    }

    # ev_sessionize's exact plan shape (queries_text.py:281-301),
    # inlined so the certified query stays untouched: lag + cumulative
    # sum over unix_micros — NOT cast('long'), which truncates to whole
    # seconds before differencing.
    ev = (
        spark.read.schema(schema)
        .json(str(inp))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    cum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    sess = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(cum))
    want = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .collect()
        if r["user_id"] != 99  # pusher's own session never closes
    }
    assert got == want
    # and the verdicts are the truncation-sensitive ones:
    assert sum(1 for (u, _, _, _) in got if u == 1) == 2  # 1800.4s split
    assert sum(1 for (u, _, _, _) in got if u == 2) == 1  # 1799.6s merged


def test_streaming_near_dup_gate_matches_batch(spark, tmp_path):
    """The MinHash band gate flags the same incoming docs in a stream
    (stream-static semi join) as in batch, and near-identical docs ARE
    flagged while fresh docs are not."""
    from dionysus_rb_spark.streaming.neardup_stream import near_dup_gate

    index_rows = [
        {"doc_id": 100, "text": "the quick brown fox jumps over the lazy dog again and again"},
        {"doc_id": 101, "text": "pack my box with five dozen liquor jugs before noon today"},
    ]
    stream_rows = [
        # near-copy of 100 (one word changed) -> must collide
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy cat again and again"},
        # exact copy of 101 -> must collide
        {"doc_id": 2, "text": "pack my box with five dozen liquor jugs before noon today"},
        # unrelated -> must pass
        {"doc_id": 3, "text": "completely unrelated sentence about distributed query engines"},
    ]
    inp = tmp_path / "nd"
    inp.mkdir()
    (inp / "s.jsonl").write_text("\n".join(json.dumps(r) for r in stream_rows))
    index = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in index_rows], "doc_id LONG, text STRING"
    )

    schema = "doc_id LONG, text STRING"
    src = spark.readStream.schema(schema).json(str(inp))
    q = (
        near_dup_gate(src, index)
        .writeStream.format("memory")
        .queryName("nd_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp_nd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM nd_out").collect())

    batch = spark.read.schema(schema).json(str(inp))
    want = sorted(
        r["doc_id"] for r in near_dup_gate(batch, index).collect()
    )
    assert got == want
    assert 2 in got and 3 not in got  # exact copy caught, fresh doc passes
    # the equi-join (corpus-sized index) shape agrees after dedup
    eq = sorted(
        {r["doc_id"] for r in near_dup_gate(batch, index, broadcast_index=False).collect()}
    )
    assert eq == want
    # explicit broadcast shape agrees with the auto default (which picks
    # broadcast here: 2-doc index is far under BROADCAST_INDEX_MAX_KEYS)
    bc = sorted(
        r["doc_id"] for r in near_dup_gate(batch, index, broadcast_index=True).collect()
    )
    assert bc == want
    # force the auto gate over the ceiling -> it must route to the
    # exploded equi-join and still flag the same docs
    import dionysus_rb_spark.streaming.neardup_stream as nd

    old = nd.BROADCAST_INDEX_MAX_KEYS
    try:
        nd.BROADCAST_INDEX_MAX_KEYS = 0
        auto_big = sorted({r["doc_id"] for r in near_dup_gate(batch, index).collect()})
    finally:
        nd.BROADCAST_INDEX_MAX_KEYS = old
    assert auto_big == want


def test_streaming_bloom_accumulation_equals_batch(spark, tmp_path):
    """The portable Bloom is mergeable with plain bitwise OR, so a
    stream can grow the decontamination index per micro-batch and land
    exactly where a batch build over all data lands — no approximation
    drift from incremental construction."""
    import pyspark.sql.functions as F2

    from dionysus_rb_spark.operators.sketch import BLOOM_WORDS, bloom_build

    inp = tmp_path / "bl"
    inp.mkdir()
    rows1 = [{"doc_id": i, "text": f"document number {i} about topic {i % 7}"} for i in range(20)]
    rows2 = [{"doc_id": i, "text": f"document number {i} about topic {i % 7}"} for i in range(20, 45)]
    (inp / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in rows1))
    (inp / "b2.jsonl").write_text("\n".join(json.dumps(r) for r in rows2))

    state = {"words": [0] * BLOOM_WORDS, "batches": 0}

    def merge_batch(df, batch_id):
        row = bloom_build(df, F2.col("text")).collect()
        if row:  # empty micro-batch -> nothing to merge
            state["words"] = [
                a | b for a, b in zip(state["words"], row[0]["words"])
            ]
            state["batches"] += 1

    src = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        src.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "cp_bl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert state["batches"] == 2  # incremental construction actually happened

    batch_df = spark.read.schema("doc_id LONG, text STRING").json(str(inp))
    want = bloom_build(batch_df, F2.col("text")).collect()[0]["words"]
    assert state["words"] == list(want)
    assert any(w != 0 for w in want)  # the filter is non-trivial
