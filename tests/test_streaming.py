"""End-to-end Structured Streaming tests: envelope files -> checkpointed
foreachBatch persist -> snapshot store state, mirroring the reference's
behavioral consumer specs (FIXTURES.md §6 scenarios 1-5)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import StringType, LongType, StructField, StructType

from dionysus_rb_spark.consumer.persistor import EntitySink, persist_batch
from dionysus_rb_spark.streaming.pipeline import run_consumer_stream
from dionysus_rb_spark.streaming.snapshot_store import SnapshotStore

THING = StructType(
    [
        StructField("id", LongType()),
        StructField("updated_at", StringType()),
        StructField("canceled_at", StringType()),
        StructField("name", StringType()),
    ]
)


def _env(event: str, **attrs) -> str:
    return json.dumps(
        {"message": [{"event": event, "model_name": "Thing", "data": [attrs]}]}
    )


FILE1 = [
    _env("thing_created", id=1, updated_at="2024-01-01 10:00:00", name="A"),
    _env("thing_created", id=2, updated_at="2024-01-01 10:00:00", name="B"),
]
FILE2 = [
    _env("thing_updated", id=1, updated_at="2024-01-02 10:00:00", name="A2"),
    # stale update: older than both the stored row and the in-batch winner
    _env("thing_updated", id=1, updated_at="2023-12-01 10:00:00", name="OLD"),
    # soft destroy: canceled_at present => cancel; the payload's attrs
    # persist (assign_attributes precedes the destroy branch,
    # persistor.rb:64) — destroy envelopes serialize the full record
    _env(
        "thing_destroyed", id=2, updated_at="2024-01-02 11:00:00", name="B-final",
        canceled_at="2024-01-02 11:00:00",
    ),
    _env("thing_updated", id=3, updated_at="2024-01-02 12:00:00", name="C"),
    # unknown event name: dropped + dead-lettered (F8/T9)
    _env("thing_frobbed", id=4, updated_at="2024-01-02 13:00:00", name="X"),
]


@pytest.fixture()
def stream_env(tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "batch1.jsonl").write_text("\n".join(FILE1) + "\n")
    (inp / "batch2.jsonl").write_text("\n".join(FILE2) + "\n")
    return {
        "input": str(inp),
        "checkpoint": str(tmp_path / "cp"),
        "store": SnapshotStore(str(tmp_path / "things")),
        "dlq": SnapshotStore(str(tmp_path / "dlq")),
    }


def _final_state(spark, store):
    df = store.read(spark)
    return {r["synced_id"]: r.asDict() for r in df.collect()}


def test_consumer_stream_end_to_end(spark, stream_env):
    q = run_consumer_stream(
        spark,
        stream_env["input"],
        stream_env["checkpoint"],
        THING,
        "thing",
        {"thing": EntitySink(SnapshotStore(stream_env["store"].path))},
        dead_letter_store=stream_env["dlq"],
        available_now=True,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    state = _final_state(spark, stream_env["store"])
    assert set(state) == {1, 2, 3}
    assert state[1]["name"] == "A2"  # newest applied, stale rejected
    assert state[2]["synced_canceled_at"] is not None  # soft destroy
    assert state[2]["name"] == "B-final"  # payload attrs persist on soft destroy
    assert state[3]["name"] == "C"  # update of unseen key inserts
    # dead letter captured the unknown event
    dlq = stream_env["dlq"].read(spark)
    assert dlq.count() == 1 and dlq.collect()[0]["event"] == "thing_frobbed"


def test_restart_is_noop_and_replay_idempotent(spark, stream_env, tmp_path):
    def run(checkpoint):
        q = run_consumer_stream(
            spark,
            stream_env["input"],
            checkpoint,
            THING,
            "thing",
            {"thing": EntitySink(SnapshotStore(stream_env["store"].path))},
            available_now=True,
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)

    run(stream_env["checkpoint"])
    s1 = _final_state(spark, stream_env["store"])
    # restart on same checkpoint: nothing new -> state unchanged
    run(stream_env["checkpoint"])
    assert _final_state(spark, stream_env["store"]) == s1
    # full replay on a fresh checkpoint against existing state (T1
    # at-least-once): MERGE idempotency keeps the state identical
    run(str(tmp_path / "cp2"))
    assert _final_state(spark, stream_env["store"]) == s1


def test_midrun_crash_resumes_from_checkpoint(spark, stream_env):
    """T1 crash-recovery, the case restart-noop can't see: the query
    dies BETWEEN micro-batches (batch 0 committed, batch 1 not), and a
    restart from the same checkpoint must resume at the failed batch
    and land the exact same snapshot a crash-free run produces. On a
    real cluster this is driver loss mid-backfill — the steady state,
    not an edge case (the batch-side twin is
    tools/validation/task_retry_chaos.py)."""
    calls = [0]

    def crashing(df):
        calls[0] += 1
        if calls[0] == 2:
            raise RuntimeError("chaos: crash before second micro-batch persists")
        return df

    def run(hook, expect_crash):
        q = run_consumer_stream(
            spark,
            stream_env["input"],
            stream_env["checkpoint"],
            THING,
            "thing",
            {"thing": EntitySink(SnapshotStore(stream_env["store"].path))},
            batch_transformation=hook,
            available_now=True,
            max_files_per_trigger=1,
        )
        if expect_crash:
            try:
                q.awaitTermination(120)
            except Exception:
                pass  # the crashing run fails its query, by design
        else:
            # un-swallowed, and the True return proves the query FINISHED
            # (a 120s timeout would read the snapshot mid-flight)
            assert q.awaitTermination(120) is True
        return q

    q1 = run(crashing, expect_crash=True)
    assert q1.exception() is not None, "injected crash did not surface"
    # partial progress is real: batch 0 (creates) committed, batch 1 not
    mid = _final_state(spark, stream_env["store"])
    assert set(mid) == {1, 2} and mid[1]["name"] == "A"

    q2 = run(None, expect_crash=False)
    assert q2.exception() is None
    state = _final_state(spark, stream_env["store"])
    assert set(state) == {1, 2, 3}
    assert state[1]["name"] == "A2"  # batch 1 landed on resume
    assert state[2]["synced_canceled_at"] is not None
    assert state[3]["name"] == "C"


def test_keep_latest_stream_stateful(spark, tmp_path):
    from dionysus_rb_spark.streaming.dedup_stream import keep_latest_stream

    inp = tmp_path / "ev"
    inp.mkdir()
    rows1 = [
        {"user_id": 1, "ts": "2024-01-01 10:00:00", "v": 1.0},
        {"user_id": 1, "ts": "2024-01-01 11:00:00", "v": 2.0},
        {"user_id": 2, "ts": "2024-01-01 10:00:00", "v": 3.0},
    ]
    rows2 = [
        {"user_id": 1, "ts": "2024-01-01 09:00:00", "v": 9.0},  # late, loses
        {"user_id": 2, "ts": "2024-01-02 10:00:00", "v": 4.0},  # new winner
    ]
    (inp / "f1.jsonl").write_text("\n".join(json.dumps(r) for r in rows1))
    (inp / "f2.jsonl").write_text("\n".join(json.dumps(r) for r in rows2))

    schema = "user_id LONG, ts STRING, v DOUBLE"
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = keep_latest_stream(src, ["user_id"], "ts")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = spark.sql("SELECT * FROM dedup_out").collect()
    # final winner per key must have been emitted
    winners = {(1, 2.0), (2, 4.0)}
    assert winners <= {(r["user_id"], r["v"]) for r in emitted}
    # the late row for key 1 must NOT win (no emission with v=9.0)
    assert all(r["v"] != 9.0 for r in emitted)
