"""Full-cycle CDC integration: a change log with pre/post images flows
through the producer (F2 soft-delete classification -> registry
responder -> envelope) into files, then through the streaming consumer
(D1-D7 + guarded MERGE) — the final snapshot must equal the source
table's visible end state. This is the engine's analogue of the
reference's spec/integration_spec.rb produce->consume roundtrip."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from dionysus_rb_spark.consumer.persistor import EntitySink
from dionysus_rb_spark.operators.events import classify_soft_delete
from dionysus_rb_spark.registry import ProducerRegistry, PublicationDecl
from dionysus_rb_spark.streaming.pipeline import run_consumer_stream
from dionysus_rb_spark.streaming.snapshot_store import BucketedSnapshotStore

RENTAL = StructType(
    [
        StructField("id", LongType()),
        StructField("updated_at", StringType()),
        StructField("canceled_at", StringType()),
        StructField("price", DoubleType()),
        StructField("account_id", LongType()),
    ]
)

# change log rows: (seq, id, price, canceled_at, account_id) — seq is the
# commit order; canceled transitions drive the F2 state machine
CHANGELOG = [
    (1, 1, 100.0, None, 10),       # create 1
    (2, 2, 200.0, None, 20),       # create 2
    (3, 1, 110.0, None, 10),       # update 1
    (4, 2, 200.0, "2024-01-04 00:00:00", 20),  # soft-delete 2
    (5, 3, 300.0, None, 30),       # create 3
    (6, 2, 200.0, None, 20),       # restore 2 -> created again
    (7, 3, 310.0, None, 30),       # update 3
    (8, 1, 100.0, "2024-01-08 00:00:00", 10),  # soft-delete 1
]


def test_cdc_full_roundtrip(spark, tmp_path):
    log = spark.createDataFrame(
        CHANGELOG, "seq LONG, id LONG, price DOUBLE, canceled_at STRING, account_id LONG"
    ).withColumn(
        "updated_at",
        F.date_format(
            F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_dt_interval(days=F.col("seq")),
            "yyyy-MM-dd HH:mm:ss",
        ),
    )

    # --- producer: derive events from pre/post images (F2) ---------------
    w = Window.partitionBy("id").orderBy("seq")
    classified = (
        log.withColumn("prev_canceled", F.lag("canceled_at").over(w))
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "action",
            classify_soft_delete(
                F.col("prev_canceled").cast("timestamp"),
                F.col("canceled_at").cast("timestamp"),
                F.col("rn") == 1,
            ),
        )
        .filter(F.col("action").isNotNull())
    )

    reg = ProducerRegistry(namespace="v3")
    reg.topic("rentals", partition_key="account_id")
    reg.publish(
        "rentals",
        PublicationDecl(
            resource="rental",
            attributes=("updated_at", "canceled_at", "price", "account_id"),
        ),
    )
    respond = reg.responder("rentals", "rental")

    out_dir = tmp_path / "topics" / "v3_rentals"
    out_dir.mkdir(parents=True)
    # events must replay in commit order; one file per action batch keeps
    # per-key ordering (seq asc within and across files)
    for action in ["created", "updated", "destroyed"]:
        part = classified.filter(F.col("action") == action)
        if part.count() == 0:
            continue
        # one file per event, named by seq, so the consumer's
        # maxFilesPerTrigger=1 replays the exact commit order
        rows = (
            respond(action, part).join(
                part.select(F.col("id").alias("__rid"), "seq"),
                F.expr("key = concat('Rental:', cast(__rid as string))"),
            )
            .select("seq", "value")
            .collect()
        )
        for r in rows:
            p = out_dir / f"{r['seq']:05d}.jsonl"
            p.write_text(r["value"] + "\n")
            # FileStreamSource orders by modification time, not name: pin
            # mtime to the commit seq so replay preserves the log order
            # (the file-source stand-in for Kafka's per-partition order)
            import os

            t = 1_700_000_000 + int(r["seq"])
            os.utime(p, (t, t))

    # --- consumer: stream the files in order into the bucketed store -----
    store = BucketedSnapshotStore(str(tmp_path / "rentals_store"), num_buckets=4)
    q = run_consumer_stream(
        spark,
        str(out_dir),
        str(tmp_path / "cp"),
        RENTAL,
        "rental",
        {"rental": EntitySink(store)},
        available_now=True,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    # --- verify: snapshot == source-of-truth end state --------------------
    got = {
        r["synced_id"]: (r["price"], r["synced_canceled_at"] is not None)
        for r in store.read(spark).collect()
    }
    # end state: 1 canceled (soft destroy keeps its last attrs: price 110
    # from seq 3 — synchronizable_model.rb:44-50), 2 restored @200, 3 live @310
    assert got[1] == (110.0, True)
    assert got[2] == (200.0, False)
    assert got[3] == (310.0, False)
    # partition keys routed by account_id
    sample = respond("updated", classified.filter(F.col("id") == 1).limit(1))
    assert sample.collect()[0]["partition_key"] == "10"


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])
