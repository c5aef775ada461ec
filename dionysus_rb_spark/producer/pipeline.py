"""Producer pipeline: change log -> events -> wire records -> event log.

The composed batch path of SURVEY §3.1 (the reference's AR-callback ->
outbox -> responder -> Kafka chain), set-wise: F2 soft-delete
classification over pre/post images, per-action responder serialization
(P1-P7 via the registry), and an ordered write to the local event-log
directory (the Kafka stand-in — swap the writer for
``write.format("kafka")`` on a cluster; ordering then comes from the
partition key instead of file mtimes).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.events import classify_soft_delete
from ..registry import ProducerRegistry


@dataclass
class PublishResult:
    n_events: int
    by_action: dict[str, int]
    topic_dir: str


def classify_changelog(
    changelog: DataFrame,
    id_col: str = "id",
    seq_col: str = "seq",
    canceled_col: str | None = "canceled_at",
) -> DataFrame:
    """F2 over a versioned change log: lag() rebuilds the pre-image per
    key (publishable.rb:34-68's previous_changes), first-seen rows are
    creates, canceled-state transitions become created/destroyed, and
    suppressed transitions drop. Adds an ``action`` column."""
    w = Window.partitionBy(id_col).orderBy(seq_col)
    canceled = (
        F.col(canceled_col).cast("timestamp")
        if canceled_col
        else F.lit(None).cast("timestamp")
    )
    out = (
        changelog.withColumn("__prev_canceled", F.lag(canceled).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "action",
            classify_soft_delete(
                F.col("__prev_canceled"), canceled, F.col("__rn") == 1
            ),
        )
        .drop("__prev_canceled", "__rn")
    )
    return out.filter(F.col("action").isNotNull())


def publish_changelog(
    registry: ProducerRegistry,
    topic: str,
    resource: str,
    changelog: DataFrame,
    out_dir: str,
    id_col: str = "id",
    seq_col: str = "seq",
    canceled_col: str | None = "canceled_at",
) -> PublishResult:
    """Classify + serialize + write one resource's change log to its
    topic directory, one file per event in commit order (the filename
    encodes the sequence and the mtime re-encodes it for mtime-ordered
    file sources — the file-sink twin of Kafka per-partition order).
    Returns publish counts per action.

    The write is EXECUTOR-SIDE (``foreachPartition``): serialized events
    are never collected to the driver, so the publish path scales with
    the cluster, not the driver — the production sink is the Kafka
    ``writeStream`` in streaming/pipeline.py; this file twin keeps the
    same distributed shape (per-partition writers, seq-derived names)
    against a shared filesystem."""
    classified = classify_changelog(changelog, id_col, seq_col, canceled_col)
    respond = registry.responder(topic, resource)

    decl = registry.topics[topic]
    topic_dir = os.path.join(out_dir, decl.primary)
    os.makedirs(topic_dir, exist_ok=True)

    frames = [
        respond(
            action, classified.filter(F.col("action") == action), keep_cols=(seq_col,)
        ).select(
            F.lit(action).alias("__action"),
            F.col(seq_col).cast("long").alias("__seq"),
            "value",
        )
        for action in ("created", "updated", "destroyed")
    ]
    events = frames[0].unionAll(frames[1]).unionAll(frames[2])
    from pyspark.storagelevel import StorageLevel

    events = events.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        counts = {
            r["__action"]: r["n"]
            for r in events.groupBy("__action").agg(F.count("*").alias("n")).collect()
        }
        by_action = {
            a: int(counts.get(a, 0)) for a in ("created", "updated", "destroyed")
        }

        def _write_partition(rows):
            import os as _os

            for r in rows:
                p = _os.path.join(topic_dir, f"{int(r['__seq']):08d}.jsonl")
                with open(p, "w") as f:
                    f.write(r["value"] + "\n")
                t = 1_700_000_000 + int(r["__seq"])
                _os.utime(p, (t, t))

        events.select("__seq", "value").foreachPartition(_write_partition)
    finally:
        events.unpersist()
    total = sum(by_action.values())
    return PublishResult(n_events=total, by_action=by_action, topic_dir=topic_dir)


def publish_observer_updates(
    registry: ProducerRegistry,
    model: str,
    changed: DataFrame,
    changed_cols: set[str],
    association_tables: dict[str, list[tuple[DataFrame, str, str]]],
) -> list[tuple[str, DataFrame]]:
    """J3 derived publishing (outbox/publisher.rb:41-61 + producer.rb:
    101-120): when ``model`` rows change any watched attribute, the
    associated records republish as ``{resource}_updated``.

    ``association_tables[assoc_name]`` supplies the join hops for that
    observer's association chain (each ``(table, left_col, right_col)``).
    Returns ``[(topic, key-frame with an 'event' column), …]`` — feed
    each frame to the topic's responder. The observed-change side is the
    small one per batch; hop joins are left to AQE (it broadcasts a hop
    at runtime when it is actually small — callers who KNOW every hop
    is a bounded dimension can pass broadcast_hops=True to the resolver
    themselves).
    """
    out: list[tuple[str, DataFrame]] = []
    for topic_decl, pub, ob in registry.observers_for(model, changed_cols):
        hops = association_tables[ob.association_name]
        resolved = registry.resolve_association_chain(changed, hops)
        # the associated resource's id = the last hop's join value (the
        # resolver drops the right-side key; the left column equals it)
        last_left_col = hops[-1][1]
        frame = (
            resolved.select(
                F.col(f"__l{len(hops) - 1}.{last_left_col}").alias(pub.id_col)
            )
            .distinct()
            .withColumn("event", F.lit(f"{pub.resource}_updated"))
        )
        out.append((topic_decl.primary, frame))
    return out
