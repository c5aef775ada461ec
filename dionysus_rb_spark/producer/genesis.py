"""Genesis backfill — batch re-stream of history into the event log
(SURVEY §2.10 T6; ref lib/dionysus/producer/genesis.rb,
genesis/streamer.rb, genesis/streamer/base_job.rb).

The reference pages a table with Sidekiq jobs spread over hours; on
Spark the same operation is one batch pipeline: filtered scan (F5-F7) →
aggregate serialization (P1-P7) → envelope encode → event-log sink,
with batching expressed as output file count (O4/G3: ids sorted, fixed
rows per batch) and rate control delegated to the consumer's trigger
(``maxFilesPerTrigger`` / ``Trigger.AvailableNow`` — T6's time-spread
enqueue becomes backpressure, which scales instead of sleeping).

The local sink is a directory of JSONL "topics" (the container has no
Kafka broker); on a cluster the same ``value`` column goes to
``write.format("kafka")`` unchanged.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.inflect import classify
from ..sources.envelope import encode_envelope


@dataclass
class GenesisResult:
    n_rows: int
    n_batches: int
    topics: list[str]


def genesis_scan(
    df: DataFrame,
    updated_col: str = "updated_at",
    from_ts: str | None = None,
    to_ts: str | None = None,
    canceled_col: str | None = None,
    conditions: dict[str, object] | None = None,
) -> DataFrame:
    """F5/F6/F7 composed (streamer.rb:28-52): time window on
    ``updated_col``, soft-delete visibility, arbitrary equality
    conjunction — all pushable to the source scan."""
    if from_ts is not None and to_ts is not None:
        df = df.filter(F.col(updated_col).between(from_ts, to_ts))
    if canceled_col is not None:
        df = df.filter(F.col(canceled_col).isNull())
    for attr, value in (conditions or {}).items():
        df = df.filter(F.col(attr) == value)
    return df


def genesis_stream(
    df: DataFrame,
    out_dir: str,
    topic: str,
    resource: str,
    payload: Column,
    id_col: str = "id",
    batch_size: int = 1000,
    genesis_replica: bool = True,
    genesis_only: bool = False,
    dependency_only: bool = False,
) -> GenesisResult:
    """Re-publish ``df`` (already genesis_scan-filtered) as
    ``{resource}_updated`` envelopes into ``{out_dir}/{topic}`` and/or
    its ``_genesis`` twin (S5; registry.rb:63-76).

    ``payload`` is the snapshot struct column (build with
    producer.serializer.serialize_aggregate for sideloads). Batching:
    ids sorted (O4, base_job.rb:23), ``ceil(n/batch_size)`` range
    partitions (G3) — one output file per batch, so the consumer's
    ``maxFilesPerTrigger=1`` replays exactly one genesis batch per
    micro-batch.

    Raises on dependency-only models (genesis.rb:25-30): records that
    only ride inside parent aggregates have no topic of their own.
    """
    if dependency_only:
        raise ValueError(
            f"cannot stream genesis for dependency-only resource {resource!r} "
            "(it has no topic; re-stream its parents instead)"
        )
    n_rows = df.count()
    n_batches = max(1, math.ceil(n_rows / batch_size))

    enveloped = encode_envelope(
        df.withColumn("__payload", payload).withColumn("__id", F.col(id_col)),
        event=F.lit(f"{resource}_updated"),
        model_name=F.lit(classify(resource)),
        data=F.array(F.col("__payload")),
        key=F.concat(
            F.lit(classify(resource) + ":"), F.col(id_col).cast("string")
        ),
        keep_cols=("__id",),
    )

    # one file per batch, rows id-ordered within and across batches
    batched = (
        enveloped.repartitionByRange(n_batches, "__id")
        .sortWithinPartitions("__id")
        .select("value")
    )

    topics = []
    if not genesis_only:
        topics.append(topic)
    if genesis_replica or genesis_only:
        topics.append(f"{topic}_genesis")
    for t in topics:
        batched.write.mode("overwrite").text(f"{out_dir}/{t}")
    return GenesisResult(n_rows=n_rows, n_batches=n_batches, topics=topics)


def genesis_from_registry(
    registry,
    topic: str,
    resource: str,
    df,
    out_dir: str,
    from_ts: str | None = None,
    to_ts: str | None = None,
    canceled_col: str | None = None,
    conditions: dict | None = None,
    batch_size: int = 1000,
) -> GenesisResult:
    """Genesis driven by a producer declaration (genesis.rb:11-16's
    public API): payload and topic naming come from the registry's
    PublicationDecl — attributes + to-one links, serialized exactly as
    the live responder would. Dependency-only resources are refused."""
    from pyspark.sql import functions as F

    decl = registry.topics[topic]
    pub = next(p for p in decl.publications if p.resource == resource)
    scanned = genesis_scan(
        df,
        updated_col="updated_at",
        from_ts=from_ts,
        to_ts=to_ts,
        canceled_col=canceled_col,
        conditions=conditions,
    )
    payload_fields = [F.col(pub.id_col).alias("id")] + [
        F.col(a) for a in pub.attributes if a != pub.id_col
    ]
    if pub.to_one_links:
        payload_fields.append(
            F.struct(
                *[F.col(c).alias(n) for n, c in pub.to_one_links.items()]
            ).alias("links")
        )
    return genesis_stream(
        scanned,
        out_dir=out_dir,
        topic=decl.primary,
        resource=resource,
        payload=F.struct(*payload_fields),
        id_col=pub.id_col,
        batch_size=batch_size,
        genesis_replica=decl.genesis_replica,
    )
