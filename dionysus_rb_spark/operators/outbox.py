"""Outbox-pattern operators (SURVEY §2.1 S2/S3, §2.4 F10, §2.9 backoff).

The reference's transactional outbox (lib/dionysus/producer/outbox/model.rb)
is a relational table drained by a polling worker. In Spark the streaming
checkpoint replaces the outbox as the source of truth, but the *queries*
over an outbox-shaped table remain useful (drain scans, pending-topic
discovery, latency SLOs) and are implemented here as declarative
transforms: Catalyst pushes the filters into the scan and `ORDER BY ..
LIMIT n` executes as TakeOrderedAndProject (no global sort at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lineage import truncate_lineage


def publishable_scan(
    outbox: DataFrame,
    topic: str | None,
    batch_size: int,
    now: Column,
    published_at: str = "published_at",
    retry_at: str = "retry_at",
    created_at: str = "created_at",
    order_tiebreak: str | None = None,
    publishing_delay_seconds: int = 0,
) -> DataFrame:
    """S2: the outbox drain query.

    ref model.rb:15-26: ``published_at IS NULL AND topic = ? AND
    (retry_at IS NULL OR retry_at <= now) ORDER BY created_at LIMIT n``.

    F10 publishing-delay gate (model.rb:22-24, README.md:422-430): only
    rows older than the configured delay are drained. (The reference's
    predicate as written — created_at <= now + delay — is a no-op bug;
    we implement the documented intent: created_at <= now - delay.)

    ``order_tiebreak`` (e.g. the outbox pk) makes LIMIT deterministic —
    the reference relies on serial pk assignment for that.

    A NULL ``created_at`` sorts LAST (explicitly: Spark's bare asc is
    NULLS FIRST, DuckDB's is NULLS LAST — the round-7 adversarial
    events fuzz caught the twin divergence in o2): a row whose creation
    time is unknown is treated as "just created" (the same "missing
    timestamp = now" reading as dedup.keep_latest), so it drains after
    every timestamped row.
    """
    df = outbox.filter(F.col(published_at).isNull())
    if topic is not None:
        df = df.filter(F.col("topic") == topic)
    df = df.filter(F.col(retry_at).isNull() | (F.col(retry_at) <= now))
    if publishing_delay_seconds:
        df = df.filter(
            F.col(created_at) <= now - F.expr(f"INTERVAL {publishing_delay_seconds} SECOND")
        )
    order = [F.col(created_at).asc_nulls_last()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    return df.orderBy(*order).limit(batch_size)


def pending_topics(outbox: DataFrame, published_at: str = "published_at") -> DataFrame:
    """S3/G2: ``SELECT DISTINCT topic WHERE published_at IS NULL``
    (ref model.rb:32-34). Partial (map-side) aggregation makes this a
    near-free scan at scale."""
    return outbox.filter(F.col(published_at).isNull()).select("topic").distinct()


def retry_at_backoff(attempts: Column, base_seconds: int = 5) -> Column:
    """Exponential backoff ``base * 2^attempts`` seconds, as a column.

    ref lib/dionysus/utils/exponential_backoff.rb:4-6 applied at
    model.rb:69-78 (failure marks failed_at/attempts and schedules
    retry_at = now + backoff).
    """
    return (F.lit(base_seconds) * F.pow(F.lit(2), attempts)).cast("long")


def mark_published(
    outbox: DataFrame,
    published_keys: DataFrame,
    now: Column,
    pk: str,
    published_at: str = "published_at",
) -> DataFrame:
    """T1 bookkeeping: stamp ``published_at`` on the drained rows
    (ref records_processor.rb:51-55 ``update_all(published_at:)``) —
    a broadcast semi-membership join on the outbox pk."""
    hit = F.broadcast(published_keys.select(F.col(pk).alias("__pub_pk")))
    joined = outbox.join(hit, outbox[pk] == F.col("__pub_pk"), "left")
    return joined.withColumn(
        published_at,
        F.when(F.col("__pub_pk").isNotNull(), now).otherwise(F.col(published_at)),
    ).drop("__pub_pk")


def drain_topic(
    outbox: DataFrame,
    topic: str,
    batch_size: int,
    now: Column,
    pk: str,
    publish_fn=None,
    max_cycles: int = 1000,
) -> tuple[DataFrame, int]:
    """The outbox worker poll loop (runner.rb:15-35 + records_processor
    .rb:11-27) as repeated set-wise cycles: scan a FIFO batch, hand it to
    ``publish_fn`` (the responder/sink), stamp it published; repeat until
    the topic drains. Returns (final outbox state, cycles run).

    The driver-side loop is bounded (ceil(pending/batch_size) cycles) and
    each cycle is a distributed job — this is the batch-mode stand-in for
    the streaming path, where the checkpoint replaces all of it.
    """
    cycles = 0
    owned = None  # only frames THIS loop materialized may be superseded:
    # the caller's input (even one that came from truncate_lineage) is
    # not ours to delete
    for _ in range(max_cycles):
        batch = publishable_scan(
            outbox, topic, batch_size, now, order_tiebreak=pk
        )
        rows = batch.cache()
        try:
            if rows.count() == 0:
                break
            if publish_fn is not None:
                publish_fn(rows)
            outbox = mark_published(outbox, rows.select(pk), now, pk)
            # materialize the new state so the next scan sees it (and the
            # lineage doesn't stack one join per cycle); reliable, so a
            # mid-drain executor loss re-reads prior cycles' state from
            # storage instead of aborting, and each cycle's files replace
            # the previous cycle's (operators/lineage.py)
            outbox = truncate_lineage(outbox, supersedes=owned)
            owned = outbox
            cycles += 1
        finally:
            rows.unpersist()
    return outbox, cycles


def mark_failed(
    outbox: DataFrame,
    now: Column,
    base_seconds: int = 5,
) -> DataFrame:
    """Failure bookkeeping as a transform: bump attempts, stamp failed_at,
    schedule retry_at by exponential backoff (ref model.rb:62-78)."""
    new_attempts = F.col("attempts") + 1
    # retry_at first: once "attempts" is overwritten, F.col("attempts")
    # would resolve to the incremented value and double the backoff
    return (
        outbox.withColumn(
            "retry_at",
            now + F.make_dt_interval(secs=retry_at_backoff(new_attempts, base_seconds)),
        )
        .withColumn("failed_at", now)
        .withColumn("attempts", new_attempts)
    )
