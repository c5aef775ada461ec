"""Core CDC-operator queries over the driver's testdata, each certified
against a DuckDB oracle (SURVEY §2 ids in ``refs``).

The ``events`` table plays the CDC stream (FIXTURES.md §7): user_id is
the resource id, ts the update timestamp, event_id the outbox pk /
Kafka offset. Outbox-shaped columns are derived deterministically from
event_id so both engines compute identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, events as ev_ops, merge, metrics, outbox
from ..tables import load_table
from .catalog import query

# Fixed "now" — all events are Jan 2024, so this is strictly after the data.
NOW = "2024-02-15 00:00:00"
NOW_SQL = f"TIMESTAMP '{NOW}'"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _outboxish(df: DataFrame) -> DataFrame:
    """Derive an outbox-shaped table (FIXTURES.md §3) from events:
    topic <- event_type, created_at <- ts, pk <- event_id; 1/3 published
    with a small latency, 1/5 of the rest parked on a far-future retry."""
    return df.select(
        F.col("event_id"),
        F.col("event_type").alias("topic"),
        F.col("ts").alias("created_at"),
        F.when(
            F.col("event_id") % 3 == 0,
            F.col("ts") + F.make_dt_interval(mins=F.col("event_id") % 7),
        ).alias("published_at"),
        F.when(F.col("event_id") % 5 == 0, F.expr("TIMESTAMP '2099-01-01 00:00:00'")).alias(
            "retry_at"
        ),
        (F.col("event_id") % 4).cast("int").alias("attempts"),
    )


_OUTBOXISH_SQL = """
    SELECT event_id,
           event_type AS topic,
           ts AS created_at,
           CASE WHEN event_id % 3 = 0
                THEN ts + (event_id % 7) * INTERVAL 1 MINUTE END AS published_at,
           CASE WHEN event_id % 5 = 0
                THEN TIMESTAMP '2099-01-01 00:00:00' END AS retry_at,
           CAST(event_id % 4 AS INT) AS attempts
    FROM events
"""


# --------------------------------------------------------------------------
# §2.5 dedup
# --------------------------------------------------------------------------


@query(
    "a1_keep_latest_dedup",
    refs="A1,O3",
    bench=True,
    pure_plan=True,
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC NULLS FIRST, event_id ASC) = 1
    """,
)
def a1_keep_latest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 keep-latest-per-key (remove_duplicates_strategy.rb:20-53):
    newest row per (user_id, event_type), event_id as offset tiebreak."""
    return dedup.keep_latest(
        _events(spark, sf_dir), ["user_id", "event_type"], "ts", ["event_id"]
    )


@query(
    "a2_consecutive_dedup",
    refs="A2",
    bench=True,
    pure_plan=True,
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM (
        SELECT *, lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
        FROM events
    )
    WHERE nxt IS NULL OR nxt <> event_type
    """,
)
def a2_consecutive_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 run-length dedup (duplicates_filter.rb:15-25): collapse adjacent
    same-type events per user (ordering domain = user_id, as the outbox
    ordering domain is the topic), keeping the last of each run."""
    df = _events(spark, sf_dir)
    return dedup.consecutive_dedup(
        df, ["event_type"], "event_id", partition_cols=["user_id"]
    ).select("event_id", "ts", "user_id", "event_type", "value", "props")


# --------------------------------------------------------------------------
# §2.1/§2.8 outbox scans
# --------------------------------------------------------------------------


@query(
    "s2_outbox_publishable_scan",
    refs="S2,O1,F10",
    oracle=f"""
    WITH ob AS ({_OUTBOXISH_SQL})
    SELECT event_id, topic, created_at, attempts
    FROM ob
    WHERE published_at IS NULL
      AND topic = 'click'
      AND (retry_at IS NULL OR retry_at <= {NOW_SQL})
    ORDER BY created_at NULLS LAST, event_id
    LIMIT 100
    """,
)
def s2_outbox_publishable_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/O1 outbox drain (model.rb:15-26): pending rows of one topic,
    retry-gated, FIFO by created_at, LIMIT batch — physical plan is a
    pushed filter + TakeOrderedAndProject (no global sort)."""
    ob = _outboxish(_events(spark, sf_dir))
    scan = outbox.publishable_scan(
        ob, topic="click", batch_size=100, now=F.lit(NOW).cast("timestamp"),
        order_tiebreak="event_id",
    )
    return scan.select("event_id", "topic", "created_at", "attempts")


@query(
    "s3_pending_topics",
    refs="S3,G2",
    oracle=f"""
    WITH ob AS ({_OUTBOXISH_SQL})
    SELECT DISTINCT topic FROM ob WHERE published_at IS NULL
    """,
)
def s3_pending_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/G2 pending-topic discovery (model.rb:32-34)."""
    return outbox.pending_topics(_outboxish(_events(spark, sf_dir)))


@query(
    "f10_mark_failed_backoff",
    refs="F10,T1",
    oracle=f"""
    WITH ob AS ({_OUTBOXISH_SQL})
    SELECT event_id,
           attempts + 1 AS attempts,
           {NOW_SQL} AS failed_at,
           {NOW_SQL} + CAST(5 * 2 ** (attempts + 1) AS BIGINT) * INTERVAL 1 SECOND
               AS retry_at
    FROM ob WHERE published_at IS NULL AND topic = 'error'
    """,
)
def f10_mark_failed_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failure bookkeeping + exponential backoff ``5*2^attempts``
    (model.rb:69-78, exponential_backoff.rb:4-6)."""
    ob = _outboxish(_events(spark, sf_dir)).filter(
        F.col("published_at").isNull() & (F.col("topic") == "error")
    )
    return outbox.mark_failed(ob, now=F.lit(NOW).cast("timestamp")).select(
        "event_id", "attempts", "failed_at", "retry_at"
    )


# --------------------------------------------------------------------------
# §2.6/§2.4 guarded merge (the consumer persist path)
# --------------------------------------------------------------------------

_MERGE_MAPPED_SQL = """
    SELECT event_id,
           user_id AS synced_id,
           ts AS synced_updated_at,
           value AS val,
           CASE event_type WHEN 'error' THEN 'destroyed'
                WHEN 'view' THEN 'view_happened'
                ELSE 'updated' END AS event,
           CASE WHEN event_type = 'error' THEN ts END AS synced_canceled_at
    FROM events
"""


# Shared by f1_guarded_merge_snapshot (batch) and stream_t5_snapshot_merge
# (the same persist path under real Structured Streaming): both must land
# on the identical final snapshot.
#
# NULL-timestamp semantics (round-7 adversarial events fuzz — both were
# unmodeled in the oracle because no fixture had a NULL ts):
#   * keep-latest sorts NULLS FIRST descending (a missing timestamp is
#     "now", remove_duplicates_strategy.rb — dedup.keep_latest's
#     desc_nulls_first; DuckDB's bare DESC defaults to NULLS LAST);
#   * the merge guard passes when EITHER side's timestamp is NULL
#     (synchronizable_model.rb:24-26 — merge.guarded_merge's guard_ok),
#     so the CASE must spell the null branches, not rely on `s >= t`
#     (which is NULL, i.e. target-wins, under SQL semantics).
_F1_GUARD_OK = (
    "(s.synced_updated_at IS NULL OR t.synced_updated_at IS NULL"
    " OR s.synced_updated_at >= t.synced_updated_at)"
)

F1_ORACLE_SQL = f"""
    WITH m AS ({_MERGE_MAPPED_SQL}),
    tgt AS (
        SELECT synced_id, synced_updated_at, val,
               CAST(NULL AS TIMESTAMP) AS synced_canceled_at
        FROM m WHERE event_id % 2 = 0
        QUALIFY row_number() OVER (PARTITION BY synced_id
            ORDER BY synced_updated_at DESC NULLS FIRST, event_id ASC) = 1
    ),
    src AS (
        SELECT * FROM m
        WHERE event_id % 2 = 1 AND event IN ('created','updated','destroyed')
        QUALIFY row_number() OVER (PARTITION BY synced_id
            ORDER BY synced_updated_at DESC NULLS FIRST, event_id ASC) = 1
    )
    SELECT COALESCE(t.synced_id, s.synced_id) AS synced_id,
           CASE WHEN t.synced_id IS NULL THEN s.synced_updated_at
                WHEN s.synced_id IS NULL THEN t.synced_updated_at
                WHEN {_F1_GUARD_OK} THEN s.synced_updated_at
                ELSE t.synced_updated_at END AS synced_updated_at,
           CASE WHEN t.synced_id IS NULL THEN s.val
                WHEN s.synced_id IS NULL THEN t.val
                WHEN {_F1_GUARD_OK} THEN s.val
                ELSE t.val END AS val,
           CASE WHEN t.synced_id IS NULL THEN s.synced_canceled_at
                WHEN s.synced_id IS NULL THEN t.synced_canceled_at
                WHEN {_F1_GUARD_OK} THEN s.synced_canceled_at
                ELSE t.synced_canceled_at END AS synced_canceled_at
    FROM tgt t FULL OUTER JOIN src s ON t.synced_id = s.synced_id
    """


@query(
    "f1_guarded_merge_snapshot",
    refs="J1,F1,F3,F8,A1,S7",
    bench=True,
    pure_plan=True,
    oracle=F1_ORACLE_SQL,
)
def f1_guarded_merge_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumer persist path end-to-end in batch: even event_ids form
    the existing target snapshot, odd ones the incoming batch; 'error'
    events are soft destroys (guard-checked like any event, then the
    payload attrs + canceled stamp persist — soft destroys of unseen keys
    insert), 'view' maps to an unknown event name (dropped, F8), the rest
    are guarded updates (F1). No hard deletes in this batch (every
    destroy carries a canceled stamp), so the oracle's matched branch is
    uniform: guard pass => payload values, guard fail => target values."""
    m = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("synced_id"),
        F.col("ts").alias("synced_updated_at"),
        F.col("value").alias("val"),
        F.when(F.col("event_type") == "error", "destroyed")
        .when(F.col("event_type") == "view", "view_happened")
        .otherwise("updated")
        .alias("event"),
        F.when(F.col("event_type") == "error", F.col("ts")).alias("synced_canceled_at"),
    )
    target = dedup.keep_latest(
        m.filter(F.col("event_id") % 2 == 0), ["synced_id"], "synced_updated_at", ["event_id"]
    ).select(
        "synced_id",
        "synced_updated_at",
        "val",
        F.lit(None).cast("timestamp").alias("synced_canceled_at"),
    )
    source = m.filter(F.col("event_id") % 2 == 1)
    return merge.guarded_merge(
        target,
        source,
        key="synced_id",
        event_col="event",
        source_updated="synced_updated_at",
        target_updated="synced_updated_at",
        canceled_col="synced_canceled_at",
        order_tiebreak="event_id",
    )


@query(
    "f2_soft_delete_classifier",
    refs="F2",
    oracle="""
    WITH st AS (
        SELECT event_id, user_id,
               CASE WHEN value > 150 THEN ts END AS canceled_at,
               lag(CASE WHEN value > 150 THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY event_id) AS prev_canceled_at,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
    )
    SELECT event_id, user_id,
           CASE WHEN rn = 1 AND canceled_at IS NULL THEN 'created'
                WHEN rn = 1 THEN NULL
                WHEN prev_canceled_at IS NOT NULL AND canceled_at IS NULL THEN 'created'
                WHEN prev_canceled_at IS NULL AND canceled_at IS NOT NULL THEN 'destroyed'
                WHEN prev_canceled_at IS NOT NULL AND canceled_at IS NOT NULL THEN NULL
                ELSE 'updated' END AS event
    FROM st
    WHERE CASE WHEN rn = 1 AND canceled_at IS NULL THEN 'created'
                WHEN rn = 1 THEN NULL
                WHEN prev_canceled_at IS NOT NULL AND canceled_at IS NULL THEN 'created'
                WHEN prev_canceled_at IS NULL AND canceled_at IS NOT NULL THEN 'destroyed'
                WHEN prev_canceled_at IS NOT NULL AND canceled_at IS NOT NULL THEN NULL
                ELSE 'updated' END IS NOT NULL
    """,
)
def f2_soft_delete_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 soft-delete state machine (outbox.rb:74-102): value>150 plays
    the canceled_at stamp; lag() reconstructs previous_changes pre-image;
    suppressed transitions (still-canceled updates) are dropped."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    canceled = F.when(F.col("value") > 150, F.col("ts"))
    df = (
        _events(spark, sf_dir)
        .withColumn("canceled_at", canceled)
        .withColumn("prev_canceled_at", F.lag("canceled_at").over(w))
        .withColumn("rn", F.row_number().over(w))
    )
    classified = df.withColumn(
        "event",
        ev_ops.classify_soft_delete(
            F.col("prev_canceled_at"), F.col("canceled_at"), F.col("rn") == 1
        ),
    )
    return classified.filter(F.col("event").isNotNull()).select(
        "event_id", "user_id", "event"
    )


# --------------------------------------------------------------------------
# §2.6 joins
# --------------------------------------------------------------------------


@query(
    "j2_dependency_parent_fanout",
    refs="J2,J6",
    bench=True,
    pure_plan=True,
    oracle="""
    SELECT DISTINCT o.o_orderkey,
           'order_updated' AS event,
           CAST(o.o_custkey AS STRING) AS partition_key
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-03-31'
    """,
)
def j2_dependency_parent_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 dependency->parent republish (publisher.rb:80-105): changed
    children (lineitems shipped in 1995Q1) fan out ``parent_updated``
    events keyed by the parent's partition key.

    No broadcast hint on the changed-key set: it is a time window over
    the child fact table, so it scales with data volume, not with a
    bound fixed by construction. AQE broadcasts it when the runtime
    stats say one batch's keys are actually small (they usually are);
    a backfill-sized window degrades to a shuffled hash join instead
    of an executor OOM — same rule as the PLANS.md audit."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    changed_keys = (
        lineitem.filter(
            F.col("l_shipdate").between("1995-01-01", "1995-03-31")
        )
        .select("l_orderkey")
        .distinct()
    )
    return (
        orders.join(
            changed_keys, orders.o_orderkey == changed_keys.l_orderkey
        )
        .select(
            "o_orderkey",
            F.lit("order_updated").alias("event"),
            F.col("o_custkey").cast("string").alias("partition_key"),
        )
        .distinct()
    )


@query(
    "j4_to_many_reconciliation",
    refs="J4",
    oracle="""
    WITH parents AS (
        SELECT o_orderkey FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-01-31'
    ),
    local_children AS (
        SELECT l.l_orderkey, l.l_linenumber, l.l_partkey
        FROM lineitem l JOIN parents p ON l.l_orderkey = p.o_orderkey
    ),
    payload AS (
        SELECT l_orderkey, l_linenumber FROM local_children WHERE l_linenumber <= 3
    )
    SELECT c.l_orderkey, c.l_linenumber, c.l_partkey
    FROM local_children c
    WHERE NOT EXISTS (
        SELECT 1 FROM payload p
        WHERE p.l_orderkey = c.l_orderkey AND p.l_linenumber = c.l_linenumber)
    """,
)
def j4_to_many_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 to-many reconciliation (persistor.rb:128-151): local children
    absent from the payload id list are returned for deletion
    (``where.not(id: ids)``) via left_anti join.

    No broadcast hint on the parent set: a date window over orders
    scales with data volume (a batch is usually small, a backfill is
    not). AQE broadcasts when runtime stats allow — PLANS.md audit."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    parents = orders.filter(
        F.col("o_orderdate").between("1995-01-01", "1995-01-31")
    ).select("o_orderkey")
    local_children = lineitem.join(
        parents, lineitem.l_orderkey == parents.o_orderkey
    ).select("l_orderkey", "l_linenumber", "l_partkey")
    payload_ids = local_children.filter(F.col("l_linenumber") <= 3).select(
        "l_orderkey", "l_linenumber"
    )
    return merge.reconcile_to_many(
        local_children, payload_ids, "l_orderkey", "l_linenumber"
    )


@query(
    "j6_resource_refetch",
    refs="J6,J1",
    oracle="""
    WITH latest AS (
        SELECT user_id, ts AS event_ts, value AS event_value FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC NULLS FIRST, event_id ASC) = 1
    )
    SELECT c.c_custkey AS synced_id, c.c_name, c.c_acctbal,
           l.event_ts, l.event_value
    FROM latest l JOIN customer c ON l.user_id = c.c_custkey
    """,
)
def j6_resource_refetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 re-fetch current resource state before publish
    (publisher.rb:15-20): latest event per user joined to the customer
    dimension = snapshot-at-publish."""
    events_df = _events(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    latest = dedup.keep_latest(events_df, ["user_id"], "ts", ["event_id"]).select(
        "user_id", F.col("ts").alias("event_ts"), F.col("value").alias("event_value")
    )
    return latest.join(
        customer, latest.user_id == customer.c_custkey
    ).select(
        F.col("c_custkey").alias("synced_id"),
        "c_name",
        "c_acctbal",
        "event_ts",
        "event_value",
    )


# --------------------------------------------------------------------------
# §2.7 aggregations
# --------------------------------------------------------------------------


@query(
    "g1_latency_metrics",
    refs="G1,T4",
    oracle=f"""
    WITH ob AS ({_OUTBOXISH_SQL})
    SELECT min(CASE WHEN published_at >= {NOW_SQL} - INTERVAL 30 DAY
                    THEN date_diff('second', created_at, published_at) END) AS minimum,
           max(CASE WHEN published_at >= {NOW_SQL} - INTERVAL 30 DAY
                    THEN date_diff('second', created_at, published_at) END) AS maximum,
           avg(CASE WHEN published_at >= {NOW_SQL} - INTERVAL 30 DAY
                    THEN date_diff('second', created_at, published_at) END) AS average,
           max(CASE WHEN published_at IS NULL
                    THEN date_diff('second', created_at, {NOW_SQL}) END)
               AS highest_since_creation
    FROM ob
    """,
)
def g1_latency_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 latency gauges (latency_tracker.rb:15-42): min/max/avg publish
    latency over the recent window + age of oldest unpublished row."""
    ob = _outboxish(_events(spark, sf_dir))
    return metrics.latency_metrics(
        ob, now=F.lit(NOW).cast("timestamp"), window_seconds=30 * 86400
    )


@query(
    "g3_genesis_batch_plan",
    refs="G3,S9",
    oracle="""
    SELECT event_type AS topic,
           count(*) AS n_rows,
           CAST(ceil(count(*) / 1000.0) AS BIGINT) AS n_batches,
           3600 / greatest(CAST(ceil(count(*) / 1000.0) AS BIGINT), 1)
               AS batch_interval_seconds
    FROM events GROUP BY event_type
    """,
)
def g3_genesis_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 genesis batch math (sidekiq_batched_job_distributor.rb:13-23):
    ceil(count/batch) batches per topic spread over an hour."""
    df = _events(spark, sf_dir).withColumnRenamed("event_type", "topic")
    return metrics.batch_plan(df, "topic", batch_size=1000, spread_seconds=3600)
