"""Coverage queries for the SURVEY §2 operators not yet certified by
queries_core/pipeline: genesis fan-out + filters, tombstones, deleted /
bypass projections, message filters, suppression, the remaining joins
and sorts, and the canonical deserializer (D2-D7) as batch roundtrips.

Every query here is a thin composition of the engine's operator modules
over the driver's testdata, paired with its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..consumer.deserializer import (
    DeserializerConfig,
    canonical_columns,
    deserialize,
)
from ..operators import dedup, merge
from ..producer.serializer import ChildRel, serialize_aggregate, serialize_bypass, serialize_deleted
from ..tables import load_table
from .catalog import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# §2.1 sources/sinks
# --------------------------------------------------------------------------


@query(
    "s5_genesis_topic_fanout",
    refs="S5",
    oracle="""
    SELECT event_type AS topic,
           'Event:' || CAST(event_id AS VARCHAR) AS key,
           event_id
    FROM events WHERE event_type <> 'error'
    UNION ALL
    SELECT event_type || '_genesis' AS topic,
           'Event:' || CAST(event_id AS VARCHAR) AS key,
           event_id
    FROM events
    """,
)
def s5_genesis_topic_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 dual-topic genesis-replica fan-out (karafka_responder_generator
    .rb:26-40, registry.rb:63-76): every event also lands on
    ``{topic}_genesis``; ``genesis_only`` rows ('error' here) skip the
    primary. Physically a union of two sink projections over ONE scan —
    no join, no shuffle."""
    ev = _events(spark, sf_dir)
    key = F.concat(F.lit("Event:"), F.col("event_id").cast("string"))
    primary = ev.filter(F.col("event_type") != "error").select(
        F.col("event_type").alias("topic"), key.alias("key"), "event_id"
    )
    genesis = ev.select(
        F.concat(F.col("event_type"), F.lit("_genesis")).alias("topic"),
        key.alias("key"),
        "event_id",
    )
    return primary.unionAll(genesis)


@query(
    "s10_tombstone_merge",
    refs="S10,T7,S8,J1",
    bench=True,
    pure_plan=True,
    oracle="""
    WITH tgt AS (
        SELECT user_id AS synced_id, ts AS synced_updated_at, value AS val
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC NULLS FIRST, event_id ASC) = 1
    )
    SELECT synced_id, synced_updated_at, val FROM tgt WHERE synced_id % 7 <> 0
    """,
)
def s10_tombstone_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/T7 tombstone application (tombstone_publisher.rb:4-21): NULL
    payloads under existing keys hard-delete through the same MERGE the
    upserts use (WHEN MATCHED AND payload NULL THEN DELETE); S8 because
    the whole tombstone batch applies set-wise in one pass."""
    ev = _events(spark, sf_dir)
    target = dedup.keep_latest(ev, ["user_id"], "ts", ["event_id"]).select(
        F.col("user_id").alias("synced_id"),
        F.col("ts").alias("synced_updated_at"),
        F.col("value").alias("val"),
        F.lit(None).cast("timestamp").alias("synced_canceled_at"),
    )
    tombstones = (
        ev.filter(F.col("user_id") % 7 == 0)
        .select(F.col("user_id").alias("synced_id"))
        .distinct()
        .select(
            "synced_id",
            F.lit(None).cast("timestamp").alias("synced_updated_at"),
            F.lit(None).cast("double").alias("val"),
            F.lit(None).cast("timestamp").alias("synced_canceled_at"),
            F.lit("destroyed").alias("event"),
        )
    )
    merged = merge.guarded_merge(
        target, tombstones, key="synced_id", canceled_col="synced_canceled_at"
    )
    return merged.select("synced_id", "synced_updated_at", "val")


@query(
    "s2_drain_two_cycles",
    refs="S2,T1,O1,G4",
    oracle="""
    WITH ob AS (
        SELECT event_id, event_type AS topic, ts AS created_at,
               CASE WHEN event_id % 3 = 0
                    THEN ts + (event_id % 7) * INTERVAL 1 MINUTE END AS published_at,
               CASE WHEN event_id % 5 = 0
                    THEN TIMESTAMP '2099-01-01 00:00:00' END AS retry_at
        FROM events
    ),
    ranked AS (
        SELECT event_id,
               row_number() OVER (ORDER BY created_at, event_id) AS rn
        FROM ob
        WHERE published_at IS NULL AND topic = 'click'
          AND (retry_at IS NULL OR retry_at <= TIMESTAMP '2024-02-15 00:00:00')
    )
    SELECT o.event_id, o.topic,
           CASE WHEN r.rn <= 200 THEN TIMESTAMP '2024-02-15 00:00:00'
                ELSE o.published_at END AS published_at
    FROM ob o LEFT JOIN ranked r ON r.event_id = o.event_id
    """,
)
def s2_drain_two_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two poll cycles of the outbox worker loop (runner.rb:15-35):
    after draining 2 FIFO batches of 100 from the 'click' topic, exactly
    the first 200 eligible rows carry the publish stamp; parked and
    foreign-topic rows are untouched."""
    from ..operators.outbox import drain_topic

    ob = _outboxish_cov(_events(spark, sf_dir))
    final, _ = drain_topic(
        ob,
        topic="click",
        batch_size=100,
        now=F.lit("2024-02-15 00:00:00").cast("timestamp"),
        pk="event_id",
        max_cycles=2,
    )
    return final.select("event_id", "topic", "published_at")


def _outboxish_cov(df: DataFrame) -> DataFrame:
    return df.select(
        F.col("event_id"),
        F.col("event_type").alias("topic"),
        F.col("ts").alias("created_at"),
        F.when(
            F.col("event_id") % 3 == 0,
            F.col("ts") + F.make_dt_interval(mins=F.col("event_id") % 7),
        ).alias("published_at"),
        F.when(
            F.col("event_id") % 5 == 0, F.expr("TIMESTAMP '2099-01-01 00:00:00'")
        ).alias("retry_at"),
    )


@query(
    "lc_local_changes_audit",
    refs="S7,J1",
    oracle="""
    WITH before AS (
        SELECT user_id AS synced_id, value AS val FROM events
        WHERE event_id % 2 = 0
        QUALIFY row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC NULLS FIRST, event_id ASC) = 1
    ),
    after AS (
        SELECT user_id AS synced_id, value AS val FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC NULLS FIRST, event_id ASC) = 1
    ),
    joined AS (
        SELECT COALESCE(a.synced_id, b.synced_id) AS synced_id,
               b.val AS old_val, a.val AS new_val,
               b.synced_id IS NOT NULL AS in_b, a.synced_id IS NOT NULL AS in_a
        FROM before b FULL OUTER JOIN after a ON b.synced_id = a.synced_id
    )
    SELECT synced_id, 'val' AS "column",
           CAST(old_val AS VARCHAR) AS old_value,
           CAST(new_val AS VARCHAR) AS new_value
    FROM joined
    WHERE old_val IS DISTINCT FROM new_val
    """,
)
def lc_local_changes_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumer's local-changes audit (persistor.rb:76, README.md:
    1164-1171): pre- vs post-merge snapshots diffed set-wise into
    (key, column, old, new) audit rows — here the even-event snapshot
    against the all-events snapshot."""
    from ..operators.merge import local_changes

    ev = _events(spark, sf_dir)
    before = dedup.keep_latest(
        ev.filter(F.col("event_id") % 2 == 0), ["user_id"], "ts", ["event_id"]
    ).select(F.col("user_id").alias("synced_id"), F.col("value").alias("val"))
    after = dedup.keep_latest(ev, ["user_id"], "ts", ["event_id"]).select(
        F.col("user_id").alias("synced_id"), F.col("value").alias("val")
    )
    return local_changes(before, after, key="synced_id")


_SHARED_SQL = """
    SELECT e.event_type AS topic,
           count(*) AS n_events,
           min(e.event_id) AS first_id,
           max(c.c_acctbal) AS max_acctbal
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY e.event_type
"""


@query(
    "sql_shared_dialect",
    refs="S6,G4",
    oracle=_SHARED_SQL,
)
def sql_shared_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's raw-SQL surface: the exact same ANSI SQL string runs
    via spark.sql over registered views AND as the DuckDB oracle — one
    text, two engines, identical results (Catalyst plans it like the
    DataFrame equivalents: pushed filters, partial aggs, broadcast)."""
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SHARED_SQL)


@query(
    "fn_names_keys_roundtrip",
    refs="F8,T2",
    oracle="""
    WITH built AS (
        SELECT event_id,
               event_type || '_' ||
                   CASE event_id % 3 WHEN 0 THEN 'created'
                        WHEN 1 THEN 'updated' ELSE 'destroyed' END AS event_name,
               'Event:' || CAST(event_id AS VARCHAR) AS key,
               'dionysus_' || event_type AS topic
        FROM events
    )
    SELECT event_id, event_name, key, topic,
           regexp_replace(event_name, '_(created|updated|destroyed)$', '')
               AS parsed_resource,
           regexp_extract(event_name, '_(created|updated|destroyed)$', 1)
               AS parsed_action
    FROM built
    """,
)
def fn_names_keys_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 scalar functions: event-name build (event_name.rb:11-25),
    "Model:id" keys (key.rb:11-13), namespaced topics (topic_name.rb:
    12-14), and the name->(resource, action) inverse parse the consumer
    relies on (dionysus_event.rb:30-36) — built and inverted in one
    projection, certified as a roundtrip."""
    from ..operators import events as ev_ops

    ev = _events(spark, sf_dir)
    action = (
        F.when(F.col("event_id") % 3 == 0, "created")
        .when(F.col("event_id") % 3 == 1, "updated")
        .otherwise("destroyed")
    )
    built = ev.select(
        "event_id",
        ev_ops.event_name(F.col("event_type"), action).alias("event_name"),
        ev_ops.message_key(F.lit("Event"), F.col("event_id")).alias("key"),
        ev_ops.topic_name(F.col("event_type")).alias("topic"),
    )
    resource, parsed_action = ev_ops.parse_event_name(F.col("event_name"))
    return built.select(
        "event_id",
        "event_name",
        "key",
        "topic",
        resource.alias("parsed_resource"),
        parsed_action.alias("parsed_action"),
    )


# --------------------------------------------------------------------------
# §2.2 projections
# --------------------------------------------------------------------------


@query(
    "p5_deleted_projection",
    refs="P5",
    oracle="""
    SELECT event_id AS id, user_id, value
    FROM events WHERE event_type = 'error'
    """,
)
def p5_deleted_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 deleted-record projection (deleted_record_serializer.rb:4-16):
    destroyed records serialize pk + declared payload only."""
    destroyed = _events(spark, sf_dir).filter(F.col("event_type") == "error")
    out = serialize_deleted(destroyed, "event_id", ["user_id", "value"])
    return out.select("payload.id", "payload.user_id", "payload.value")


@query(
    "p6_serialization_bypass",
    refs="P6",
    oracle="SELECT event_id AS id FROM events WHERE event_type = 'click'",
)
def p6_serialization_bypass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 ``serialize: false`` bypass (karafka_responder_generator.rb:
    72-75; README.md:180-213): raw id-only DTOs straight to the sink."""
    clicks = _events(spark, sf_dir).filter(F.col("event_type") == "click")
    out = serialize_bypass(clicks.select(F.col("event_id").alias("id")), ["id"])
    return out.select("payload.id")


# --------------------------------------------------------------------------
# §2.4 filters
# --------------------------------------------------------------------------


@query(
    "f4_message_filter",
    refs="F4,T9",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE len(props) <= 64 AND event_type <> 'error'
    """,
)
def f4_message_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 poison/oversize message guard (default_message_filter.rb:11-17,
    params_batch_processor.rb:30-34): pluggable ignore predicates; the
    dropped complement feeds the dead-letter sink (T9)."""
    ev = _events(spark, sf_dir)
    keep = (F.length("props") <= 64) & (F.col("event_type") != "error")
    return ev.filter(keep).select("event_id", "event_type")


@query(
    "f5f7_genesis_scan",
    refs="F5,F6,F7,S9",
    oracle="""
    SELECT event_id, user_id, ts, value
    FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                 AND TIMESTAMP '2024-01-20 00:00:00'
      AND value <= 150
      AND event_type = 'purchase'
    """,
)
def f5f7_genesis_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 genesis backfill scan with its three filters composed
    (streamer.rb:28-52): F5 updated_at window, F6 not-soft-deleted
    (value<=150 plays canceled_at IS NULL), F7 arbitrary equality
    conditions. All pushed to the parquet scan."""
    ev = _events(spark, sf_dir)
    return (
        ev.filter(F.col("ts").between("2024-01-10 00:00:00", "2024-01-20 00:00:00"))
        .filter(F.col("value") <= 150)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
    )


@query(
    "f9_publish_suppression",
    refs="F9",
    oracle="""
    SELECT event_id, event_type FROM events
    WHERE event_type NOT IN ('view', 'error')
    """,
)
def f9_publish_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 publish suppression (suppressor.rb:7-17): a config-gated
    off-switch; suppressed topics' events never reach the sink."""
    suppressed = ["view", "error"]
    ev = _events(spark, sf_dir)
    return ev.filter(~F.col("event_type").isin(suppressed)).select(
        "event_id", "event_type"
    )


@query(
    "f11_deleted_resource_guard",
    refs="F11",
    oracle="""
    SELECT e.event_id, e.user_id FROM events e
    WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
    """,
)
def f11_deleted_resource_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 deleted-resource guard (outbox/publisher.rb:19-34): drop
    created/updated events whose resource no longer exists — a left_semi
    join of events against the source table before publish. The guard
    side is the FULL source-table key set (table-sized, unbounded at
    production scale), so no broadcast hint is forced: AQE broadcasts
    the key projection when it is actually small and shuffles otherwise."""
    ev = _events(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    return ev.join(
        customer.select("c_custkey"),
        ev.user_id == F.col("c_custkey"),
        "left_semi",
    ).select("event_id", "user_id")


# --------------------------------------------------------------------------
# §2.6 joins
# --------------------------------------------------------------------------


@query(
    "j5_to_one_resolution",
    refs="J5",
    oracle="""
    SELECT s.s_suppkey AS synced_id, s.s_name,
           n.n_nationkey AS nation_id, n.n_name AS nation_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
)
def j5_to_one_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 to-one association resolution (persistor.rb:102-126): link the
    upserted record to its local parent by remote id — an equi-join with
    the (small) parent dimension broadcast."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select(
        F.col("s_suppkey").alias("synced_id"),
        "s_name",
        F.col("n_nationkey").alias("nation_id"),
        F.col("n_name").alias("nation_name"),
    )


@query(
    "j7_observer_overflow",
    refs="J7,J3",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM events e WHERE e.user_id = c.c_custkey AND e.value > 180)
    """,
)
def j7_observer_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 observer-overflow re-select (outbox/publisher.rb:120-130):
    above the inline threshold, observers are re-fetched by id — the id
    set as a semi-join filter on the observed table.

    No broadcast hint: the id set is distinct user_ids from the full
    events table — bounded only by customer cardinality, the exact
    shape the j3 audit dropped. AQE broadcasts the semi-join side when
    it is actually small."""
    ev = _events(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    observer_ids = ev.filter(F.col("value") > 180).select("user_id").distinct()
    return customer.join(
        observer_ids,
        customer.c_custkey == observer_ids.user_id,
        "left_semi",
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# §2.7/§2.8 aggregation + ordering
# --------------------------------------------------------------------------


@query(
    "g4_per_key_batches",
    refs="G4,T2",
    oracle="""
    SELECT event_type AS topic,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_keys,
           min(event_id) AS first_event_id,
           max(event_id) AS last_event_id
    FROM events GROUP BY event_type
    """,
)
def g4_per_key_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 group-by-key batch processing (outbox/runner.rb:52-77,
    params_batch_processor.rb:64-68): per-topic batch stats; per-key
    serial processing maps to partition-by-key execution (T2)."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.col("event_type").alias("topic"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_keys"),
            F.min("event_id").alias("first_event_id"),
            F.max("event_id").alias("last_event_id"),
        )
    )


@query(
    "o2_publish_fifo_position",
    refs="O2,O1",
    oracle="""
    SELECT event_id, CAST(position AS BIGINT) AS position FROM (
        SELECT event_id,
               row_number() OVER (PARTITION BY event_type
                   ORDER BY ts NULLS LAST, event_id) AS position
        FROM events)
    WHERE position <= 100
    """,
)
def o2_publish_fifo_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2 publish FIFO (model.rb:20-21, active_record_publishable.rb:
    55-57): per-topic creation-order rank, first batch of 100 — a
    WindowGroupLimit (per-partition top-k), never a global sort. A NULL
    creation time ranks LAST, explicitly on both engines (Spark's bare
    asc is NULLS FIRST, DuckDB's NULLS LAST — the round-7 adversarial
    events fuzz): an unknown creation time reads as "just created",
    consistent with keep_latest's missing-timestamp-is-now."""
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    return (
        _events(spark, sf_dir)
        .withColumn("position", F.row_number().over(w))
        .filter(F.col("position") <= 100)
        .select("event_id", F.col("position").cast("long").alias("position"))
    )


@query(
    "o4_genesis_id_batches",
    refs="O4,G3",
    oracle="""
    SELECT topic, user_id, CAST((rn - 1) // 100 AS BIGINT) AS batch_idx FROM (
        SELECT event_type AS topic, user_id,
               row_number() OVER (PARTITION BY event_type ORDER BY user_id) AS rn
        FROM (SELECT DISTINCT event_type, user_id FROM events))
    """,
)
def o4_genesis_id_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/G3 genesis id batching (base_job.rb:11-28): per topic, ids
    sorted then chunked into fixed-size batches for time-distributed
    enqueue."""
    w = Window.partitionBy("topic").orderBy("user_id")
    return (
        _events(spark, sf_dir)
        .select(F.col("event_type").alias("topic"), "user_id")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .select(
            "topic",
            "user_id",
            ((F.col("rn") - 1) / 100).cast("long").alias("batch_idx"),
        )
    )


@query(
    "cs_changeset_from_versions",
    refs="F2,S7",
    oracle="""
    WITH versioned AS (
        SELECT user_id, event_id, value,
               lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
    )
    SELECT user_id, event_id,
           CASE WHEN rn = 1
                THEN '{"value":[null,'
                     || CASE WHEN abs(value) <= 1e15
                             THEN CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
                             ELSE 'null' END || ']}'
                WHEN prev_value IS DISTINCT FROM value
                     THEN '{"value":['
                          || CASE WHEN abs(prev_value) <= 1e15
                                  THEN CAST(CAST(floor(prev_value) AS BIGINT) AS VARCHAR)
                                  ELSE 'null' END || ','
                          || CASE WHEN abs(value) <= 1e15
                                  THEN CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
                                  ELSE 'null' END || ']}'
                ELSE '{}' END AS changeset
    FROM versioned
    """,
)
def cs_changeset_from_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The outbox ``changeset`` column (§1: previous_changes
    ``{column: [old, new]}``, publishable.rb:86-95) built set-wise from
    consecutive row versions: lag() reconstructs the pre-image, unchanged
    columns are omitted, first-seen rows record [null, new].

    Values render as JSON integers only inside the |v| <= 1e15 window
    (within double's exact-integer range); NULL, NaN, Inf, and
    out-of-window magnitudes render as JSON null — Spark's floor
    SATURATES NaN to 0 and ±Inf/±1e308 to Long.MIN/MAX while DuckDB's
    BIGINT cast raises, so an unguarded render either lies or crashes
    depending on the engine (round-7 adversarial events fuzz). NaN/NULL
    fall out of the window for free: both engines order NaN above every
    double, so abs(x) <= 1e15 is false, and NULL propagates to the
    else-branch."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    v = (
        _events(spark, sf_dir)
        .withColumn("prev_value", F.lag("value").over(w))
        .withColumn("rn", F.row_number().over(w))
    )
    # integer rendering: double->string formatting differs across engines
    num = lambda c: F.when(  # noqa: E731
        F.abs(F.col(c)) <= 1e15, F.floor(F.col(c)).cast("long").cast("string")
    ).otherwise("null")
    changeset = (
        F.when(F.col("rn") == 1, F.concat(F.lit('{"value":[null,'), num("value"), F.lit("]}")))
        .when(
            ~F.col("prev_value").eqNullSafe(F.col("value")),
            F.concat(
                F.lit('{"value":['), num("prev_value"), F.lit(","), num("value"), F.lit("]}")
            ),
        )
        .otherwise(F.lit("{}"))
    )
    return v.select("user_id", "event_id", changeset.alias("changeset"))


@query(
    "enc_changeset_roundtrip",
    refs="S7",
    oracle="""
    SELECT event_id, props AS changeset FROM events
    """,
)
def enc_changeset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encrypted-changeset support (outbox/model.rb:40-44's
    attr_encrypted): Spark's native aes_encrypt/aes_decrypt wrap the
    changeset column JVM-side; the query certifies decrypt(encrypt(x))
    == x (the oracle is the identity — any codec asymmetry breaks the
    hash match). Key management is deployment config; GCM mode carries
    the IV in the ciphertext."""
    key = F.lit("0123456789abcdef")  # 16-byte demo key (config in prod)
    ev = _events(spark, sf_dir)
    enc = ev.withColumn("enc", F.aes_encrypt(F.col("props"), key))
    dec = enc.select(
        "event_id",
        F.aes_decrypt(F.col("enc"), key).cast("string").alias("changeset"),
    )
    return dec


# --------------------------------------------------------------------------
# §2.3 canonical deserialization as batch roundtrips
# --------------------------------------------------------------------------


@query(
    "d2d7_canonical_flatten",
    refs="D2,D3,D5,D6,D7",
    oracle="""
    SELECT user_id AS synced_id,
           date_trunc('second', ts) AS synced_updated_at,
           user_id % 50 AS synced_account_id,
           array_to_string([event_id, event_id * 2], ',') AS synced_item_ids,
           user_id AS synced_owner_id,
           CASE WHEN user_id % 2 = 0 THEN 'Customer' ELSE 'Supplier' END
               AS synced_owner_type,
           value AS val
    FROM events
    """,
)
def d2d7_canonical_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2-D7 composed on a wire-shaped snapshot: reserved attrs remap to
    synced_* (D2, string timestamps re-typed), links flatten by shape —
    scalar -> _id, array -> _ids, {type,id} -> _id+_type (D3/D5) — D6
    renames value->val, and D7 drops undeclared columns (props)."""
    ev = _events(spark, sf_dir)
    wire = ev.select(
        F.struct(
            F.col("user_id").alias("id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("updated_at"),
            F.struct(
                (F.col("user_id") % 50).alias("account"),
                F.array(F.col("event_id"), F.col("event_id") * 2).alias("items"),
                F.struct(
                    F.when(F.col("user_id") % 2 == 0, "Customer")
                    .otherwise("Supplier")
                    .alias("type"),
                    F.col("user_id").alias("id"),
                ).alias("owner"),
            ).alias("links"),
            F.col("value").alias("value"),
            F.col("props").alias("props"),
        ).alias("record")
    )
    schema = wire.schema["record"].dataType
    cfg = DeserializerConfig(
        attribute_mappers={"event": {"value": "val"}},
        target_columns={
            "event": [
                "synced_id",
                "synced_updated_at",
                "synced_account_id",
                "synced_item_ids",
                "synced_owner_id",
                "synced_owner_type",
                "val",
            ]
        },
    )
    cols = canonical_columns(F.col("record"), schema, "event", cfg, set())
    out = wire.select(*cols).drop("synced_data")
    # driver value-hash compatibility: arrays serialize as CSV on output
    return out.withColumn(
        "synced_item_ids",
        F.array_join(F.transform("synced_item_ids", lambda x: x.cast("string")), ","),
    )


@query(
    "d5_polymorphic_routing",
    refs="D5,D4",
    oracle="""
    SELECT user_id AS parent_id,
           user_id * 10 AS synced_id,
           event_id AS src_event
    FROM events WHERE user_id % 2 = 0
    """,
)
def d5_polymorphic_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 polymorphic to-one routing (deserializer.rb:173-179,227-229):
    a {type,id}-linked sideload routes its child frame by the link's
    type — here the 'Customer'-typed owners come back out as their own
    entity frame; 'Supplier' rows take the other route."""
    ev = _events(spark, sf_dir)
    wire = ev.select(
        F.struct(
            F.col("user_id").alias("id"),
            F.struct(
                (F.col("user_id") * 10).alias("id"),
                F.col("event_id").alias("src_event"),
            ).alias("owner"),
            F.struct(
                F.struct(
                    F.when(F.col("user_id") % 2 == 0, "Customer")
                    .otherwise("Supplier")
                    .alias("type"),
                    (F.col("user_id") * 10).alias("id"),
                ).alias("owner")
            ).alias("links"),
        ).alias("record")
    )
    schema = wire.schema["record"].dataType
    frames = deserialize(
        wire, schema, "event", polymorphic_types={"owner": ["Customer", "Supplier"]}
    )
    customer_route = next(
        e.frame for e in frames if e.entity == "customer" and e.relationship == "has_one"
    )
    return customer_route.select(
        F.col("__parent_id").alias("parent_id"),
        F.col("synced_id"),
        F.col("src_event"),
    )


@query(
    "d4_aggregate_dismantle",
    refs="D4,P3",
    bench=True,
    pure_plan=True,
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate BETWEEN TIMESTAMP '1995-02-01' AND TIMESTAMP '1995-02-28'
    """,
)
def d4_aggregate_dismantle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 recursive relationship extraction as the inverse of P3: orders
    sideload their lineitems into the payload (serialize_aggregate), the
    deserializer explodes them back out — the child frame must equal the
    original child table (assembly/dismantling roundtrip)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-02-01", "1995-02-28")
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    parent = orders.select(F.col("o_orderkey").alias("id"), "o_totalprice")
    child = lineitem.select(
        F.col("l_orderkey").alias("fk"),
        F.col("l_linenumber").alias("id"),
        F.col("l_quantity").alias("quantity"),
    )
    agg = serialize_aggregate(
        parent,
        parent_id="id",
        attributes=["o_totalprice"],
        has_many={
            "lineitems": ChildRel(
                child=child,
                fk="fk",
                child_id="id",
                attributes=["quantity"],
                order_col="id",
            )
        },
        # parent is one month of orders (~1.4% selectivity): the semi-join
        # pushdown prunes lineitems at the scan instead of grouping 100%
        # of them and discarding 98.6% in the left join
        prefilter_children=True,
    )
    wire = agg.select(F.col("payload").alias("record"))
    schema = wire.schema["record"].dataType
    frames = deserialize(wire, schema, "order")
    children = [e for e in frames if e.relationship == "has_many"]
    li = children[0].frame
    return li.select(
        F.col("__parent_id").alias("l_orderkey"),
        F.col("synced_id").alias("l_linenumber"),
        F.col("quantity").alias("l_quantity"),
    )


# --------------------------------------------------------------------------
# §2.1 S1 lifecycle capture + §2.2 P4 serializer dispatch (explicit
# certification — both were pytest-only in round 1)
# --------------------------------------------------------------------------


@query(
    "s1_lifecycle_capture",
    refs="S1,F2",
    oracle="""
    WITH log AS (
        SELECT event_id AS seq, user_id AS id, ts,
               CASE WHEN value > 150 THEN ts END AS canceled_at
        FROM events
    ),
    st AS (
        SELECT seq, id, canceled_at,
               lag(canceled_at) OVER (PARTITION BY id ORDER BY seq)
                   AS prev_canceled,
               row_number() OVER (PARTITION BY id ORDER BY seq) AS rn
        FROM log
    ),
    classified AS (
        SELECT seq, id,
               CASE WHEN rn = 1 AND canceled_at IS NULL THEN 'created'
                    WHEN rn = 1 THEN NULL
                    WHEN prev_canceled IS NOT NULL AND canceled_at IS NULL
                         THEN 'created'
                    WHEN prev_canceled IS NULL AND canceled_at IS NOT NULL
                         THEN 'destroyed'
                    WHEN prev_canceled IS NOT NULL AND canceled_at IS NOT NULL
                         THEN NULL
                    ELSE 'updated' END AS action
        FROM st
    )
    SELECT seq, id, action FROM classified WHERE action IS NOT NULL
    """,
)
def s1_lifecycle_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 AR-lifecycle capture, batch-expressed (dionysus.rb:113-129 +
    publishable.rb:34-68): the versioned change log (events as commit
    log: user_id = record id, event_id = commit seq, value>150 plays the
    canceled stamp) classifies each version into the created / updated /
    destroyed CDC action via the producer pipeline's entry point —
    exactly the stream the AR callbacks would emit, derived set-wise.
    Suppressed transitions (still-canceled updates) drop, matching the
    reference's publish guard."""
    from ..producer.pipeline import classify_changelog

    log = _events(spark, sf_dir).select(
        F.col("event_id").alias("seq"),
        F.col("user_id").alias("id"),
        "ts",
        F.when(F.col("value") > 150, F.col("ts")).alias("canceled_at"),
    )
    out = classify_changelog(log, id_col="id", seq_col="seq")
    return out.select("seq", "id", "action")


@query(
    "p4_serializer_dispatch",
    refs="P4,P7",
    oracle="""
    SELECT 'customer_updated' AS event,
           'Customer' AS model_name,
           'Customer:' || CAST(c_custkey AS VARCHAR) AS key,
           CAST(c_nationkey AS VARCHAR) AS partition_key,
           c_custkey AS synced_id
    FROM customer
    """,
)
def p4_serializer_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 serializer dispatch (karafka_responder_generator.rb:16-68 +
    registry.rb:95-161): a registry with one declared publication
    compiles the respond(action, frame) pipeline — event naming
    ``{resource}_{action}``, model classification, ``Model:id`` keys,
    declared-attribute partition keys, enveloped value. The emitted wire
    record is parsed back out of the JSON so the oracle checks the
    DISPATCHED fields, not a fixture."""
    from ..registry import ProducerRegistry, PublicationDecl

    reg = ProducerRegistry(namespace="v3")
    reg.topic("customers", partition_key="c_nationkey")
    reg.publish(
        "customers",
        PublicationDecl(
            resource="customer", id_col="c_custkey", attributes=("c_name", "c_acctbal")
        ),
    )
    respond = reg.responder("customers", "customer")
    wire = respond("updated", load_table(spark, sf_dir, "customer"))
    return wire.select(
        F.get_json_object("value", "$.message[0].event").alias("event"),
        F.get_json_object("value", "$.message[0].model_name").alias("model_name"),
        "key",
        "partition_key",
        F.get_json_object("value", "$.message[0].data[0].id")
        .cast("long")
        .alias("synced_id"),
    )


@query(
    "g5_salted_skew_agg",
    refs="G4,beyond:scale",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users,
           md5(array_to_string(list_sort(list(event_id)), ',')) AS ids_digest
    FROM events
    GROUP BY event_type
    """,
)
def g5_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation under key skew (operators/skew.py):
    collect_list and exact count-distinct per event_type (5 heavy keys
    over the whole table — the worst groupBy shape) run as (key, salt)
    partials first, so no single task funnels a heavy key's every row.
    The oracle is the PLAIN aggregation — salting must be semantically
    invisible (sorted collect, disjoint-salt distinct sum). The
    collected list is md5-digested so the compare moves 5 hashes, not
    5 id arrays."""
    from ..operators.skew import salted_collect_list, salted_count_distinct

    ev = _events(spark, sf_dir)
    collected = salted_collect_list(
        ev, ["event_type"], F.col("event_id"), num_salts=16
    ).select(
        "event_type",
        F.md5(
            F.array_join(F.transform("collected", lambda x: x.cast("string")), ",")
        ).alias("ids_digest"),
    )
    distinct = salted_count_distinct(
        ev, ["event_type"], F.col("user_id"), num_salts=16
    )
    return distinct.join(collected, "event_type").select(
        "event_type", F.col("n_distinct").alias("n_distinct_users"), "ids_digest"
    )


@query(
    "j8_asof_join",
    bench=True,
    pure_plan=True,
    refs="beyond:joins,J6",
    oracle="""
    WITH pur AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
        QUALIFY row_number() OVER (PARTITION BY user_id, ts
            ORDER BY event_id DESC) = 1
    ),
    clk AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS asof_ts, p.value AS asof_value
    FROM clk c ASOF LEFT JOIN pur p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def j8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (union-window, operators/asof.py): every click event
    paired with the user's latest purchase at or before the click —
    one shuffle+sort on user_id, linear in clicks + purchases, versus
    the exploding range join. The oracle is DuckDB's NATIVE ASOF LEFT
    JOIN, so the operator's semantics (ties, same-instant states,
    no-earlier-state NULLs) are pinned to the industry definition."""
    from ..operators.asof import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    return asof_join(
        clicks,
        purchases,
        key="user_id",
        probe_time="ts",
        state_time="ts",
        state_cols=["value"],
        state_tiebreak="event_id",
    )


@query(
    "cdc_scd2_history",
    refs="S7,T7,beyond:cdc",
    oracle="""
    SELECT user_id,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
               AS valid_to,
           event_id, value AS val,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
               IS NULL AS is_current
    FROM events
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history from the CDC stream: every version becomes a
    validity interval [valid_from, valid_to) via lead() over the per-key
    commit order — the dimension-table product warehouses build from
    exactly this changelog (the snapshot store keeps only the
    is_current slice; this keeps them all). One shuffle on the key;
    deterministic (ts, event_id) ordering. A NULL commit timestamp
    versions FIRST (the unknown-time version is the oldest history
    entry, superseded by every dated one) — stated on both engines
    because the two default opposite NULL positions (round-7
    adversarial events fuzz)."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_first(), "event_id"
    )
    ev = _events(spark, sf_dir)
    return ev.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        "event_id",
        F.col("value").alias("val"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@query(
    "ev_interval_join",
    bench=True,
    pure_plan=True,
    refs="beyond:joins,T4",
    oracle="""
    WITH win AS (
        SELECT event_id AS win_id, user_id, ts AS w_start,
               ts + INTERVAL 2 HOUR AS w_end
        FROM events WHERE event_type = 'signup'
    ),
    pts AS (SELECT user_id, ts, value FROM events),
    pairs AS (
        SELECT w.win_id, p.ts, p.value
        FROM win w JOIN pts p
          ON p.user_id = w.user_id AND p.ts >= w.w_start AND p.ts < w.w_end
    ),
    agg AS (
        SELECT win_id, CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS first_ts, round(min(value), 6) AS min_value,
               round(max(value), 6) AS max_value
        FROM pairs GROUP BY win_id
    )
    SELECT w.win_id, coalesce(a.n_events, 0) AS n_events,
           a.first_ts, a.min_value, a.max_value
    FROM win w LEFT JOIN agg a ON a.win_id = w.win_id
    """,
)
def ev_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) containment join via time-bucketing
    (operators/asof.py:interval_join): events landing inside each
    signup's 2-hour window. A key-only join leaves the range predicate
    as a post-filter, materializing every (event, window) pair of a
    heavy user before filtering; bucketing puts time INTO the hash key
    — (user, 2h-bucket) — so candidates are only pairs sharing a time
    window and the join stays linear under key skew. Aggregates are
    order-insensitive (count/min/max) so the compare is exact."""
    from ..operators.asof import interval_join

    ev = _events(spark, sf_dir)
    windows = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
    )
    points = ev.select("user_id", "ts", "value")
    pairs = interval_join(
        points, windows, key="user_id", point_time="ts",
        start_col="w_start", end_col="w_end", bucket_seconds=7200,
    )
    agg = pairs.groupBy("win_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )
    return windows.join(agg, "win_id", "left").select(
        "win_id",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        "first_ts", "min_value", "max_value",
    )


@query(
    "ev_funnel",
    refs="beyond:analytics,T4",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t_signup FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts >= s1.t_signup
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN s2 ON s2.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s2.t_click
        GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.t_signup, s2.t_click, s3.t_purchase,
           CASE WHEN s3.user_id IS NOT NULL THEN 'purchase'
                WHEN s2.user_id IS NOT NULL THEN 'click'
                ELSE 'signup' END AS reached
    FROM s1
    LEFT JOIN s2 ON s2.user_id = s1.user_id
    LEFT JOIN s3 ON s3.user_id = s1.user_id
    """,
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (signup -> first subsequent click ->
    first subsequent purchase): each stage is a conditional min over the
    SAME user-keyed stream, so the three aggregates and two left joins
    all reuse one user_id partitioning — Catalyst plans a single
    exchange chain, no re-shuffle per stage. The per-user funnel frame
    (t_signup, t_click, t_purchase, reached) is the input every
    conversion report aggregates."""
    ev = _events(spark, sf_dir)
    s1 = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t_signup")
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id", "t_signup", "t_click", "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), "purchase")
            .when(F.col("t_click").isNotNull(), "click")
            .otherwise("signup")
            .alias("reached"),
        )
    )
