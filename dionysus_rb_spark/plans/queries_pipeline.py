"""Serialization-pipeline queries: wire-format codec and aggregate
assembly/dismantling, oracle-checked on the TPC-H-ish tables
(FIXTURES.md §7: orders+lineitem play parent+children aggregates)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..producer.serializer import ChildRel, serialize_aggregate
from ..sources.envelope import decode_envelope, encode_envelope
from ..tables import load_table
from .catalog import query

_SNAPSHOT = StructType(
    [StructField("id", LongType()), StructField("value", DoubleType())]
)


@query(
    "d1_envelope_roundtrip",
    refs="P7,D1,S4",
    oracle="""
    SELECT event_type || '_updated' AS event,
           'Event' AS model_name,
           event_id AS synced_id,
           value AS val
    FROM events
    """,
)
def d1_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 encode -> D1 decode roundtrip: each event becomes a one-event
    envelope ({"message":[{event,model_name,data:[snapshot]}]}), is
    serialized to the wire JSON, parsed back, exploded, and flattened.
    The oracle is the identity projection — any codec asymmetry
    (key order, type coercion, null handling) breaks the match."""
    ev = load_table(spark, sf_dir, "events")
    enveloped = encode_envelope(
        ev,
        event=F.concat(F.col("event_type"), F.lit("_updated")),
        model_name=F.lit("Event"),
        data=F.array(F.struct(F.col("event_id").alias("id"), F.col("value"))),
        key=F.concat(F.lit("Event:"), F.col("event_id").cast("string")),
    )
    decoded = decode_envelope(enveloped, _SNAPSHOT)
    return decoded.select(
        "event",
        "model_name",
        F.col("record.id").alias("synced_id"),
        F.col("record.value").alias("val"),
    )


@query(
    "d1_batched_envelope_roundtrip",
    refs="P7,D1,G4",
    oracle="""
    SELECT user_id, event_id AS synced_id, value AS val,
           event_type || '_updated' AS event
    FROM events
    """,
)
def d1_batched_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 batched encode -> D1 decode roundtrip: all of a user's events
    pack into ONE wire message ({"message":[e1,e2,…]}, the responder's
    buffering), then explode back out — counts and values must survive
    the pack/unpack exactly."""
    from pyspark.sql import functions as F

    from ..sources.envelope import encode_envelope_batch

    ev = load_table(spark, sf_dir, "events")
    packed = encode_envelope_batch(
        ev,
        ["user_id"],
        event=F.concat(F.col("event_type"), F.lit("_updated")),
        model_name=F.lit("Event"),
        snapshot=F.struct(F.col("event_id").alias("id"), F.col("value")),
        order_col="event_id",
    )
    decoded = decode_envelope(packed, _SNAPSHOT, keep_cols=("user_id",))
    return decoded.select(
        "user_id",
        F.col("record.id").alias("synced_id"),
        F.col("record.value").alias("val"),
        "event",
    )


@query(
    "p3_aggregate_assembly",
    refs="P1,P2,P3,J2",
    bench=True,
    pure_plan=True,
    oracle="""
    SELECT o.o_orderkey,
           o.o_custkey AS customer_id,
           count(l.l_orderkey) AS n_lines,
           coalesce(string_agg(CAST(l.l_linenumber AS VARCHAR), ','
                               ORDER BY l.l_linenumber), '') AS line_ids_csv
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_custkey
    """,
)
def p3_aggregate_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3 aggregate serialization (model_serializer.rb:63-89): orders
    sideload their lineitems — children grouped once on the FK
    (collect_list of id + object structs, deterministic order), one left
    join to the parent; the probe projects the payload struct back out."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    agg = serialize_aggregate(
        orders,
        parent_id="o_orderkey",
        attributes=["o_custkey", "o_totalprice"],
        to_one_links={"customer": "o_custkey"},
        has_many={
            "lineitems": ChildRel(
                child=lineitem,
                fk="l_orderkey",
                child_id="l_linenumber",
                attributes=["l_quantity", "l_extendedprice"],
                order_col="l_linenumber",
            )
        },
    )
    return agg.select(
        F.col("payload.id").alias("o_orderkey"),
        F.col("payload.links.customer").alias("customer_id"),
        # ids array is coalesced to [] for childless parents (sideload
        # objects stay NULL, matching "no inline children" semantics)
        F.size("payload.links.lineitems").alias("n_lines"),
        F.array_join(
            F.transform(F.col("payload.links.lineitems"), lambda x: x.cast("string")),
            ",",
        ).alias("line_ids_csv"),
    ).withColumn("n_lines", F.col("n_lines").cast("long"))


@query(
    "d8_synced_data_backfill",
    refs="D8",
    oracle="""
    SELECT event_id,
           TRY_CAST((CASE WHEN props IS NOT NULL AND json_valid(props)
                          THEN props->>'$.k' END) AS INT) AS k
    FROM events
    """,
)
def d8_synced_data_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 column backfill from the archived payload
    (assign_columns_from_synced_data.rb:11-26): re-extract a chosen
    column from the stored JSON over the whole table —
    ``get_json_object`` stays JVM-side (no UDF). Archived payloads are
    DIRTY by definition (that's why they're being re-extracted), so the
    extraction is total: malformed JSON yields NULL (get_json_object is
    lenient; the oracle needs an explicit json_valid guard because
    DuckDB's ->> raises on invalid JSON), and a non-numeric value under
    the key yields NULL via try_cast on both engines (the plain ANSI
    cast raised on the Spark side — round-7 adversarial events fuzz)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("k"),
    )


_STREAM_Q_SEQ = [0]  # deterministic per-session memory-sink name counter


def _stage_events_replays(sf_dir: str, src_dir: str, replays: int) -> None:
    """Stage ``replays`` copies of the events table into a file-stream
    source directory.

    Layout-agnostic on purpose: a table path is a single parquet file in
    the driver fixtures but a DIRECTORY of part files on any production
    table (and in tests/test_layout_invariance.py's scrambled twin), so
    staging must enumerate whichever shape it finds. Staged names are
    zero-padded so their lexicographic order matches enumeration order
    (copy0_10 must not sort between copy0_1 and copy0_2); note the
    file-stream source orders primarily by modification time, so
    micro-batch COMPOSITION under maxFilesPerTrigger is not a pinned
    contract here — the streaming results themselves are split-
    independent (stream_t5's monotone-merge argument, and every twin's
    output is set-compared)."""
    import shutil
    from pathlib import Path

    src = Path(sf_dir) / "events.parquet"
    parts = sorted(src.glob("*.parquet")) if src.is_dir() else [src]
    for r in range(replays):
        for j, p in enumerate(parts):
            shutil.copy(p, f"{src_dir}/copy{r:03d}_{j:05d}.parquet")


@query(
    "stream_t1_replay_dedup",
    refs="T1,T5,S6",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM events
    WHERE ts IS NOT NULL AND ts > TIMESTAMP '1970-01-01 00:00:00'
    """,
)
def stream_t1_replay_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 at-least-once replay suppression, ORACLE-CHECKED end to end
    through a real Structured Streaming run: the file source reads TWO
    copies of the events table (every record replayed once, the
    at-least-once delivery worst case), the stream dedups on event_id
    within the watermark (dropDuplicatesWithinWatermark — JVM state,
    no Python), and the memory-sink result must equal the plain
    distinct table. The output is a SET (order-insensitive compare), so
    the streaming run is deterministic however the micro-batches
    split. State is bounded by the watermark horizon, not history."""
    import tempfile

    from ..streaming.dedup_stream import exact_dedup_stream

    ev = load_table(spark, sf_dir, "events")
    src_dir = tempfile.mkdtemp(prefix="replay_src_")
    _stage_events_replays(sf_dir, src_dir, replays=2)

    # stream with the RAW parquet schema (ts may be nanos-as-long),
    # then normalize exactly like tables.load_table does
    raw_batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = spark.readStream.schema(raw_batch.schema).parquet(src_dir)
    if dict(raw_batch.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    # explicit event-time domain: rows with a NULL or pre-epoch ts are
    # excluded UP FRONT on both engines. The watermark machinery would
    # drop them anyway — Spark's initial watermark is epoch 0, so a
    # 1969 row is "late" from the first batch, and the eviction is
    # INCLUSIVE at the boundary (an event at exactly epoch 0 is dropped
    # too, measured) — but only as a function
    # of how files split into micro-batches; an input-domain filter
    # makes the semantics deterministic instead of incidental (round-7
    # adversarial events fuzz).
    stream = stream.filter(
        F.col("ts").isNotNull()
        & (F.col("ts") > F.lit("1970-01-01 00:00:00").cast("timestamp"))
    )
    deduped = exact_dedup_stream(
        stream, ["event_id"], "ts", watermark="10 minutes"
    )
    _STREAM_Q_SEQ[0] += 1
    name = f"replay_dedup_{_STREAM_Q_SEQ[0]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@query(
    "stream_t4_sessionize",
    refs="T4,T5,S6",
    oracle="""
    WITH dom AS (
        SELECT user_id, ts FROM events
        WHERE ts IS NOT NULL AND ts > TIMESTAMP '1970-01-01 00:00:00'
    ),
    lagged AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM dom
    ),
    marked AS (
        SELECT user_id, ts,
               CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM lagged
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    ),
    agg AS (
        SELECT user_id, sid,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end
        FROM sess GROUP BY user_id, sid
    )
    SELECT user_id,
           session_start AS window_start,
           session_end + INTERVAL 30 MINUTE AS window_end,
           n_events, session_start, session_end
    FROM agg, (SELECT max(ts) AS mx FROM dom) m
    WHERE session_end + INTERVAL 30 MINUTE <= m.mx - INTERVAL 1 HOUR
    """,
)
def stream_t4_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4/T5 streaming sessionization, ORACLE-CHECKED through a real
    session_window + watermark run: gap sessions (30 min) computed by
    JVM session state, append-mode emission gated by the 1-hour
    event-time watermark. The emitted set is exactly the sessions whose
    window_end (last event + gap) is at or below the final watermark
    (max event time - 1h) — the oracle reproduces both the gap merge
    rule (an event at exactly prev+gap starts a NEW session:
    session_window's half-open [t, t+gap)) and the watermark cut, so
    the lateness semantics themselves are value-checked."""
    import tempfile

    from ..streaming.sessionize import sessionize

    raw_batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_dir = tempfile.mkdtemp(prefix="sess_src_")
    _stage_events_replays(sf_dir, src_dir, replays=1)
    stream = spark.readStream.schema(raw_batch.schema).parquet(src_dir)
    if dict(raw_batch.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    # same explicit event-time domain as stream_t1 (NULL / pre-epoch
    # rows would otherwise be watermark-dropped micro-batch-dependently)
    stream = stream.filter(
        F.col("ts").isNotNull()
        & (F.col("ts") > F.lit("1970-01-01 00:00:00").cast("timestamp"))
    )
    sess = sessionize(
        stream, ["user_id"], "ts", gap="30 minutes", watermark="1 hour"
    )
    _STREAM_Q_SEQ[0] += 1
    name = f"stream_sessions_{_STREAM_Q_SEQ[0]}"
    q = (
        sess.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name).select(
        "user_id", "window_start", "window_end",
        "n_events", "session_start", "session_end",
    )


from .queries_core import F1_ORACLE_SQL  # noqa: E402


@query(
    "stream_t5_snapshot_merge",
    refs="T1,T5,S7,F1,F3,A1",
    # the batch f1 oracle VERBATIM: streaming must land on the same snapshot
    oracle=F1_ORACLE_SQL,
)
def stream_t5_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core consume loop (persistor.rb:46-95) end-to-end
    under REAL Structured Streaming, oracle-checked against the batch f1
    result: even event_ids bootstrap the target snapshot; the odd-id
    event stream is read from files TWICE (at-least-once replay, one
    file per micro-batch via maxFilesPerTrigger=1), F8-filtered, A1
    keep-latest-deduped by per-key stream state
    (applyInPandasWithState), and each micro-batch guarded-MERGEs into
    a versioned snapshot store via foreachBatch. The final snapshot
    must equal the single-batch f1 merge exactly — which holds for ANY
    micro-batch split because the F1 guard (>=) is monotone: per key
    the max-timestamp surviving event wins in every application order,
    and replays are neutralized by idempotent re-merge (T1)."""
    import tempfile

    from ..operators import dedup
    from ..streaming.dedup_stream import keep_latest_stream
    from ..streaming.snapshot_store import SnapshotStore
    from .queries_core import _events

    m = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("synced_id"),
        F.col("ts").alias("synced_updated_at"),
        F.col("value").alias("val"),
        F.when(F.col("event_type") == "error", "destroyed")
        .when(F.col("event_type") == "view", "view_happened")
        .otherwise("updated")
        .alias("event"),
        F.when(F.col("event_type") == "error", F.col("ts")).alias(
            "synced_canceled_at"
        ),
    )
    target = dedup.keep_latest(
        m.filter(F.col("event_id") % 2 == 0),
        ["synced_id"],
        "synced_updated_at",
        ["event_id"],
    ).select(
        "synced_id",
        "synced_updated_at",
        "val",
        F.lit(None).cast("timestamp").alias("synced_canceled_at"),
    )
    store = SnapshotStore(tempfile.mkdtemp(prefix="t5_store_"), key="synced_id")
    store.overwrite(target)

    raw_batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_dir = tempfile.mkdtemp(prefix="t5_src_")
    _stage_events_replays(sf_dir, src_dir, replays=2)
    stream = (
        spark.readStream.schema(raw_batch.schema)
        .option("maxFilesPerTrigger", 1)  # force >1 micro-batch
        .parquet(src_dir)
    )
    if dict(raw_batch.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    mapped = stream.filter(F.col("event_id") % 2 == 1).select(
        "event_id",
        F.col("user_id").alias("synced_id"),
        F.col("ts").alias("synced_updated_at"),
        F.col("value").alias("val"),
        F.when(F.col("event_type") == "error", "destroyed")
        .when(F.col("event_type") == "view", "view_happened")
        .otherwise("updated")
        .alias("event"),
        F.when(F.col("event_type") == "error", F.col("ts")).alias(
            "synced_canceled_at"
        ),
    )
    # F8 before the stateful dedup (the oracle's src CTE filters first)
    known = mapped.filter(F.col("event").isin("created", "updated", "destroyed"))
    deduped = keep_latest_stream(known, ["synced_id"], "synced_updated_at")

    def _merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        store.merge(
            batch_df.sparkSession, batch_df, order_tiebreak="event_id"
        )

    q = (
        deduped.writeStream.foreachBatch(_merge_batch)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="t5_cp_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    snap = store.read(spark)
    return snap.select(
        "synced_id", "synced_updated_at", "val", "synced_canceled_at"
    )


@query(
    "pipe_corpus_shard_roundtrip",
    bench=True,  # the I/O path is the 100 TB cost center (VERDICT r7 item 3)
    refs="S8",
    # nullif mirrors the sink's documented '' -> NULL partition-value
    # normalization (Hive directory encoding conflates the two; the
    # sink makes the conflation explicit on both engines)
    oracle="""
    SELECT nullif(lang, '') AS lang,
           count(*) AS n_docs,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY nullif(lang, '')
    """,
)
def pipe_corpus_shard_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 set-oriented bulk EXPORT, oracle-checked through a real write:
    the documents corpus lands via the sharded sink (lang-partitioned
    directories, content-derived doc_id shards, 2048-row file bound,
    within-file sort — sources/corpus_sink.py) and is re-read from the
    files; the per-lang profile of the re-read corpus must equal the
    profile of the source table, so partition-value round-tripping
    (incl. the NULL partition directory), the file split, and the
    sort/write path are all inside the certified surface. The reference
    ends its bulk path at Postgres inserts (lib/dionysus/utils/ — S8);
    the file-layout concern is the beyond-reference training-corpus
    sink. NULL semantics: sum/min/max ignore NULL n_chars/doc_id and an
    all-NULL group stays NULL (missing is not empty); NULL lang is a
    group like any other, and an EMPTY lang joins it via the sink's
    documented '' -> NULL partition normalization (mirrored by the
    oracle's nullif)."""
    from ..operators.lineage import scratch_dir
    from ..sources.corpus_sink import read_corpus, write_corpus_shards

    docs = load_table(spark, sf_dir, "documents")
    out = scratch_dir(spark, "corpus_shards-")
    write_corpus_shards(
        docs,
        out,
        shard_key="doc_id",
        partition_by=("lang",),
        sort_by=("doc_id",),
        target_rows_per_file=2048,
        shards=8,
        mode="overwrite",
    )
    return (
        read_corpus(spark, out)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "pipe_jsonl_ingest_roundtrip",
    bench=True,  # the I/O path is the 100 TB cost center (VERDICT r7 item 3)
    refs="F4,T9",
    # The oracle profiles the SOURCE table: every document row must
    # come back clean (valid JSONL lines parse; a null field is omitted
    # by to_json and reads back NULL — missing is not empty), and the
    # deterministically injected corrupt lines (one per doc_id % 7 = 0
    # row, 'CORRUPT|' || doc_id) must land in the dead-letter frame
    # with their exact raw text, never be dropped. % is remainder with
    # the dividend's sign on both engines, and NULL % 7 is NULL (not
    # 0), so NULL doc_ids inject nothing on either side.
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(*) FILTER (WHERE text IS NULL) AS n_null_text
    FROM documents GROUP BY lang
    UNION ALL
    SELECT '__dead_letter__' AS lang,
           count(*) AS n_docs,
           CAST(sum(8 + length(CAST(doc_id AS VARCHAR))) AS BIGINT)
             AS total_chars,
           CAST(NULL AS BIGINT) AS n_null_text
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def pipe_jsonl_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/T9 ingestion accounting, oracle-checked through a real raw-text
    landing: the documents corpus is serialized to JSON-lines (to_json
    escapes control chars, so embedded newlines cannot break the line
    framing), interleaved with one deterministic non-JSON line per
    doc_id % 7 == 0 row, written as text files, and re-read via
    sources/text_ingest.read_jsonl under the canonical schema. The
    contract certified here is the F4 message-filter + T9 DLQ analogue
    for batch ingestion (lib/dionysus/consumer — filters divert to a
    DLQ, never drop; README.md:804-852): every input line is either
    parsed clean or dead-lettered with its raw text, so the clean
    per-lang profile equals the source profile exactly and the
    dead-letter row accounts for every injected corruption
    byte-for-byte (total_chars sums the raw line lengths). NULL
    semantics: NULL lang groups like any other and '' stays distinct
    from NULL (no Hive-directory conflation on this path — contrast
    pipe_corpus_shard_roundtrip); an all-NULL n_chars group sums to
    NULL; a zero-corruption corpus still yields the dead-letter row
    with n_docs = 0 and NULL total_chars on both engines."""
    from ..operators.lineage import scratch_dir
    from ..sources.text_ingest import read_jsonl, split_corrupt

    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select(
        F.to_json(
            F.struct("doc_id", "text", "lang", "source", "n_chars")
        ).alias("value")
    ).unionAll(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            F.concat(F.lit("CORRUPT|"), F.col("doc_id").cast("string")).alias(
                "value"
            )
        )
    )
    out = scratch_dir(spark, "jsonl_ingest-")
    lines.write.text(out)
    clean, dead = split_corrupt(read_jsonl(spark, out, table="documents"))
    clean_profile = clean.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.count_if(F.col("text").isNull()).alias("n_null_text"),
    )
    dead_profile = dead.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("raw")).cast("long").alias("total_chars"),
    ).select(
        F.lit("__dead_letter__").alias("lang"),
        "n_docs",
        "total_chars",
        F.lit(None).cast("long").alias("n_null_text"),
    )
    return clean_profile.unionAll(dead_profile)


@query(
    "pipe_csv_ingest_roundtrip",
    refs="F4,T9",
    # The oracle profiles the SOURCE table (the CSV encoding is a
    # Spark-side roundtrip it never sees): every document row must come
    # back clean, and the three deterministically injected positional
    # anomalies — one per doc_id % 11 in (3,4,5) — must land in the
    # dead-letter frame with their exact raw text. Byte accounting: an
    # under-length line is just the doc_id rendering; the over-length
    # and type-mismatch lines append a fixed 14-char suffix. % keeps
    # the dividend's sign on both engines, so negative doc_ids inject
    # nothing on either side, and NULL % 11 is NULL (no injection).
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(*) FILTER (WHERE n_chars IS NULL) AS n_null_chars
    FROM documents GROUP BY lang
    UNION ALL
    SELECT '__dead_letter__' AS lang,
           count(*) AS n_docs,
           CAST(sum(length(CAST(doc_id AS VARCHAR))
                    + CASE WHEN doc_id % 11 = 3 THEN 0 ELSE 14 END)
                AS BIGINT) AS total_chars,
           CAST(NULL AS BIGINT) AS n_null_chars
    FROM documents WHERE doc_id % 11 IN (3, 4, 5)
    """,
)
def pipe_csv_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/T9 ingestion accounting for the OTHER common raw-corpus shape
    (VERDICT r7 item 1): CSV/TSV vendor deliveries, re-read via
    sources/text_ingest.read_csv. CSV is positional, so the anomaly
    surface this query certifies end-to-end is structural, not
    syntactic: an under-length row (doc_id % 11 = 3: one field), an
    over-length row (% 11 = 4: a fourth field appended), and a
    type-mismatched row (% 11 = 5: 'notanum' in the bigint slot) must
    each best-effort parse AND route to the dead-letter frame with
    their raw line — never be dropped (lib/dionysus/consumer — F4
    filters divert to a DLQ; README.md:804-852) — while every source
    row round-trips clean, so the clean per-lang profile equals the
    source profile exactly and the dead-letter row accounts for every
    anomalous line byte-for-byte.

    Encoding choices, each engine-independent: lang travels
    hex-armored with an 'L' prefix ('L' + hex(utf8(lang))) so free-form
    values cannot collide with the delimiter and '' stays distinct
    from NULL (an empty field reads back NULL on this path — missing
    is not empty, so '' must not serialize to the same bytes); NULL
    fields serialize to empty and read back NULL for every column.
    Framing-hostile FREE TEXT (embedded newlines) is deliberately not
    on this path: line-framed CSV cannot carry it without multiLine
    parsing, which is the JSONL reader's job
    (pipe_jsonl_ingest_roundtrip certifies the text column; the quoted
    -separator and quoting shapes are pinned in
    tests/test_text_ingest.py)."""
    from ..operators.lineage import scratch_dir
    from ..sources.text_ingest import read_csv, split_corrupt

    docs = load_table(spark, sf_dir, "documents")
    lang_enc = F.concat(F.lit("L"), F.hex(F.encode(F.col("lang"), "UTF-8")))
    doc_str = F.col("doc_id").cast("string")
    clean_line = F.concat(
        F.coalesce(doc_str, F.lit("")),
        F.lit(","),
        F.coalesce(lang_enc, F.lit("")),
        F.lit(","),
        F.coalesce(F.col("n_chars").cast("string"), F.lit("")),
    )
    m = F.col("doc_id") % 11
    lines = docs.select(clean_line.alias("value")).unionAll(
        docs.filter(m.isin(3, 4, 5)).select(
            F.when(m == 3, doc_str)  # under-length: positional absence
            .when(m == 4, F.concat(doc_str, F.lit(",L656E,7,extra")))
            .otherwise(F.concat(doc_str, F.lit(",L656E,notanum")))
            .alias("value")
        )
    )
    out = scratch_dir(spark, "csv_ingest-")
    lines.write.text(out)
    clean, dead = split_corrupt(
        read_csv(
            spark,
            out,
            schema="doc_id bigint, lang_enc string, n_chars bigint",
            header=False,
        )
    )
    clean_profile = (
        clean.withColumn(
            "lang",
            F.when(
                F.col("lang_enc").isNotNull(),
                F.decode(F.unhex(F.expr("substring(lang_enc, 2)")), "UTF-8"),
            ),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.count_if(F.col("n_chars").isNull()).alias("n_null_chars"),
        )
    )
    dead_profile = dead.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("raw")).cast("long").alias("total_chars"),
    ).select(
        F.lit("__dead_letter__").alias("lang"),
        "n_docs",
        "total_chars",
        F.lit(None).cast("long").alias("n_null_chars"),
    )
    return clean_profile.unionAll(dead_profile)
