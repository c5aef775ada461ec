"""Registry of (name -> spark query, duckdb oracle) pairs.

Every operator claimed done in SURVEY §2 gets one entry here: a Spark
callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the
equivalent ANSI SQL DuckDB runs on the same parquet views. Column names
are aliased identically on both sides — the driver sorts columns by name
before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: SparkQuery
    oracle: str | None
    refs: str  # SURVEY §2 operator ids this query certifies, e.g. "A1,O3"
    bench: bool = False  # include in bench.py headline set
    doc: str = field(default="", repr=False)


_REGISTRY: dict[str, QueryDef] = {}

# Queries with a green driver CORRECTNESS row as of round 2 (union of
# CORRECTNESS_r01.json / CORRECTNESS_r02.json). The driver samples ~50 of
# the catalog per round; ``all_queries()`` enumerates the never-certified
# names FIRST so a prefix/recency-biased sample reaches them (VERDICT r2,
# "Next round" item 1). Relative order within each group is preserved.
_DRIVER_CERTIFIED: frozenset[str] = frozenset({
    "a1_keep_latest_dedup", "a2_consecutive_dedup", "s2_outbox_publishable_scan",
    "s3_pending_topics", "f10_mark_failed_backoff", "f1_guarded_merge_snapshot",
    "f2_soft_delete_classifier", "j2_dependency_parent_fanout",
    "j4_to_many_reconciliation", "j6_resource_refetch", "g1_latency_metrics",
    "g3_genesis_batch_plan", "s5_genesis_topic_fanout", "s10_tombstone_merge",
    "s2_drain_two_cycles", "lc_local_changes_audit", "sql_shared_dialect",
    "fn_names_keys_roundtrip", "p5_deleted_projection", "p6_serialization_bypass",
    "f4_message_filter", "f5f7_genesis_scan", "f9_publish_suppression",
    "f11_deleted_resource_guard", "j5_to_one_resolution", "j7_observer_overflow",
    "g4_per_key_batches", "o2_publish_fifo_position", "o4_genesis_id_batches",
    "cs_changeset_from_versions", "enc_changeset_roundtrip",
    "d2d7_canonical_flatten", "d5_polymorphic_routing", "d4_aggregate_dismantle",
    "s1_lifecycle_capture", "p4_serializer_dispatch", "g5_salted_skew_agg",
    "j8_asof_join", "cdc_scd2_history", "ev_interval_join", "ev_funnel",
    "d1_envelope_roundtrip", "d1_batched_envelope_roundtrip",
    "p3_aggregate_assembly", "d8_synced_data_backfill", "stream_t1_replay_dedup",
    "stream_t4_sessionize", "t_token_stats", "t_bpe_token_count",
    "t_quality_score", "t_lang_id", "t_fingerprint", "t_corpus_stats",
    "t_redact_pii", "t_url_extraction", "ev_sessionize", "dd_exact_dedup",
    "dd_minhash_lsh", "dd_dup_clusters",
})


def query(name: str, oracle: str | None = None, refs: str = "", bench: bool = False):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, refs, bench, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    # Stable partition: never-driver-certified queries first (in their
    # registration order), then the already-certified ones.
    return dict(
        sorted(_REGISTRY.items(), key=lambda kv: kv[0] in _DRIVER_CERTIFIED)
    )
