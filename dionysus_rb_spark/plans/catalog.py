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

# Queries with a green (rows+schema+hash) driver CORRECTNESS row in any
# round so far (union of CORRECTNESS_r01/r02/r03.json). The driver samples
# ~50 of the catalog per round; ``all_queries()`` enumerates the
# never-green names FIRST so a prefix/recency-biased sample reaches them
# (VERDICT r2, "Next round" item 1). As of round 4 the only never-green
# names are the three round-3 hash-mismatch queries (ctx_pack_sequences,
# samp_token_budget, pipe_full_curation — oracle HUGEINT casts fixed this
# round), so they lead the enumeration and get re-certified.
_DRIVER_CERTIFIED: frozenset[str] = frozenset({
    "a1_keep_latest_dedup", "a2_consecutive_dedup", "ann_bruteforce_topk",
    "ann_ivf_topk", "ann_ivfpq_topk", "ann_lsh_neardup", "ann_recall_eval",
    "cdc_scd2_history", "cs_changeset_from_versions", "d1_batched_envelope_roundtrip",
    "d1_envelope_roundtrip", "d2d7_canonical_flatten", "d4_aggregate_dismantle",
    "d5_polymorphic_routing", "d8_synced_data_backfill", "dd_bloom_gate",
    "dd_contamination", "dd_dedup_final", "dd_dup_clusters", "dd_exact_dedup",
    "dd_minhash_lsh", "dd_ngram_jaccard", "dd_passage_dedup", "dd_simhash",
    "emb_cosine_neardup", "emb_kmeans", "emb_label_centroids", "emb_outlier_filter",
    "emb_pq_adc_topk", "emb_pq_encode", "emb_pq_trained", "emb_quantize_int8",
    "emb_semantic_dedup", "enc_changeset_roundtrip", "ev_funnel", "ev_interval_join",
    "ev_sessionize", "f10_mark_failed_backoff", "f11_deleted_resource_guard",
    "f1_guarded_merge_snapshot", "f2_soft_delete_classifier", "f4_message_filter",
    "f5f7_genesis_scan", "f9_publish_suppression", "fn_names_keys_roundtrip",
    "g1_latency_metrics", "g3_genesis_batch_plan", "g4_per_key_batches",
    "g5_salted_skew_agg", "j2_dependency_parent_fanout", "j3_observer_fanout",
    "j4_to_many_reconciliation", "j5_to_one_resolution", "j6_resource_refetch",
    "j7_observer_overflow", "j8_asof_join", "lc_local_changes_audit",
    "mm_binary_metadata", "mm_chunk_media", "mm_decode_features", "mm_embed_lsh",
    "mm_frame_sample", "mm_shared_segments", "o2_publish_fifo_position",
    "o4_genesis_id_batches", "p3_aggregate_assembly", "p4_serializer_dispatch",
    "p5_deleted_projection", "p6_serialization_bypass", "pipe_corpus_filter",
    "s10_tombstone_merge", "s1_lifecycle_capture", "s2_drain_two_cycles",
    "s2_outbox_publishable_scan", "s3_pending_topics", "s5_genesis_topic_fanout",
    "samp_cluster_split", "samp_domain_cap", "samp_mix_epochs", "samp_rebalance",
    "samp_train_split", "sql_shared_dialect", "stream_t1_replay_dedup",
    "stream_t4_sessionize", "stream_t5_snapshot_merge", "t_bpe_token_count",
    "t_char_entropy", "t_cms_heavy_hitters", "t_corpus_stats", "t_doc_frequency",
    "t_fingerprint", "t_kmv_distinct", "t_lang_id", "t_lm_quality", "t_quality_score",
    "t_redact_pii", "t_repetition_quality", "t_tfidf_keywords", "t_token_stats",
    "t_url_extraction",
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
