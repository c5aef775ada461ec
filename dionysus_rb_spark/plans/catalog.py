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

# Queries whose CURRENT plan has a green (rows+schema+hash) driver
# CORRECTNESS row. The driver samples ~50 of the catalog per round;
# ``all_queries()`` enumerates the non-certified names FIRST so a
# prefix/recency-biased sample reaches them (VERDICT r2, item 1).
#
# Round-5 regeneration rule (VERDICT r4, item 1, now standing policy):
# start from the union of green rows across all CORRECTNESS_r0*.json,
# then REMOVE any query whose plan (or a shared helper it calls)
# changed after its last green row — a stale row certifies the old
# plan, not the shipped one. Removed this round:
#   - the 14 round-4-reworked PQ/IVF/k-means/CC/text-count queries
#     (emb_pq_*, ann_ivf*, ann_lsh_neardup, emb_kmeans,
#     emb_cosine_neardup, dd_dup_clusters, dd_dedup_final,
#     samp_cluster_split, t_doc_frequency, t_tfidf_keywords,
#     t_lm_quality) — none appeared in the r4 sample;
#   - j3_observer_fanout — round 5 dropped its two forced broadcasts;
#   - dd_minhash_lsh — round 5 compiled the signature/band/pair
#     expressions to F.expr strings (same tree, ~1 Py4J call) and its
#     CC/graph consumers fold the first propagation round into init
#     (the CC consumers were already in the uncertified partition);
#   - pipe_corpus_filter, pipe_full_curation — round 5 staged the
#     scored frame ahead of the gates (one evaluation of the heavy
#     text expressions instead of scan-filter re-derivation);
#   - emb_outlier_filter — round 5 staged the assignment frame its
#     quantile and join-back consumers shared (one pass, not two);
#   - dd_simhash — round 5 replaced the guarantee-free high-half
#     single block with 4x8-bit pigeonhole banding (radius 3,
#     complete) and removed the fingerprint-recomputing self-join;
#   - j2_dependency_parent_fanout, j4_to_many_reconciliation,
#     j7_observer_overflow — round 5 dropped their forced broadcasts
#     of data-proportional key sets (time-windowed fact-table keys /
#     event-derived id sets), completing the j3 audit rule: AQE now
#     owns those joins;
#   - ev_sessionize — round 5 fixed a second-truncation bug in the gap
#     comparison (ts.cast("long") truncated before differencing, so a
#     1800.4 s gap could read 1800 and miss the session split; now
#     unix_micros, exact vs the oracle's INTERVAL comparison). Found
#     by the 10x fuzz corpus; invisible on the driver data so the old
#     green row certified a latently-wrong plan.
_DRIVER_CERTIFIED: frozenset[str] = frozenset({
    "a1_keep_latest_dedup", "a2_consecutive_dedup", "ann_bruteforce_topk",
    "ann_recall_eval", "cdc_scd2_history", "cs_changeset_from_versions",
    "ctx_pack_sequences", "d1_batched_envelope_roundtrip",
    "d1_envelope_roundtrip", "d2d7_canonical_flatten", "d4_aggregate_dismantle",
    "d5_polymorphic_routing", "d8_synced_data_backfill", "dd_bloom_gate",
    "dd_contamination", "dd_exact_dedup",
    "dd_ngram_jaccard", "dd_passage_dedup",
    "emb_label_centroids", "emb_quantize_int8",
    "emb_semantic_dedup", "enc_changeset_roundtrip", "ev_funnel", "ev_interval_join",
    "f10_mark_failed_backoff", "f11_deleted_resource_guard",
    "f1_guarded_merge_snapshot", "f2_soft_delete_classifier", "f4_message_filter",
    "f5f7_genesis_scan", "f9_publish_suppression", "fn_names_keys_roundtrip",
    "g1_latency_metrics", "g3_genesis_batch_plan", "g4_per_key_batches",
    "g5_salted_skew_agg",
    "j5_to_one_resolution", "j6_resource_refetch",
    "j8_asof_join", "lc_local_changes_audit",
    "mm_binary_metadata", "mm_chunk_media", "mm_decode_features", "mm_embed_lsh",
    "mm_frame_sample", "mm_shared_segments", "o2_publish_fifo_position",
    "o4_genesis_id_batches", "p3_aggregate_assembly", "p4_serializer_dispatch",
    "p5_deleted_projection", "p6_serialization_bypass",
    "s10_tombstone_merge", "s1_lifecycle_capture",
    "s2_drain_two_cycles",
    "s2_outbox_publishable_scan", "s3_pending_topics", "s5_genesis_topic_fanout",
    "samp_domain_cap", "samp_mix_epochs", "samp_rebalance",
    "samp_token_budget", "samp_train_split", "sql_shared_dialect",
    "stream_t1_replay_dedup",
    "stream_t4_sessionize", "stream_t5_snapshot_merge", "t_bpe_token_count",
    "t_char_entropy", "t_cms_heavy_hitters", "t_corpus_stats",
    "t_fingerprint", "t_kmv_distinct", "t_lang_id", "t_quality_score",
    "t_redact_pii", "t_repetition_quality", "t_token_stats",
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
