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
# CORRECTNESS row, mapped to the round of that row. The driver samples
# ~50 of the catalog per round; ``all_queries()`` enumerates the
# non-certified names FIRST (VERDICT r2, item 1) and, since round 6,
# orders the certified remainder OLDEST ROW FIRST so the sample's tail
# re-certifies the longest-unsampled queries (staleness rotation,
# VERDICT r5 item 2 — r1/r2-era rows were 4 rounds old).
#
# Round-6 regeneration (standing policy since VERDICT r4 item 1):
# start from the union of green rows across all CORRECTNESS_r0*.json —
# after round 5 that union covers all 103 prior queries with every row
# certifying the then-shipped plan — then REMOVE any query whose plan
# (or a shared helper it calls) changed after its last green row.
# Removed this round:
#   - dd_simhash — round 6 cast the vote mask in simhash() to long
#     (shiftleft on an int literal wraps the shift count mod 32; the
#     32-bit results are provably unchanged — bit 31's sign-extended
#     int mask selects the same bit — but the expression tree the r5
#     row certified is not the shipped one);
#   - dd_simhash_wide — new in round 6 (the corpus-regime 60-bit
#     fingerprint, VERDICT r5 item 1; the judge authorized growing the
#     catalog freeze to 104 for exactly this entry);
#   - t_tfidf_keywords — round 6 moved the in-plan doc-count crossJoin
#     from the tf-row-sized scored frame onto the vocabulary-sized df
#     frame (idf computed once per token; scores bit-identical, plan
#     tree not the one the r5 row certified);
#   - t_lm_quality — round 6 applied the same move to the bigram LM:
#     logp evaluates on the distinct-bigram model frame (unigram join,
#     vocab decoration, log() all model-sized) and the occurrence
#     stream takes one join against the finished model.
_CERTIFIED_ROUND: dict[str, int] = {
    # round 1 rows (oldest — rotation samples these first)
    "dd_exact_dedup": 1, "t_corpus_stats": 1, "t_fingerprint": 1,
    "t_lang_id": 1, "t_redact_pii": 1, "t_url_extraction": 1,
    # round 2
    "t_bpe_token_count": 2, "t_quality_score": 2, "t_token_stats": 2,
    # round 3
    "ann_bruteforce_topk": 3, "ann_recall_eval": 3, "dd_bloom_gate": 3,
    "dd_contamination": 3, "dd_ngram_jaccard": 3, "dd_passage_dedup": 3,
    "emb_label_centroids": 3, "emb_quantize_int8": 3, "emb_semantic_dedup": 3,
    "mm_binary_metadata": 3, "mm_chunk_media": 3, "mm_decode_features": 3,
    "mm_embed_lsh": 3, "mm_frame_sample": 3, "mm_shared_segments": 3,
    "samp_domain_cap": 3, "samp_mix_epochs": 3, "samp_rebalance": 3,
    "samp_train_split": 3, "stream_t5_snapshot_merge": 3, "t_char_entropy": 3,
    "t_cms_heavy_hitters": 3, "t_kmv_distinct": 3, "t_repetition_quality": 3,
    # round 4
    "cdc_scd2_history": 4, "cs_changeset_from_versions": 4,
    "ctx_pack_sequences": 4, "d1_batched_envelope_roundtrip": 4,
    "d1_envelope_roundtrip": 4, "d2d7_canonical_flatten": 4,
    "d4_aggregate_dismantle": 4, "d5_polymorphic_routing": 4,
    "d8_synced_data_backfill": 4, "enc_changeset_roundtrip": 4,
    "ev_funnel": 4, "ev_interval_join": 4, "g5_salted_skew_agg": 4,
    "j8_asof_join": 4, "p3_aggregate_assembly": 4, "p4_serializer_dispatch": 4,
    "s1_lifecycle_capture": 4, "samp_token_budget": 4,
    "stream_t1_replay_dedup": 4, "stream_t4_sessionize": 4,
    # round 5
    "a1_keep_latest_dedup": 5, "a2_consecutive_dedup": 5, "ann_ivf_topk": 5,
    "ann_ivfpq_topk": 5, "ann_lsh_neardup": 5, "dd_dedup_final": 5,
    "dd_dup_clusters": 5, "dd_minhash_lsh": 5, "emb_cosine_neardup": 5,
    "emb_kmeans": 5, "emb_outlier_filter": 5, "emb_pq_adc_topk": 5,
    "emb_pq_encode": 5, "emb_pq_trained": 5, "ev_sessionize": 5,
    "f10_mark_failed_backoff": 5, "f11_deleted_resource_guard": 5,
    "f1_guarded_merge_snapshot": 5, "f2_soft_delete_classifier": 5,
    "f4_message_filter": 5, "f5f7_genesis_scan": 5, "f9_publish_suppression": 5,
    "fn_names_keys_roundtrip": 5, "g1_latency_metrics": 5,
    "g3_genesis_batch_plan": 5, "g4_per_key_batches": 5,
    "j2_dependency_parent_fanout": 5, "j3_observer_fanout": 5,
    "j4_to_many_reconciliation": 5, "j5_to_one_resolution": 5,
    "j6_resource_refetch": 5, "j7_observer_overflow": 5,
    "lc_local_changes_audit": 5, "o2_publish_fifo_position": 5,
    "o4_genesis_id_batches": 5, "p5_deleted_projection": 5,
    "p6_serialization_bypass": 5, "pipe_corpus_filter": 5,
    "pipe_full_curation": 5, "s10_tombstone_merge": 5,
    "s2_drain_two_cycles": 5, "s2_outbox_publishable_scan": 5,
    "s3_pending_topics": 5, "s5_genesis_topic_fanout": 5,
    "samp_cluster_split": 5, "sql_shared_dialect": 5, "t_doc_frequency": 5,
}

_DRIVER_CERTIFIED: frozenset[str] = frozenset(_CERTIFIED_ROUND)


def query(name: str, oracle: str | None = None, refs: str = "", bench: bool = False):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, refs, bench, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    # Stable partition: never-driver-certified queries first (in their
    # registration order), then the certified ones OLDEST green row
    # first (staleness rotation — the driver's ~50-query prefix-biased
    # sample re-certifies what has gone longest unsampled). sorted() is
    # stable, so registration order breaks ties within a round.
    return dict(
        sorted(
            _REGISTRY.items(),
            key=lambda kv: _CERTIFIED_ROUND.get(kv[0], 0),
        )
    )
