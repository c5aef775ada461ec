"""Pin the pure_plan construction memo (optimization r13).

The bench's per-pass wall was ~30% driver-side query CONSTRUCTION
(Python/Py4J chatter at ~1-3 ms a roundtrip), which a production driver
pays once per run — so catalog queries audited as pure plan builders
memoize their constructed DataFrame per (session, sf_dir). These tests
pin the two claims that make that safe:

1. purity: a pure_plan fn launches NO Spark job during construction
   (else repeated bench passes would silently skip real work — the
   gaming class the audit exists to prevent);
2. identity: the memoized handle recomputes from the base tables on
   every action (results identical across clearCache and with the memo
   disabled).
"""

from __future__ import annotations

import os

import pytest

from dionysus_rb_spark.plans import all_queries
from dionysus_rb_spark.tables import load_all


def _n_jobs(spark) -> int:
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup() or [])


def test_pure_plan_constructions_launch_no_jobs(spark, sf_dir):
    # pre-warm table handles: load_table's one-time events schema
    # inference is session scoped and not part of query construction
    load_all(spark, sf_dir)
    qs = all_queries()
    pure = {n: q for n, q in qs.items() if q.pure_plan}
    assert len(pure) >= 20  # the audited bench set
    for name, q in pure.items():
        before = _n_jobs(spark)
        q.fn(spark, sf_dir)
        after = _n_jobs(spark)
        assert after == before, (
            f"{name} is flagged pure_plan but launched {after - before} "
            "job(s) during construction — drop the flag or the eager work"
        )


def test_eager_queries_are_not_memoized(spark, sf_dir):
    qs = all_queries()
    # the CC/ingest/codebook queries do real work in fn: they must NOT
    # carry the memo flag, so every timed pass re-pays that work
    for name in (
        "dd_dedup_final",
        "samp_cluster_split",
        "emb_pq_adc_topk",
        "pipe_corpus_shard_roundtrip",
        "pipe_jsonl_ingest_roundtrip",
    ):
        assert not qs[name].pure_plan, name


def test_memo_handle_recomputes_identically(spark, sf_dir):
    qs = all_queries()
    q = qs["t_tfidf_keywords"]
    df1 = q.fn(spark, sf_dir)
    assert q.fn(spark, sf_dir) is df1  # memo hit
    r1 = sorted(map(tuple, df1.collect()))
    spark.catalog.clearCache()  # drop all cached data: next action recomputes
    r2 = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    assert r1 == r2 and r1
    # and the memoized plan equals a fresh, unmemoized construction
    os.environ["SPARK_GRAFT_QUERY_MEMO"] = "0"
    try:
        fresh = q.fn(spark, sf_dir)
        assert fresh is not df1
        r3 = sorted(map(tuple, fresh.collect()))
    finally:
        os.environ.pop("SPARK_GRAFT_QUERY_MEMO", None)
    assert r1 == r3


@pytest.mark.parametrize("name", ["dd_minhash_lsh", "pipe_full_curation"])
def test_memo_survives_clear_cache_on_persisting_plans(spark, sf_dir, name):
    """Plans containing lazy persist() must recompute cleanly after the
    bench's clearCache() between passes."""
    q = all_queries()[name]
    df = q.fn(spark, sf_dir)
    r1 = df.count()
    spark.catalog.clearCache()
    assert q.fn(spark, sf_dir).count() == r1


@pytest.mark.parametrize("name", ["dd_minhash_lsh", "pipe_full_curation"])
def test_memo_hit_restages_persists_after_clear_cache(spark, sf_dir, name):
    """clearCache() unREGISTERS in-plan persist staging (not just the
    cached bytes), so a memo hit must re-register it: the executed plan
    of a post-clearCache hit has to show the same InMemoryTableScan
    staging points as a fresh construction — without this, passes 2+ of
    the bench silently measured a different (unstaged) physical plan
    (caught by tests/test_plan_staging.py on the first full-suite run
    after the memo landed)."""
    q = all_queries()[name]
    q.fn(spark, sf_dir)  # populate the memo (and register staging)
    spark.catalog.clearCache()  # drops data AND the cache registration
    df = q.fn(spark, sf_dir)  # memo hit: must re-register staging
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, (
        f"{name}: memo hit lost its persist staging after clearCache()"
    )
