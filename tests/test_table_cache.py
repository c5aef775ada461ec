"""Invariants of the per-session table memoization (tables.py).

load_table caches the immutable DataFrame handle on the Python session
object; ensure_min_parallelism caches the scan-partition probe and the
spread frame on that handle. If either cache leaked across sessions or
returned a different plan, query construction would silently diverge —
these checks pin the contract."""

from __future__ import annotations

import os

from dionysus_rb_spark.tables import ensure_min_parallelism, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_load_table_returns_the_same_handle(spark):
    a = load_table(spark, SF_DIR, "documents")
    b = load_table(spark, SF_DIR, "documents")
    assert a is b
    # distinct tables and distinct sf_dirs do not collide
    c = load_table(spark, SF_DIR, "embeddings")
    assert c is not a
    assert set(spark._dionysus_table_cache) >= {
        os.path.join(SF_DIR, "documents.parquet"),
        os.path.join(SF_DIR, "embeddings.parquet"),
    }


def test_events_timestamp_conversion_survives_caching(spark):
    a = load_table(spark, SF_DIR, "events")
    b = load_table(spark, SF_DIR, "events")
    assert a is b
    assert dict(a.dtypes)["ts"] == "timestamp"


def test_ensure_min_parallelism_memoizes_probe_and_spread(spark):
    df = load_table(spark, SF_DIR, "documents")
    s1 = ensure_min_parallelism(df)
    s2 = ensure_min_parallelism(df)
    assert isinstance(df._dionysus_scan_parts, int)
    # testdata files are single-row-group -> the spread frame kicks in
    # and repeated calls reuse one handle
    if df._dionysus_scan_parts < spark.sparkContext.defaultParallelism:
        assert s1 is s2
        assert s1 is not df
    # an explicit different target builds a fresh spread, not the cached one
    s3 = ensure_min_parallelism(df, min_parts=df._dionysus_scan_parts)
    assert s3 is df
