"""Plan lint: the round-5 staged frames must stay staged.

Filtering on computed score columns lets Catalyst re-derive the heavy
expressions inside the scan-stage filter (predicate pushdown +
constraint inference — non-deterministic barriers do NOT stop the
latter, measured), so these queries persist the scored/assignment
frame and gate on attributes. If a refactor drops the persist, the
plans silently regress to double evaluation; this lint pins the staged
shape: an InMemoryTableScan feeding the gate."""

from __future__ import annotations

import os

import pytest

from dionysus_rb_spark.plans import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

STAGED = ["pipe_corpus_filter", "pipe_full_curation", "emb_outlier_filter"]


@pytest.mark.parametrize("name", STAGED)
def test_staged_frame_feeds_the_gate(spark, name):
    df = all_queries()[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, (
        f"{name}: expected the gate to read a persisted (staged) frame; "
        "without it Catalyst re-derives the scoring expressions in the "
        "scan-stage filter"
    )
