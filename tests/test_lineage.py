"""Pins operators/lineage.py: reliable truncation is the default for
iterative operators, auto-provisions a checkpoint dir on single-host
masters, and both modes produce identical results (the executor-loss
difference is pinned by tools/validation/executor_loss_chaos.py, which
needs real executor JVMs)."""

from __future__ import annotations

import pytest

from dionysus_rb_spark.operators.graph import connected_components
from dionysus_rb_spark.operators.lineage import truncate_lineage


def test_bad_mode_raises(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="reliable"):
        truncate_lineage(df, "fastest")


def test_reliable_autoprovisions_and_roundtrips(spark):
    df = spark.range(100).selectExpr("id", "id % 7 AS k")
    out = truncate_lineage(df)
    assert spark.sparkContext.getCheckpointDir() is not None
    assert sorted(r.id for r in out.collect()) == list(range(100))
    # the truncated frame is a leaf: no parquet/range scan remains
    assert "Range" not in out._jdf.queryExecution().optimizedPlan().toString()


def test_local_mode_still_available(spark):
    df = spark.range(10)
    out = truncate_lineage(df, "local")
    assert out.count() == 10


def test_cc_checkpoint_modes_agree(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20), (5, 4)], ["doc_a", "doc_b"]
    )
    want = sorted(
        map(tuple, connected_components(edges, checkpoint="local").collect())
    )
    got = sorted(map(tuple, connected_components(edges).collect()))
    assert got == want == [
        (1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (10, 10), (11, 10)
    ]
