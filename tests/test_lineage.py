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
    import dionysus_rb_spark.operators.lineage as L

    df = spark.range(100).selectExpr("id", "id % 7 AS k")
    out = truncate_lineage(df)
    assert L._local_root is not None  # process-local root provisioned
    assert sorted(r.id for r in out.collect()) == list(range(100))
    # the truncated frame is a storage leaf: upstream lineage is gone
    assert "Range" not in out._jdf.queryExecution().optimizedPlan().toString()


def test_supersedes_deletes_previous_dir(spark):
    from pathlib import Path

    from dionysus_rb_spark.operators.lineage import _DIR_ATTR

    a = truncate_lineage(spark.range(10))
    dir_a = Path(getattr(a, _DIR_ATTR))
    assert dir_a.exists()
    b = truncate_lineage(a.selectExpr("id + 1 AS id"), supersedes=a)
    assert not dir_a.exists()
    assert sorted(r.id for r in b.collect()) == list(range(1, 11))


def test_empty_frame_roundtrips(spark):
    df = spark.range(5).where("id < 0")
    out = truncate_lineage(df)
    assert out.count() == 0
    # file sources force nullable=true; names and types must round-trip
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]


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
