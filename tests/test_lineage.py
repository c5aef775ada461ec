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


def test_drain_never_deletes_caller_frames(spark):
    """drain_topic supersedes only frames it materialized itself: the
    result of one drain stays readable after a second drain consumes it
    (the first drain's final truncation backs it on disk)."""
    from datetime import datetime

    import pyspark.sql.functions as F

    from dionysus_rb_spark.operators.outbox import drain_topic

    rows = [
        (i, t, datetime(2024, 1, 1, 10, 0, i % 60), None, None)
        for i, t in [(1, "a"), (2, "a"), (3, "b"), (4, "b")]
    ]
    ob = spark.createDataFrame(
        rows,
        "event_id LONG, topic STRING, created_at TIMESTAMP, "
        "published_at TIMESTAMP, retry_at TIMESTAMP",
    )
    now = F.lit("2024-02-01 00:00:00").cast("timestamp")
    state1, c1 = drain_topic(ob, "a", 1, now, "event_id")
    state2, c2 = drain_topic(state1, "b", 1, now, "event_id")
    assert (c1, c2) == (2, 2)
    # state1 must still be fully usable after the second drain ran
    got1 = {r["event_id"]: r["published_at"] for r in state1.collect()}
    assert got1[1] is not None and got1[3] is None
    got2 = {r["event_id"]: r["published_at"] for r in state2.collect()}
    assert all(got2[i] is not None for i in (1, 2, 3, 4))
