"""Property check: batch A2 (window lead) equals the reference's
sequential run-length collapse (duplicates_filter.rb:15-25 walks rows in
order, keeping the last row of each adjacent same-key run)."""

from __future__ import annotations

from itertools import groupby

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dionysus_rb_spark.operators.dedup import consecutive_dedup

row = st.tuples(
    st.sampled_from(["t1", "t2"]),            # ordering domain (topic)
    st.sampled_from(["A", "B", "C"]),         # dedup key (event kind)
    st.integers(0, 9),                         # resource id (second key col)
)


def reference_runs(rows):
    """Sequential model: per topic, in seq order, keep last of each run
    of equal (kind, rid)."""
    out = []
    by_topic: dict = {}
    for seq, (topic, kind, rid) in enumerate(rows):
        by_topic.setdefault(topic, []).append((seq, kind, rid))
    for topic, items in by_topic.items():
        for _, run in groupby(items, key=lambda r: (r[1], r[2])):
            out.append(max(run)[0])  # last seq of the run
    return sorted(out)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=st.lists(row, min_size=0, max_size=25))
def test_consecutive_dedup_matches_sequential_model(spark, rows):
    df = spark.createDataFrame(
        [(i, t, k, r) for i, (t, k, r) in enumerate(rows)] or [],
        "seq LONG, topic STRING, kind STRING, rid LONG",
    )
    got = consecutive_dedup(
        df, ["kind", "rid"], "seq", partition_cols=["topic"]
    )
    assert sorted(r["seq"] for r in got.collect()) == reference_runs(rows)
