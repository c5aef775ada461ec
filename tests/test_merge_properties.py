"""Property-based check of the guarded MERGE against a row-at-a-time
reference model of the consumer persist loop.

The reference applies events one by one (persistor.rb:46-95 +
synchronizable_model.rb:16-56); our engine applies a whole batch
set-wise (A1 keep-latest, then one conditional merge). The property:
for ANY target state and ANY event batch — including the three-way NULL
timestamp cases (synchronizable_model.rb:24-26, SURVEY hard part 3) —
the set-wise result equals replaying the A1-winning event per key
through the row-at-a-time semantics.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dionysus_rb_spark.operators.merge import guarded_merge

T0 = datetime(2024, 1, 1)

# timestamps: a handful of close instants + None (the guard's edge axis)
ts_strategy = st.one_of(
    st.none(), st.integers(0, 4).map(lambda h: T0 + timedelta(hours=h))
)
key_strategy = st.integers(1, 5)

target_row = st.tuples(key_strategy, ts_strategy, st.integers(0, 99), ts_strategy)
event_row = st.tuples(
    key_strategy,
    ts_strategy,
    st.integers(100, 199),
    ts_strategy,
    st.sampled_from(["created", "updated", "destroyed", "view_happened"]),
    st.integers(0, 1_000_000),  # offset / tiebreak
)


def reference_merge(target_rows, event_rows):
    """Row-at-a-time model of persistor.rb semantics."""
    state = {k: (upd, val, can) for k, upd, val, can in target_rows}

    # A1: per key keep max updated_at (missing => Time.current, i.e.
    # always wins; max_by replaces only on strictly-greater, so ties keep
    # the FIRST batch element = lowest offset —
    # remove_duplicates_strategy.rb:20-41)
    def a1_rank(row):
        k, upd, val, can, event, off = row
        return (
            0 if upd is None else 1,  # missing ts sorts newest
            -upd.timestamp() if upd is not None else 0.0,
            off,  # first-wins on ties
        )

    groups = {}
    for row in event_rows:
        if row[4] not in ("created", "updated", "destroyed"):
            continue  # F8: unknown dropped
        groups.setdefault(row[0], []).append(row)
    winners = {k: min(g, key=a1_rank) for k, g in groups.items()}

    for k, (k2, upd, val, can, event, off) in winners.items():
        old = state.get(k)
        # F1 guard precedes the event branch (persistor.rb:63): accept
        # iff either ts missing or src >= tgt — destroys included.
        if old is not None:
            old_upd = old[0]
            if not (upd is None or old_upd is None or upd >= old_upd):
                continue  # stale event of any type: keep target
        if event == "destroyed":
            if can is not None:
                # soft destroy: attrs assigned from payload before the
                # destroy branch, then canceled stamp + save — inserts
                # on unseen keys (find_or_initialize + save)
                state[k] = (upd, val, can)
            elif old is not None:  # hard delete
                del state[k]
            # hard destroy of unknown key: no-op (save skipped)
        else:  # created/updated share the guarded-upsert path
            state[k] = (upd, val, can)
    return state


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    targets=st.lists(target_row, max_size=6, unique_by=lambda r: r[0]),
    events=st.lists(event_row, max_size=10, unique_by=lambda r: r[5]),
)
def test_guarded_merge_matches_row_at_a_time_model(spark, targets, events):
    tgt_schema = (
        "synced_id LONG, synced_updated_at TIMESTAMP, val LONG, "
        "synced_canceled_at TIMESTAMP"
    )
    src_schema = tgt_schema + ", event STRING, event_id LONG"
    target = spark.createDataFrame(
        [tuple(r) for r in targets] or [], tgt_schema
    )
    source = spark.createDataFrame(
        [(k, upd, val, can, ev, off) for k, upd, val, can, ev, off in events] or [],
        src_schema,
    )
    got = guarded_merge(
        target,
        source,
        key="synced_id",
        canceled_col="synced_canceled_at",
        order_tiebreak="event_id",
    )
    got_state = {
        r["synced_id"]: (
            r["synced_updated_at"],
            r["val"],
            r["synced_canceled_at"],
        )
        for r in got.collect()
    }
    assert got_state == reference_merge(targets, events)
