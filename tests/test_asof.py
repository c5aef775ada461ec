"""Edge semantics for the union-window as-of join (the oracle pins the
corpus-level behavior against DuckDB's native ASOF JOIN; this pins the
readable edge cases)."""

from __future__ import annotations

from datetime import datetime

from dionysus_rb_spark.operators.asof import asof_join

T = lambda s: datetime.fromisoformat(s)  # noqa: E731


def test_asof_edges(spark):
    states = spark.createDataFrame(
        [
            (1, T("2024-01-01 10:00:00"), 10.0, 100),
            (1, T("2024-01-01 12:00:00"), 20.0, 101),
            # two states at the SAME instant: greatest tiebreak wins
            (2, T("2024-01-01 09:00:00"), 1.0, 200),
            (2, T("2024-01-01 09:00:00"), 2.0, 201),
            # a NULL state value must NOT fall through to an older state
            (3, T("2024-01-01 08:00:00"), 5.0, 300),
            (3, T("2024-01-01 09:00:00"), None, 301),
        ],
        "user_id LONG, ts TIMESTAMP, value DOUBLE, event_id LONG",
    )
    probes = spark.createDataFrame(
        [
            (1, 1, T("2024-01-01 11:00:00")),  # between states -> 10.0
            (2, 1, T("2024-01-01 12:00:00")),  # exact instant -> visible
            (3, 2, T("2024-01-01 09:00:00")),  # same-instant tie -> 2.0
            (4, 2, T("2024-01-01 08:00:00")),  # before any state -> NULL
            (5, 3, T("2024-01-01 10:00:00")),  # latest state value is NULL
        ],
        "probe_id LONG, user_id LONG, ts TIMESTAMP",
    )
    out = {
        r["probe_id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(
            probes, states, "user_id", "ts", "ts", ["value"], "event_id"
        ).collect()
    }
    assert out[1] == (T("2024-01-01 10:00:00"), 10.0)
    assert out[2] == (T("2024-01-01 12:00:00"), 20.0)
    assert out[3] == (T("2024-01-01 09:00:00"), 2.0)
    assert out[4] == (None, None)
    # the 09:00 state row matched even though its value is NULL
    assert out[5] == (T("2024-01-01 09:00:00"), None)
