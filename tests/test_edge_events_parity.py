"""Adversarial-EVENTS parity: timestamp edges, NULLs, dirty payloads.

Companion to test_edge_content_parity (documents/embeddings); this one
salts the ``events`` table — the reference-parity CDC surface — with
the inputs a real changelog contains and no fixture ever had: NULL
timestamps/users/values/payloads, pre-epoch and far-future timestamps,
exact (user, ts) ties, malformed JSON, NaN/±huge values. Round 7: the
first run found 12 diverging or crashing queries in 5 classes:

  * every keep-latest/versioning oracle ordered ``ts DESC`` while the
    operator (correctly, per the reference's missing-timestamp-is-now)
    sorts ``desc_nulls_first`` — DuckDB's bare DESC is NULLS LAST, so
    the two engines disagreed the moment a NULL ts existed (a1, f1,
    s10, j6, lc, cdc, stream_t5);
  * the f1/stream_t5 merge-guard oracle relied on ``s >= t`` where the
    operator implements the reference's null-passes guard
    (synchronizable_model.rb) — SQL's NULL comparison made target win
    where the engine lets the update through;
  * FIFO ordering (o2, publishable_scan) had no stated NULL position
    at all — Spark defaults NULLS FIRST ascending, DuckDB NULLS LAST;
  * rendering casts crashed one engine each way: DuckDB's BIGINT cast
    raises on NaN where Spark's floor SATURATES (NaN->0, Inf->MAX) —
    both wrong, now a |v| <= 1e15 JSON-integer window; Spark's ANSI
    cast raised on a non-numeric JSON payload where DuckDB's ->>
    raises on malformed JSON — both now total via try_cast/json_valid;
  * watermark machinery silently drops NULL-ts rows and rows at or
    before epoch 0 (Spark's initial watermark), micro-batch-split-
    dependently — the streaming twins now state their event-time
    domain (ts > epoch) explicitly on both engines.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dionysus_rb_spark.plans import all_queries

from test_oracle_parity import _duck, _normalize, _values_equal

SRC_DIR = "/root/testdata/sf0.001"

EDGE_QUERIES = [
    "a1_keep_latest_dedup", "a2_consecutive_dedup",
    "s2_outbox_publishable_scan", "s2_drain_two_cycles",
    "o2_publish_fifo_position", "f1_guarded_merge_snapshot",
    "s10_tombstone_merge", "lc_local_changes_audit", "j6_resource_refetch",
    "cdc_scd2_history", "cs_changeset_from_versions",
    "d8_synced_data_backfill", "ev_sessionize", "ev_funnel",
    "ev_interval_join", "j8_asof_join", "f2_soft_delete_classifier",
    "stream_t1_replay_dedup", "stream_t4_sessionize",
    "stream_t5_snapshot_merge", "g1_latency_metrics", "g4_per_key_batches",
]

NAT = None


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory) -> str:
    out: Path = tmp_path_factory.mktemp("edge_events")
    for f in Path(SRC_DIR).glob("*.parquet"):
        shutil.copy(f, out / f.name)

    rng = np.random.default_rng(7)
    n = 800
    ts0 = np.datetime64("2024-01-01T00:00:00.000000")
    base_ts = ts0 + np.sort(
        rng.integers(0, 30 * 86400 * 10**6, n)
    ).astype("timedelta64[us]")
    rows = {
        "event_id": list(range(n)),
        "ts": list(base_ts),
        "user_id": [int(u) for u in rng.integers(0, 15, n)],
        "event_type": [
            str(t)
            for t in rng.choice(["signup", "click", "error", "view", "purchase"], n)
        ],
        "value": [float(v) for v in np.round(rng.uniform(0, 400, n), 2)],
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n)],
    }

    def add(eid, ts, uid, etype, value, props):
        rows["event_id"].append(eid)
        rows["ts"].append(ts)
        rows["user_id"].append(uid)
        rows["event_type"].append(etype)
        rows["value"].append(value)
        rows["props"].append(props)

    nan = float("nan")
    tie_ts = np.datetime64("2024-01-15T12:00:00.000000")
    g0 = np.datetime64("2024-01-18T00:00:00.000000")
    # timestamp edges
    add(10000, np.datetime64("1969-12-31T23:59:59.000001"), 50, "click", 1.0, '{"k": 1}')
    add(10001, np.datetime64("1970-01-01T00:00:00.000000"), 50, "view", 2.0, '{"k": 2}')
    add(10002, np.datetime64("1901-01-01T00:00:00.000000"), 50, "click", 3.0, '{"k": 3}')
    add(10003, np.datetime64("2250-01-01T00:00:00.000000"), 50, "purchase", 4.0, '{"k": 4}')
    # exact (user, ts) tie triple
    add(10004, tie_ts, 51, "click", 5.0, '{"k": 5}')
    add(10005, tie_ts, 51, "view", 6.0, '{"k": 6}')
    add(10006, tie_ts, 51, "signup", 7.0, '{"k": 7}')
    # NULLs in every nullable position
    add(10007, np.datetime64("2024-01-16T00:00:00.000000"), None, "click", 8.0, '{"k": 8}')
    add(10008, NAT, 52, "view", 9.0, '{"k": 9}')
    add(10009, np.datetime64("2024-01-16T01:00:00.000000"), 52, "click", None, '{"k": 10}')
    add(10010, np.datetime64("2024-01-16T02:00:00.000000"), 52, "view", 10.0, None)
    # dirty JSON payloads
    add(10011, np.datetime64("2024-01-16T03:00:00.000000"), 53, "click", 11.0, "not json at all")
    add(10012, np.datetime64("2024-01-16T04:00:00.000000"), 53, "view", 12.0, '{"k": "str"}')
    add(10013, np.datetime64("2024-01-16T05:00:00.000000"), 53, "click", 13.0, '{"k": null}')
    add(10014, np.datetime64("2024-01-16T06:00:00.000000"), 53, "view", 14.0, '{"nested": {"k": 9}}')
    add(10015, np.datetime64("2024-01-16T07:00:00.000000"), 53, "click", 15.0, '{"k": 1e99}')
    add(10016, np.datetime64("2024-01-16T08:00:00.000000"), 53, "view", 16.0, "[1,2,3]")
    add(10017, np.datetime64("2024-01-16T09:00:00.000000"), 53, "click", 17.0, "")
    # non-finite / huge values through renders and aggregates
    add(10018, np.datetime64("2024-01-17T00:00:00.000000"), 54, "purchase", nan, '{"k": 1}')
    add(10019, np.datetime64("2024-01-17T01:00:00.000000"), 54, "purchase", float("inf"), '{"k": 1}')
    add(10020, np.datetime64("2024-01-17T02:00:00.000000"), 54, "purchase", -1e308, '{"k": 1}')
    # unicode / empty event_type
    add(10021, np.datetime64("2024-01-17T03:00:00.000000"), 55, "klické", 18.0, '{"k": 1}')
    add(10022, np.datetime64("2024-01-17T04:00:00.000000"), 55, "", 19.0, '{"k": 1}')
    # sub-second gap straddle (session boundary class, r5's fuzz find)
    add(10023, g0, 56, "click", 1.0, '{"k": 1}')
    add(10024, g0 + np.timedelta64(1799_600_000, "us"), 56, "view", 1.0, '{"k": 1}')
    add(10025, g0 + np.timedelta64(3600_100_000, "us"), 56, "click", 1.0, '{"k": 1}')

    tbl = pa.table(
        {
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "event_type": pa.array(rows["event_type"], pa.string()),
            "value": pa.array(rows["value"], pa.float64()),
            "props": pa.array(rows["props"], pa.string()),
        }
    )
    pq.write_table(tbl, out / "events.parquet")
    return str(out)


def test_edge_events_parity(spark, edge_dir):
    qs = all_queries()
    failures: dict[str, str] = {}
    results: dict[str, pd.DataFrame] = {}
    for name in EDGE_QUERIES:
        qd = qs[name]
        assert qd.oracle, f"{name} lost its oracle"
        try:
            got = qd.fn(spark, edge_dir).toPandas()
            results[name] = got
            con = _duck(edge_dir)
            want = con.execute(qd.oracle).df()
            con.close()
            if sorted(got.columns) != sorted(want.columns):
                failures[name] = (
                    f"columns {sorted(got.columns)} != {sorted(want.columns)}"
                )
                continue
            if len(got) != len(want):
                failures[name] = f"rows {len(got)} != {len(want)}"
                continue
            g, w = _normalize(got), _normalize(want)
            for col in g.columns:
                bad = [
                    (col, i, x, y)
                    for i, (x, y) in enumerate(
                        zip(g[col].tolist(), w[col].tolist())
                    )
                    if not _values_equal(x, y)
                ][:3]
                if bad:
                    failures[name] = f"value mismatches {bad}"
                    break
        except Exception as e:  # noqa: BLE001 - report per-query
            failures[name] = f"error: {type(e).__name__}: {e}"[:400]
    assert not failures, (
        f"{len(failures)}/{len(EDGE_QUERIES)} queries diverge on edge events:\n"
        + "\n".join(f"  {k}: {v}" for k, v in sorted(failures.items()))
    )

    # --- power guards: each contract actually fired ------------------
    # missing-timestamp-is-now: the NULL-ts row is its user's newest
    a1 = results["a1_keep_latest_dedup"]
    assert 10008 in set(a1["event_id"]), "NULL-ts row must win keep-latest"
    # FIFO nulls-last: the NULL-ts row never outranks timestamped rows
    o2 = results["o2_publish_fifo_position"]
    assert 10008 not in set(o2["event_id"]), "NULL-ts row must rank last in FIFO"
    # streaming event-time domain: NULL / pre-epoch / epoch rows
    # excluded, everything else exactly once despite double delivery
    t1 = set(results["stream_t1_replay_dedup"]["event_id"])
    assert {10000, 10001, 10002, 10008}.isdisjoint(t1)
    assert {10003, 10004, 10009, 10025} <= t1
    assert len(results["stream_t1_replay_dedup"]) == len(t1), "replay not deduped"
    # dirty-JSON extraction is total: malformed/mistyped -> NULL
    d8 = results["d8_synced_data_backfill"].set_index("event_id")["k"]
    for eid in (10010, 10011, 10012, 10013, 10014, 10015, 10016, 10017):
        assert pd.isna(d8.loc[eid]), f"props of {eid} must extract to NULL"
    assert d8.loc[10004] == 5
    # JSON-integer render window: non-finite / huge values render null
    cs = results["cs_changeset_from_versions"].set_index("event_id")["changeset"]
    assert cs.loc[10018] == '{"value":[null,null]}' or "null]}" in cs.loc[10018]
    assert "null" in cs.loc[10019] and "null" in cs.loc[10020]
    # batch sessionize excludes NULL ts but keeps pre-epoch rows
    ev_sess = results["ev_sessionize"]
    assert (ev_sess["user_id"] == 50).any(), "pre-epoch user must sessionize in batch"
