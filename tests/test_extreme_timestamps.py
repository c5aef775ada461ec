"""Sentinel ("9999-12-31") and far-future timestamps: the engine is
full-range; the pandas boundary fails LOUDLY outside datetime64[ns].

Enterprise CDC data uses year-9999 sentinels for "no end date"
routinely, so at 100 TB they WILL arrive. Two contracts, both pinned:

* **Storage/compute surfaces are full-range.** Ordering (keep-latest),
  the guarded MERGE, parquet persistence, and ``collect()`` handle the
  whole 64-bit-micros timestamp domain — a sentinel orders after every
  real timestamp, survives the snapshot round-trip bit-exactly, and
  never silently changes value.
* **The Python-pandas boundary fails loudly, never wraps.** Arrow's
  timestamp[us]→[ns] cast raises on values past 2262-04-11 (the
  datetime64[ns] ceiling), so a ``toPandas`` consumer (the driver gate
  included) sees an exception — the unacceptable outcome would be a
  silent modular wrap into a wrong-but-plausible date, and this test
  exists to catch any future Spark/Arrow upgrade that changes the
  failure into silence.

Why the oracle-parity corpora exclude sentinels: the compare machinery
itself crosses the pandas boundary (``toPandas`` on both engines), so
out-of-ns-window values are unrepresentable THERE by construction —
the contract for them lives here, on collect()-based assertions.
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

SENTINEL = datetime.datetime(9999, 12, 31, 23, 59, 59)
FAR = datetime.datetime(2500, 6, 15, 12, 0, 0)
NS_MAX_SAFE = datetime.datetime(2262, 4, 11, 23, 47, 16)
NOW = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "synced_id int, synced_updated_at timestamp, val double, event string"
    )


def test_sentinel_orders_and_merges_full_range(spark, tmp_path):
    from dionysus_rb_spark.operators.dedup import keep_latest
    from dionysus_rb_spark.streaming.snapshot_store import SnapshotStore

    batch = _df(
        spark,
        [
            (1, NOW, 1.0, "updated"),
            (1, SENTINEL, 2.0, "updated"),  # sentinel wins the ordering
            (2, FAR, 3.0, "updated"),
            (2, NS_MAX_SAFE, 4.0, "updated"),
        ],
    )
    latest = {
        r["synced_id"]: r
        for r in keep_latest(
            batch, ["synced_id"], "synced_updated_at"
        ).collect()
    }
    assert latest[1]["synced_updated_at"] == SENTINEL and latest[1]["val"] == 2.0
    assert latest[2]["synced_updated_at"] == FAR and latest[2]["val"] == 3.0

    store = SnapshotStore(str(tmp_path / "snap"), key="synced_id")
    store.merge(spark, batch)
    state = {r["synced_id"]: r for r in store.read(spark).collect()}
    # parquet round-trip is bit-exact across the full range
    assert state[1]["synced_updated_at"] == SENTINEL
    assert state[2]["synced_updated_at"] == FAR

    # and a later real-time update must LOSE to the stored sentinel (the
    # F1 stale guard with a sentinel meaning "pinned forever")
    store.merge(spark, _df(spark, [(1, NOW, 9.0, "updated")]))
    state = {r["synced_id"]: r for r in store.read(spark).collect()}
    assert state[1]["val"] == 2.0 and state[1]["synced_updated_at"] == SENTINEL


def test_pandas_boundary_fails_loudly_not_silently(spark):
    df = spark.createDataFrame([(1, SENTINEL)], "id int, ts timestamp")
    with pytest.raises(Exception) as exc_info:
        df.toPandas()
    # the failure mode must be an out-of-bounds error, not a wrapped date
    assert "out of bounds" in str(exc_info.value).lower()
    # inside the ns window the same pipeline is exact
    ok = spark.createDataFrame([(1, NS_MAX_SAFE)], "id int, ts timestamp").toPandas()
    assert ok["ts"][0].to_pydatetime() == NS_MAX_SAFE
