"""Streaming keep-latest dedup — A1 as a continuous stateful operator.

Batch A1 is a window function (operators/dedup.py). Under Structured
Streaming the same semantics need per-key state: remember the winning
(newest-timestamp) row per key across micro-batches and emit only when
a new winner arrives. The reference gets this implicitly because its
target table is the state (SURVEY §2.10 T5); this operator exists for
pipelines that want deduped *streams* (e.g. to cut sink write volume)
rather than a merged table.

Implementation: ``applyInPandasWithState`` (Arrow-batched; state =
exactly one row per key). An optional processing-time timeout bounds
state size — with the F1 guard downstream, expiring state is safe
(a late replay merges idempotently).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame

try:  # pyspark >= 3.4
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
except ImportError:  # pragma: no cover
    GroupState = object  # type: ignore[misc,assignment]
    GroupStateTimeout = None  # type: ignore[assignment]


def keep_latest_stream(
    sdf: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Emit a row per key whenever a strictly-newer (or first) row
    arrives; missing timestamp counts as newest (A1's "missing => now",
    remove_duplicates_strategy.rb:24-41)."""
    out_schema = sdf.schema
    cols = [f.name for f in out_schema.fields]
    ts_idx = cols.index(ts_col)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def beats(ts, best_ts) -> bool:
        # missing timestamp counts as "now": an incoming missing-ts row
        # always wins; a stored missing-ts winner yields only to another
        if pd.isna(ts):
            return True
        if pd.isna(best_ts):
            return False
        return ts >= best_ts

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best = state.get if state.exists else None
        best_ts = best[ts_idx] if best is not None else None
        changed = False

        def scalar(v):
            # state serialization rejects pandas NaT/NaN sentinels;
            # nulls must be stored as None (round-trips as null)
            try:
                return None if pd.isna(v) else v
            except (TypeError, ValueError):
                return v  # array-likes: not null

        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                vals = tuple(scalar(v) for v in row)
                ts = vals[ts_idx]
                if best is None or beats(ts, best_ts):
                    best, best_ts, changed = vals, ts, True
        if changed:
            state.update(best)
            if state_ttl_ms:
                state.setTimeoutDuration(state_ttl_ms)
            yield pd.DataFrame([best], columns=cols)

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=out_schema,
        outputMode="update",
        timeoutConf=timeout,
    )


def exact_dedup_stream(
    sdf: DataFrame,
    key_cols: Sequence[str],
    event_time_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-duplicated message suppression, JVM-native: the
    at-least-once source can replay a record (T1); within the watermark
    horizon replays drop without any Python state. Complements
    :func:`keep_latest_stream` (which keeps the *newest* among
    different rows per key — this drops *identical* keys only).
    Replays older than the watermark pass through and are neutralized
    downstream by the idempotent guarded MERGE instead."""
    return sdf.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def consecutive_dedup_stream(
    sdf: DataFrame,
    domain_cols: Sequence[str],
    dedup_cols: Sequence[str],
    seq_col: str,
    flush_ttl_ms: int | None = None,
) -> DataFrame:
    """A2 strict run-length dedup as a continuous operator (SURVEY §7
    hard part 1; ref outbox/duplicates_filter.rb:15-25).

    Collapse *adjacent* rows (ordered by ``seq_col`` within each
    ``domain_cols`` group — the outbox ordering domain, e.g. topic)
    whose ``dedup_cols`` match, keeping the LAST row of each run.
    Non-adjacent duplicates survive, exactly like the reference.

    A run only provably ends when a different-keyed row arrives, so the
    current run's tail is held as per-domain state across micro-batches
    and emitted on break — or flushed after ``flush_ttl_ms`` of domain
    inactivity (the streaming trade the batch operator doesn't face).

    Scale note: state is ONE row per ordering domain (topic), not per
    key — bounded by topic count, no watermark needed for growth.
    """
    out_schema = sdf.schema
    cols = [f.name for f in out_schema.fields]
    dedup_idx = [cols.index(c) for c in dedup_cols]
    seq_idx = cols.index(seq_col)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if flush_ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            pending = state.get if state.exists else None
            state.remove()
            if pending is not None:
                yield pd.DataFrame([pending], columns=cols)
            return
        pending = state.get if state.exists else None
        out: list[tuple] = []
        rows: list[tuple] = []
        for pdf in pdfs:
            rows.extend(tuple(r) for r in pdf.itertuples(index=False))
        rows.sort(key=lambda r: r[seq_idx])
        for vals in rows:
            if pending is not None:
                same_run = all(pending[i] == vals[i] for i in dedup_idx)
                if not same_run:
                    out.append(pending)  # run broke: emit its last row
            pending = vals
        if pending is not None:
            state.update(pending)
            if flush_ttl_ms:
                state.setTimeoutDuration(flush_ttl_ms)
        if out:
            yield pd.DataFrame(out, columns=cols)

    return sdf.groupBy(*domain_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=out_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
