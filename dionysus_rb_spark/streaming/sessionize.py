"""Streaming gap-based sessionization — T4/T5 as a built-in operator.

The batch engine sessionizes with a lag + cumulative-sum window pair
(plans/queries_text.py::ev_sessionize). Under Structured Streaming the
same gap semantics are native: ``F.session_window`` keeps per-key session
state on the JVM (no Python in the loop), merges events that arrive
within the gap, and the event-time watermark both bounds the state and
decides when a closed session is final enough to emit (append mode).

This is the shape the reference's per-key event ordering feeds at scale:
one shuffle on the grouping key; session state lives in the state store,
sized by OPEN sessions only — closed sessions are evicted the moment the
watermark passes them, so state is bounded by key-activity, not history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-key gap sessions: events within ``gap`` of each other merge
    into one session. Works identically on batch and streaming frames;
    on a stream, ``watermark`` (event-time) must be set so append-mode
    sinks can finalize closed sessions and evict their state.

    Returns one row per (keys, session): window bounds + n_events +
    actual first/last event times.
    """
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(*key_cols, F.session_window(F.col(ts_col), gap))
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            *key_cols,
            F.col("session_window.start").alias("window_start"),
            F.col("session_window.end").alias("window_end"),
            "n_events",
            "session_start",
            "session_end",
        )
    )
