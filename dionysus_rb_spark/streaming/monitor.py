"""Streaming observability (SURVEY §2.10 T10, G1/T4).

The reference emits heartbeats, per-stage monitor events, and Datadog
latency gauges (monitor.rb:4-15, checks/health_check.rb,
outbox/datadog_latency_reporter.rb:13-19). Spark's native equivalents:

* ``StreamingQueryListener``: per-micro-batch progress (input rows,
  processing durations, state size) — the engine's monitor events;
* windowed event-time aggregation: the 1-minute latency gauges as a
  *continuous* query rather than a cron-scheduled scan.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.listener import StreamingQueryListener

logger = logging.getLogger(__name__)


def windowed_latency_metrics(
    sdf: DataFrame,
    created_at: str = "created_at",
    published_at: str = "published_at",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """G1 as a streaming windowed agg (latency_tracker.rb:15-42 computes
    the same gauges by polling; here the stream maintains them): per
    1-minute event-time window, min/max/avg publish latency. The
    watermark bounds window state (T3-for-metrics: later-than-watermark
    stragglers are dropped from gauges, never from data)."""
    lat: Column = F.col(published_at).cast("double") - F.col(created_at).cast("double")
    return (
        sdf.withWatermark(published_at, watermark)
        .groupBy(F.window(F.col(published_at), window).alias("w"))
        .agg(
            F.min(lat).alias("minimum"),
            F.max(lat).alias("maximum"),
            F.avg(lat).alias("average"),
            F.count("*").alias("n_published"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "minimum",
            "maximum",
            "average",
            "n_published",
        )
    )


@dataclass
class BatchProgress:
    query_name: str
    batch_id: int
    num_input_rows: int
    duration_ms: dict
    timestamp: str


@dataclass
class ProgressMonitor(StreamingQueryListener):
    """T10: collect per-batch progress + a liveness heartbeat, the
    engine-side analogue of the reference's heartbeat files and monitor
    events (consumer heartbeats expire after 600s, producer after 120s —
    ``stale()`` reproduces that check from ``last_heartbeat_at``)."""

    progress: list[BatchProgress] = field(default_factory=list)
    last_heartbeat_at: float = field(default_factory=time.time)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        self.last_heartbeat_at = time.time()

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.last_heartbeat_at = time.time()
        self.progress.append(
            BatchProgress(
                query_name=p.name or p.id,
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=dict(p.durationMs or {}),
                timestamp=p.timestamp,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        self.last_heartbeat_at = time.time()

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        # A query that died with an exception must not vanish silently:
        # surface it to the log (the listener API gives no other channel).
        exc = getattr(event, "exception", None)
        if exc:
            logger.warning("streaming query %s terminated with: %s", event.id, exc)
        else:
            logger.debug("streaming query %s terminated cleanly", event.id)

    def stale(self, expiry_seconds: float = 600.0) -> bool:
        return (time.time() - self.last_heartbeat_at) > expiry_seconds

    def total_input_rows(self) -> int:
        return sum(p.num_input_rows for p in self.progress)
