"""Aggregation operators (SURVEY §2.7 G1-G4, §2.8 sorts/limits).

G1  latency metrics   ref lib/dionysus/producer/outbox/latency_tracker.rb:15-42
G3  batch math        ref lib/dionysus/utils/sidekiq_batched_job_distributor.rb:13-23

All partial-aggregation-friendly (map-side combine), so they scan-scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latency_metrics(
    outbox: DataFrame,
    now: Column,
    window_seconds: int = 60,
    published_at: str = "published_at",
    created_at: str = "created_at",
) -> DataFrame:
    """G1: over rows published in the last window: min/max/avg of
    (published_at - created_at) seconds; plus the age of the oldest
    unpublished row (``highest_latency_since_creation``).

    ref latency_tracker.rb:15-42 + model.rb:27-28 scopes; gauges emitted
    at datadog_latency_reporter.rb:13-19. One scan, two conditional
    aggregates — no shuffle beyond the final single-row reduce.
    """
    lat = F.unix_timestamp(F.col(published_at)) - F.unix_timestamp(F.col(created_at))
    recent = F.col(published_at).isNotNull() & (
        F.col(published_at) >= now - F.expr(f"INTERVAL {window_seconds} SECOND")
    )
    unpublished_age = F.when(
        F.col(published_at).isNull(),
        F.unix_timestamp(now) - F.unix_timestamp(F.col(created_at)),
    )
    return outbox.agg(
        F.min(F.when(recent, lat)).alias("minimum"),
        F.max(F.when(recent, lat)).alias("maximum"),
        F.avg(F.when(recent, lat)).alias("average"),
        F.max(unpublished_age).alias("highest_since_creation"),
    )


def batch_plan(
    df: DataFrame,
    group_col: str,
    batch_size: int,
    spread_seconds: int | None = None,
) -> DataFrame:
    """G3: per group, row count and number of size-``batch_size`` batches
    (= ceil(count/size)); optionally the per-batch time offset used to
    spread enqueues over an interval (sidekiq_batched_job_distributor.rb:13-23:
    interval/num_batches seconds between batches).
    """
    agg = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows"))
    agg = agg.withColumn(
        "n_batches", F.ceil(F.col("n_rows") / F.lit(batch_size)).cast("long")
    )
    if spread_seconds is not None:
        agg = agg.withColumn(
            "batch_interval_seconds",
            (F.lit(spread_seconds) / F.greatest(F.col("n_batches"), F.lit(1))).cast("double"),
        )
    return agg
