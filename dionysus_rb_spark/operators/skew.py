"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting handles *join* skew automatically, but a
``groupBy(key).agg(collect_list(...))`` over a heavy-hitter key (one
rental with 10M bookings, one parent with a million children) still
funnels that key's every row through one task. Salting splits the key's
rows across ``num_salts`` partial aggregates, then combines the partials
— two small shuffles instead of one stuck straggler.

Use for the P2/P3 child-aggregation path when child-per-parent
cardinality is pathological; plain aggs (count/sum/min/max) already get
map-side partial aggregation from Spark and don't need this.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_for_compute(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition on ``cols`` at the session's configured shuffle
    width, PINNING the exchange against AQE's byte-based coalescing.

    AQE sizes post-shuffle partitions by BYTES
    (advisoryPartitionSizeInBytes / minPartitionSize), which is the
    right call when stage cost tracks bytes — but a bucket-expansion or
    per-group fold stage does O(group²) or O(collected array) compute
    over kilobytes of input, and AQE happily coalesces it onto ONE task
    (measured: dd_simhash_wide's pair expansion ran 1.36 s single-task
    behind a <1 MB exchange while 31 cores idled — optimization r13,
    guide §2.5: a partition-count decision the optimizer cannot make
    from sizes it can see). An explicit repartition(N, key) keeps the
    exchange (the aggregate/window downstream reuses it — no extra
    shuffle) but fixes its width: user-specified partition counts are
    exempt from AQE coalescing.

    N is the session's ``spark.sql.shuffle.partitions`` — the same
    scale knob every other exchange uses (cores-sized locally,
    cluster-sized in production), so this is a shape pin, not a local
    tune. Trade-off stated: the pinned exchange gives up AQE's
    small-partition merging for that hop, which is exactly the point —
    only use it in front of compute-dense, low-byte stages.
    """
    try:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        # platforms that report a non-numeric sentinel (e.g. "auto")
        # fall back to the scheduler's default parallelism — the same
        # cluster-sized quantity by another name
        n = df.sparkSession.sparkContext.defaultParallelism
    if not cols:
        # keyless round-robin: the only shape that survives when the
        # child is ALREADY hash-partitioned on every candidate key (a
        # same-key repartition is optimized away as redundant — no
        # exchange, no spread). Pays the deterministic
        # sort-before-repartition of the (tiny) input; that is the
        # price of retry-safe row placement (SPARK-23207).
        return df.repartition(n)
    return df.repartition(n, *[F.col(c) for c in cols])


def salted_collect_list(
    df: DataFrame,
    key_cols: Sequence[str],
    value: Column,
    num_salts: int = 16,
    sort: bool = True,
    out_col: str = "collected",
) -> DataFrame:
    """``groupBy(keys).agg(collect_list(value))`` with bounded per-task
    fan-in: phase 1 aggregates (keys, salt) partials, phase 2 flattens
    the ≤ ``num_salts`` partial arrays per key. ``sort=True`` makes the
    result deterministic (array_sort) — required for oracle checks;
    leave it on unless downstream order doesn't matter.
    """
    salt = F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), num_salts)
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.collect_list(value).alias("__partial"))
    )
    combined = F.flatten(F.collect_list("__partial"))
    out = F.array_sort(combined) if sort else combined
    return phase1.groupBy(*key_cols).agg(out.alias(out_col))


def salted_count_distinct(
    df: DataFrame,
    key_cols: Sequence[str],
    value: Column,
    num_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count under key skew: dedup within (keys, salt)
    partials first, then count the union — the heavy key's distinct set
    is built across ``num_salts`` tasks instead of one."""
    phase1 = (
        df.withColumn("__salt", F.pmod(F.hash(value), num_salts))
        .groupBy(*key_cols, "__salt")
        .agg(F.collect_set(value).alias("__vals"))
    )
    # salts partition the value space (salt = hash(value) % n), so the
    # per-salt distinct sets are disjoint: summing sizes is exact
    return phase1.groupBy(*key_cols).agg(
        F.sum(F.size("__vals")).cast("long").alias(out_col)
    )
