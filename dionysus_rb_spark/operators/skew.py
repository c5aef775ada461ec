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
