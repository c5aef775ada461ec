"""As-of join — for every probe row, the latest state row at or before
its timestamp. The canonical time-series/CDC lookup (tick data, feature
stores, "what did the customer look like when they clicked"), and an
operator Spark lacks natively (a naive range join explodes to
probe x all-earlier-states before picking one).

Spark-first shape: the UNION-WINDOW as-of. State and probe rows union
into one frame tagged by side, sorted within each key by (time, side)
— state sorts before probes at equal timestamps so a same-instant state
is visible — and each probe reads the running ``last`` state struct.
ONE shuffle+sort keyed by the join key, linear in |state| + |probes|;
no range-join explosion, no per-probe subquery. This is exactly how
kdb/Flink implement as-of internally; DuckDB's native ASOF JOIN is the
oracle mirror.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import keep_latest


def asof_join(
    probes: DataFrame,
    states: DataFrame,
    key: str,
    probe_time: str,
    state_time: str,
    state_cols: Sequence[str],
    state_tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every probe row, plus the ``state_cols`` of the
    latest state row with ``state_time <= probe_time`` under the same
    ``key`` (NULLs when no earlier state exists).

    ``state_tiebreak`` resolves multiple state rows at the same
    (key, time) instant to the one with the greatest tiebreak — the
    dedup both engines must agree on before "the" latest state is
    well-defined. State values ride in ONE struct through the window,
    so a NULL state *value* doesn't fall through to an older row.
    """
    keep = [key, state_time, *state_cols]
    if state_tiebreak and state_tiebreak not in keep:
        keep.append(state_tiebreak)
    states = keep_latest(
        states.select(*keep),
        [key, state_time],
        state_tiebreak if state_tiebreak else state_time,
    ).select(key, state_time, *state_cols)
    sv = F.struct(
        F.col(state_time).alias("t"), *[F.col(c) for c in state_cols]
    )
    s = states.select(
        F.col(key).alias("__k"),
        F.col(state_time).alias("__t"),
        F.lit(0).alias("__side"),
        sv.alias("__sv"),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in probes.columns],
    )
    p = probes.select(
        F.col(key).alias("__k"),
        F.col(probe_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(s.schema["__sv"].dataType).alias("__sv"),
        *probes.columns,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = s.unionByName(p).withColumn(
        "__last", F.last("__sv", ignorenulls=True).over(w)
    )
    out_cols = [F.col(c) for c in probes.columns]
    out_cols.append(F.col("__last")["t"].alias(f"{prefix}{state_time}"))
    out_cols.extend(F.col("__last")[c].alias(f"{prefix}{c}") for c in state_cols)
    return joined.filter(F.col("__side") == 1).select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_time: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 7200,
) -> DataFrame:
    """Interval (range) containment join — every (point, interval) pair
    with ``start <= t < end`` under the same key — with the time
    dimension IN the hash key: points map to their coarse bucket,
    intervals EXPLODE across the buckets they cover, the equi-join runs
    on (key, bucket), and the exact predicate filters.

    Joining on the key alone leaves the range as a post-filter, so a
    heavy key materializes |points_k| x |intervals_k| candidate pairs
    before filtering — the classic range-join blowup (and with no
    equi-key at all, Spark degrades to a nested-loop join). Adding the
    bucket to the key cuts candidates to pairs that share a time
    window: with ``bucket_seconds`` ~ the typical interval length each
    interval covers O(1) buckets, so the join is linear in
    points + intervals however hot the key. Each (point, interval)
    pair meets in exactly one bucket (the point's), so no dedup is
    needed."""
    b = F.lit(bucket_seconds).cast("long")
    p = points.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(point_time)) / b).cast("long")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                F.floor(F.unix_timestamp(F.col(end_col)) / b).cast("long"),
            )
        ),
    )
    pa, ia = p.alias("p"), iv.alias("i")
    return (
        ia.join(
            pa,
            (F.col(f"i.{key}") == F.col(f"p.{key}"))
            & (F.col("i.__bucket") == F.col("p.__bucket"))
            & (F.col(f"p.{point_time}") >= F.col(f"i.{start_col}"))
            & (F.col(f"p.{point_time}") < F.col(f"i.{end_col}")),
        )
        .drop(F.col("i.__bucket"))
        .drop(F.col("p.__bucket"))
        .drop(F.col(f"p.{key}"))
    )
