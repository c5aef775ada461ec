"""Deduplication operators (reference's flagship "aggregation", SURVEY §2.5).

A1  keep-latest-per-key      ref: lib/dionysus/consumer/params_batch_transformations/
                                  remove_duplicates_strategy.rb:20-53
A2  consecutive (run-length) ref: lib/dionysus/producer/outbox/duplicates_filter.rb:15-25

Both are pure window-function transforms: one shuffle on the key for A1,
one global/keyed sort for A2. At 100 TB the A1 shuffle is unavoidable
(it IS the group-by); A2 preserves *order*, so it must be evaluated
within an explicit ordering domain — on a cluster that ordering only
exists per key/partition (Kafka partition, outbox topic), so callers
pass ``partition_cols`` and A2 never needs a global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """A1: keep the newest row per key.

    Reference semantics (remove_duplicates_strategy.rb:24): group by
    ``(event, id)`` and ``max_by(updated_at)``; a missing timestamp sorts
    as "now" i.e. newest — we encode that by sorting NULLs first in the
    descending order so a null-timestamped row wins over any concrete one.
    ``tiebreak_cols`` break exact ties deterministically: Ruby's
    ``max_by`` replaces the running max only on a strictly greater value,
    so on ties the FIRST batch element (lowest offset) wins — hence the
    tiebreak sorts ascending.
    """
    order = [F.col(order_col).desc_nulls_first()] + [
        F.col(c).asc() for c in tiebreak_cols
    ]
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def consecutive_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """A2: collapse *adjacent* rows with equal key, keeping the last of
    each run; non-adjacent duplicates survive (order-preserving).

    Reference (duplicates_filter.rb:15-25) walks outbox rows in
    created_at order and drops a row when the next row has the same
    ``(resource_class, resource_id, event_name, topic)``. Expressed as
    ``lead(key) IS DISTINCT FROM key`` over the ordering — keep the row
    iff the next row's key differs (or there is no next row).

    ``partition_cols`` scope the ordering domain (e.g. topic): without
    them the window is global, which Spark executes as a single-task
    sort — fine for an outbox drain batch (bounded, ~100s of rows per
    poll per the reference's batch size), wrong for a 100 TB table.
    """
    w = Window.partitionBy(*[F.col(c) for c in partition_cols]).orderBy(F.col(order_col))
    next_differs: Column | None = None
    for k in key_cols:
        d = ~F.lead(F.col(k)).over(w).eqNullSafe(F.col(k))
        next_differs = d if next_differs is None else (next_differs | d)
    is_last = F.lead(F.col(order_col)).over(w).isNull()
    assert next_differs is not None
    return (
        df.withColumn("__keep", is_last | next_differs)
        .filter(F.col("__keep"))
        .drop("__keep")
    )


def exact_dedup(
    df: DataFrame,
    content_cols: Sequence[str],
    keep_col: str,
) -> DataFrame:
    """Exact content dedup: hash-groupBy on content, keep min(keep_col).

    Beyond-reference operator for training-data pipelines: one shuffle on
    a digest of the content (never the raw content — at 100 TB the
    shuffle payload must be the 32-byte hash, not the document). Rows
    with NULL content are all kept (NULL != NULL in dedup semantics).
    """
    digest = F.md5(F.concat_ws("\x00", *[F.col(c).cast("string") for c in content_cols]))
    w = Window.partitionBy(digest).orderBy(F.col(keep_col).asc())
    has_null = None
    for c in content_cols:
        n = F.col(c).isNull()
        has_null = n if has_null is None else (has_null | n)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) | (has_null if has_null is not None else F.lit(False)))
        .drop("__rn")
    )
