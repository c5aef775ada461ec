"""Distributed cardinality sketches.

KMV (k-minimum-values) distinct-count estimation: hash every element
with the portable h32, keep each group's k smallest DISTINCT hash
values, estimate |D| as (k-1) * 2^32 / kth_min. Unlike HLL (whose
register layouts differ per engine), KMV is a pure function of the hash
multiset — so the sketch, not just the estimate, is bit-identical in
any engine that shares the hash, and merging two sketches is just
"union, re-take the k smallest" (the associative/commutative property
that makes it a distributed aggregate).

Scale shape: the only shuffle moves DISTINCT (group, hash) pairs —
map-side partial distinct prunes duplicates before the exchange, and
the window + final aggregate reuse that one exchange's partitioning.
The corpus-sized token stream itself is never shuffled. (This operator
also reports the exact count next to the estimate, which is what forces
every distinct hash across; a sketch-only variant filters rank <= k
first and gets WindowGroupLimit's map-side top-k, moving at most k
hashes per group.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h32

HASH_SPACE = float(2**32)


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: Column,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch + estimate: (groups..., n_exact, kth_hash,
    est_distinct). ``n_exact`` (the true distinct count, one extra
    aggregate over the same distinct stream) is included so the sketch's
    error is observable; production drops it and keeps only the sketch.
    When a group has fewer than k distinct values the estimate IS the
    exact count (the sketch holds the whole hash set)."""
    gcols = list(group_cols)
    hashed = df.select(*gcols, h32(value_col).alias("__h")).distinct()
    w = Window.partitionBy(*gcols).orderBy("__h")
    ranked = hashed.withColumn("__rk", F.row_number().over(w))
    sketch = ranked.groupBy(*gcols).agg(
        F.count("*").alias("n_exact"),
        F.max(F.when(F.col("__rk") == k, F.col("__h"))).alias("__kth"),
    )
    est = F.when(
        F.col("__kth").isNull(), F.col("n_exact").cast("double")
    ).otherwise(F.round(F.lit(k - 1) * F.lit(HASH_SPACE) / F.col("__kth"), 3))
    return sketch.select(
        *gcols,
        "n_exact",
        F.col("__kth").alias("kth_hash"),
        est.alias("est_distinct"),
    )


def kmv_distinct_sql(
    table_expr: str, group_cols: Sequence[str], value_sql: str, k: int = 64
) -> str:
    """DuckDB mirror of :func:`kmv_distinct` over ``table_expr`` (a FROM
    clause producing one row per element, e.g. an unnested token
    stream)."""
    from ..functions.hashing import h32_sql

    g = ", ".join(group_cols)
    return f"""
    WITH hashed AS (
      SELECT DISTINCT {g}, {h32_sql(value_sql)} AS __h
      FROM {table_expr}
    ),
    ranked AS (
      SELECT {g}, __h,
             row_number() OVER (PARTITION BY {g} ORDER BY __h) AS __rk
      FROM hashed
    ),
    sk AS (
      SELECT {g}, count(*) AS n_exact,
             max(CASE WHEN __rk = {k} THEN __h END) AS kth_hash
      FROM ranked GROUP BY {g}
    )
    SELECT {g}, n_exact, kth_hash,
           CASE WHEN kth_hash IS NULL THEN CAST(n_exact AS DOUBLE)
                ELSE round({k - 1} * {HASH_SPACE} / kth_hash, 3) END
               AS est_distinct
    FROM sk
    """
