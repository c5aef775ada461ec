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


BLOOM_BITS = 4096
BLOOM_WORDS = BLOOM_BITS // 64
_KNUTH = 2654435761  # Knuth multiplicative-hash constant (2^32 / phi)

# single-bit masks as int64 literals (bit 63 = sign bit, two's complement);
# an indexed literal array because shift-by-column isn't portable
_MASKS = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]
_MASKS_SQL = "[" + ", ".join(
    str(m) if m != -(1 << 63) else "(-9223372036854775807 - 1)" for m in _MASKS
) + "]"


def _mask(bit: Column) -> Column:
    return F.element_at(F.array(*[F.lit(m) for m in _MASKS]), bit + 1)


def _bloom_positions(h: Column) -> list[Column]:
    """Two derived bit positions per element (double hashing). The
    second probe mixes the HIGH bits (h is 32-bit, so ``h // BLOOM_BITS``
    is independent of ``h % BLOOM_BITS``) and stays far from int64
    overflow (2^20 * _KNUTH < 2^52)."""
    return [
        h % BLOOM_BITS,
        ((h / BLOOM_BITS).cast("long") * _KNUTH) % BLOOM_BITS,
    ]


def bloom_build(df: DataFrame, value_col: Column) -> DataFrame:
    """Aggregate a portable Bloom filter over ``value_col``: one row,
    ``words`` = array of 64 longs (4096 bits, 2 probes/element). Unlike
    an engine's native bloom (whose bit layout is an implementation
    detail), this one is a pure function of the h32 multiset — buildable
    and probe-able identically in any engine, and mergeable with plain
    ``bit_or``. The build is a map-side-combining bit_or aggregation of
    at most 64 words — the shuffle moves 64 longs per partition no
    matter the input size."""
    h = h32(value_col)
    pos = F.explode(F.array(*_bloom_positions(h))).alias("__p")
    contrib = df.select(pos).select(
        (F.col("__p") / 64).cast("long").alias("__w"),
        _mask((F.col("__p") % 64).cast("int")).alias("__m"),
    )
    words = contrib.groupBy("__w").agg(F.expr("bit_or(__m)").alias("__word"))
    # densify to all 64 words (missing word = 0) and pack to one array row
    idx = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_WORDS - 1))).alias("__w")
    dense = (
        df.sparkSession.range(1)
        .select(idx)
        .join(words, "__w", "left")
        .select("__w", F.coalesce("__word", F.lit(0).cast("long")).alias("__word"))
    )
    return dense.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__w", "__word"))),
            lambda s: s["__word"],
        ).alias("words")
    )


def bloom_might_contain(words_col: Column, value_col: Column) -> Column:
    """Probe: both derived bits set => possibly a member (one-sided
    error). Pure expressions — with the filter joined (or inlined) this
    is a map-side gate, the broadcast-bloom analogue of a semi-join."""
    h = h32(value_col)
    checks = []
    for p in _bloom_positions(h):
        word = F.element_at(words_col, (p / 64).cast("int") + 1)
        checks.append(word.bitwiseAND(_mask((p % 64).cast("int"))) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def _bloom_positions_sql(h: str) -> tuple[str, str]:
    return (
        f"({h} % {BLOOM_BITS})",
        f"((({h} // {BLOOM_BITS}) * {_KNUTH}) % {BLOOM_BITS})",
    )


def bloom_sql(build_from: str, value_sql: str) -> str:
    """DuckDB CTE text producing the same one-row (words) frame from
    ``build_from`` (a FROM clause) over ``value_sql``."""
    from ..functions.hashing import h32_sql

    p1, p2 = _bloom_positions_sql(h32_sql(value_sql))
    return f"""
      WITH pos AS (
        SELECT unnest([{p1}, {p2}]) AS p FROM {build_from}
      ),
      bits AS (
        SELECT CAST(p // 64 AS BIGINT) AS w,
               bit_or({_MASKS_SQL}[CAST(p % 64 AS INT) + 1]) AS word
        FROM pos GROUP BY 1
      ),
      dense AS (
        SELECT r.wi, coalesce(max(bits.word), 0) AS word
        FROM (SELECT unnest(range(0, {BLOOM_WORDS})) AS wi) r
        LEFT JOIN bits ON bits.w = r.wi
        GROUP BY r.wi
      )
      SELECT list(word ORDER BY wi) AS words FROM dense
    """


def bloom_probe_sql(words_expr: str, value_sql: str) -> str:
    from ..functions.hashing import h32_sql

    probes = []
    for p in _bloom_positions_sql(h32_sql(value_sql)):
        probes.append(
            f"(({words_expr}[CAST({p} // 64 AS INT) + 1] "
            f"& {_MASKS_SQL}[CAST({p} % 64 AS INT) + 1]) != 0)"
        )
    return " AND ".join(probes)


def count_min_build(
    elements: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch over an element stream: each element increments
    ``depth`` cells (one per hash row, cell = h32("r:" + value) % width),
    so the whole corpus folds into a ``depth x width`` counter table —
    the fixed-size frequency summary for unbounded key spaces (exact
    per-token groupBy state grows with the vocabulary; this never does).

    Scale shape: the only shuffle is groupBy(r, cell) with map-side
    combine — at most depth*width rows cross the exchange REGARDLESS of
    corpus size; the element stream itself never shuffles. Like the
    Bloom gate and KMV, the sketch is a pure function of the portable
    h32, so the TABLE (not just estimates) is engine-identical and two
    sketches merge by cell-wise addition."""
    rows = F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("r"),
                (h32(F.concat(F.lit(f"{r}:"), F.col(value_col))) % width).alias(
                    "cell"
                ),
            )
            for r in range(depth)
        ]
    )
    return (
        elements.select(F.explode(rows).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell"))
        .agg(F.count("*").alias("c"))
    )


def count_min_probe_cells(
    probes: list[str], depth: int = 4, width: int = 1024
) -> list[tuple[str, int, int]]:
    """Driver-side (token, r, cell) triples for a probe set — the same
    h32 the executors compute, so lookups join exactly."""
    import hashlib

    out = []
    for t in probes:
        for r in range(depth):
            h = int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:8], 16)
            out.append((t, r, h % width))
    return out
