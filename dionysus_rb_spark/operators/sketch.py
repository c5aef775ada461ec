"""Distributed cardinality sketches.

KMV (k-minimum-values) distinct-count estimation: hash every element
with the portable h32, keep each group's k smallest DISTINCT hash
values, estimate |D| as (k-1) * 2^32 / kth_min. Unlike HLL (whose
register layouts differ per engine), KMV is a pure function of the hash
multiset — so the sketch, not just the estimate, is bit-identical in
any engine that shares the hash, and merging two sketches is just
"union, re-take the k smallest" (the associative/commutative property
that makes it a distributed aggregate).

Scale shape (default, sketch-only): the distinct stage's exchange moves
distinct (group, hash) pairs (map-side partial distinct prunes
duplicates first); the rank<=k filter then triggers Spark's
WindowGroupLimit, so the window/aggregate exchange carries AT MOST k
hashes per group per input partition — bounded regardless of
vocabulary. The corpus-sized token stream itself is never shuffled.
``exact=True`` (debug) additionally reports the true distinct count,
which forces every distinct hash through the group exchange — opt-in
only, never the shipped default.
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
    exact: bool = False,
) -> DataFrame:
    """Per-group KMV sketch + estimate: (groups..., kth_hash,
    est_distinct). The shipped default is SKETCH-ONLY: the rank<=k
    filter sits directly on the row_number so Catalyst's
    InferWindowGroupLimit bounds the group exchange at k hashes per
    group (map-side WindowGroupLimit top-k). When a group has fewer
    than k distinct values the estimate IS the exact count (the sketch
    holds the whole hash set).

    ``exact=True`` (debug only) adds an ``n_exact`` column — the true
    distinct count — which requires aggregating EVERY distinct hash per
    group across the exchange; never the default because that unbounds
    the shuffle at corpus vocabulary size."""
    gcols = list(group_cols)
    hashed = df.select(*gcols, h32(value_col).alias("__h")).distinct()
    w = Window.partitionBy(*gcols).orderBy("__h")
    ranked = hashed.withColumn("__rk", F.row_number().over(w))
    if exact:
        sk = ranked.groupBy(*gcols).agg(
            F.count("*").alias("n_exact"),
            F.max(F.when(F.col("__rk") == k, F.col("__h"))).alias("__kth"),
        )
        est = F.when(
            F.col("__kth").isNull(), F.col("n_exact").cast("double")
        ).otherwise(
            F.round(F.lit(k - 1) * F.lit(HASH_SPACE) / F.col("__kth"), 3)
        )
        return sk.select(
            *gcols,
            "n_exact",
            F.col("__kth").alias("kth_hash"),
            est.alias("est_distinct"),
        )
    kept = ranked.filter(F.col("__rk") <= k)
    sk = kept.groupBy(*gcols).agg(
        F.count("*").alias("__n_kept"),
        F.max(F.when(F.col("__rk") == k, F.col("__h"))).alias("__kth"),
    )
    est = F.when(
        F.col("__kth").isNull(), F.col("__n_kept").cast("double")
    ).otherwise(F.round(F.lit(k - 1) * F.lit(HASH_SPACE) / F.col("__kth"), 3))
    return sk.select(
        *gcols,
        F.col("__kth").alias("kth_hash"),
        est.alias("est_distinct"),
    )


def kmv_distinct_sql(
    table_expr: str,
    group_cols: Sequence[str],
    value_sql: str,
    k: int = 64,
    exact: bool = False,
) -> str:
    """DuckDB mirror of :func:`kmv_distinct` over ``table_expr`` (a FROM
    clause producing one row per element, e.g. an unnested token
    stream)."""
    from ..functions.hashing import h32_sql

    g = ", ".join(group_cols)
    exact_col = "count(*) AS n_exact," if exact else "count(*) AS __n_kept,"
    exact_out = "n_exact," if exact else ""
    fallback = "n_exact" if exact else "__n_kept"
    where = "" if exact else f"WHERE __rk <= {k}"
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
      SELECT {g}, {exact_col}
             max(CASE WHEN __rk = {k} THEN __h END) AS kth_hash
      FROM ranked {where} GROUP BY {g}
    )
    SELECT {g}, {exact_out} kth_hash,
           CASE WHEN kth_hash IS NULL THEN CAST({fallback} AS DOUBLE)
                ELSE round({k - 1} * {HASH_SPACE} / kth_hash, 3) END
               AS est_distinct
    FROM sk
    """


# Default filter width. SIZING: with 2 probes/element, FPR ~=
# (1 - e^(-2n/bits))^2 — so ~20 bits/element gives ~1% FPR, and a
# 4096-bit filter saturates (FPR -> 1) past a few thousand elements.
# Pass ``bits`` sized to the build set (power-of-two multiple of 64) at
# anything beyond testdata scale; the bit_or aggregation works at any
# width and the shuffle stays at bits/64 longs per partition.
BLOOM_BITS = 4096
BLOOM_WORDS = BLOOM_BITS // 64

# single-bit masks as int64 literals (bit 63 = sign bit, two's complement);
# an indexed literal array because shift-by-column isn't portable
_MASKS = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]
_MASKS_SQL = "[" + ", ".join(
    str(m) if m != -(1 << 63) else "(-9223372036854775807 - 1)" for m in _MASKS
) + "]"


def _mask(bit: Column) -> Column:
    return F.element_at(F.array(*[F.lit(m) for m in _MASKS]), bit + 1)


def _bloom_positions(value_col: Column, bits: int = BLOOM_BITS) -> list[Column]:
    """Two INDEPENDENT h32 probes per element (the second salted with a
    'b:' prefix). Deriving the second position from the high bits of
    one 32-bit hash is cheaper but loses entropy as the filter grows
    (only 2^32/bits reachable positions — measured 6x the theoretical
    FPR at 2^18 bits); two salted md5 folds stay at theoretical FPR at
    any width up to 2^32."""
    return [
        h32(value_col) % bits,
        h32(F.concat(F.lit("b:"), value_col)) % bits,
    ]


def _check_bits(bits: int) -> int:
    if bits < 64 or bits % 64 != 0:
        raise ValueError(f"bloom bits must be a positive multiple of 64: {bits}")
    return bits // 64


def bloom_build(
    df: DataFrame, value_col: Column, bits: int = BLOOM_BITS
) -> DataFrame:
    """Aggregate a portable Bloom filter over ``value_col``: one row,
    ``words`` = array of ``bits/64`` longs (2 probes/element; size
    ``bits`` to the build set — see the BLOOM_BITS sizing note). Unlike
    an engine's native bloom (whose bit layout is an implementation
    detail), this one is a pure function of the h32 multiset — buildable
    and probe-able identically in any engine, and mergeable with plain
    ``bit_or``. The build is a map-side-combining bit_or aggregation of
    at most bits/64 words — the shuffle moves bits/64 longs per
    partition no matter the input size."""
    words_n = _check_bits(bits)
    pos = F.explode(F.array(*_bloom_positions(value_col, bits))).alias("__p")
    contrib = df.select(pos).select(
        (F.col("__p") / 64).cast("long").alias("__w"),
        _mask((F.col("__p") % 64).cast("int")).alias("__m"),
    )
    words = contrib.groupBy("__w").agg(F.expr("bit_or(__m)").alias("__word"))
    # densify to all bits/64 words (missing word = 0), pack to one array row
    idx = F.explode(F.sequence(F.lit(0), F.lit(words_n - 1))).alias("__w")
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


def bloom_might_contain(
    words_col: Column, value_col: Column, bits: int = BLOOM_BITS
) -> Column:
    """Probe: both derived bits set => possibly a member (one-sided
    error). ``bits`` must match the build width. Pure expressions —
    with the filter joined (or inlined) this is a map-side gate, the
    broadcast-bloom analogue of a semi-join."""
    _check_bits(bits)
    checks = []
    for p in _bloom_positions(value_col, bits):
        word = F.element_at(words_col, (p / 64).cast("int") + 1)
        checks.append(word.bitwiseAND(_mask((p % 64).cast("int"))) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def _bloom_positions_sql(value_sql: str, bits: int = BLOOM_BITS) -> tuple[str, str]:
    from ..functions.hashing import h32_sql

    salted = f"('b:' || {value_sql})"
    return (
        f"({h32_sql(value_sql)} % {bits})",
        f"({h32_sql(salted)} % {bits})",
    )


def bloom_sql(build_from: str, value_sql: str, bits: int = BLOOM_BITS) -> str:
    """DuckDB CTE text producing the same one-row (words) frame from
    ``build_from`` (a FROM clause) over ``value_sql``."""
    words_n = _check_bits(bits)
    p1, p2 = _bloom_positions_sql(value_sql, bits)
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
        FROM (SELECT unnest(range(0, {words_n})) AS wi) r
        LEFT JOIN bits ON bits.w = r.wi
        GROUP BY r.wi
      )
      SELECT list(word ORDER BY wi) AS words FROM dense
    """


def bloom_probe_sql(
    words_expr: str, value_sql: str, bits: int = BLOOM_BITS
) -> str:
    _check_bits(bits)
    probes = []
    for p in _bloom_positions_sql(value_sql, bits):
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
