"""Embedding similarity search: brute-force cosine top-k (the exact
baseline) and hyperplane-LSH bucketing (the scale path), plus
embedding-cosine near-duplicate pairs.

Cosine is computed as an explicit left-fold (F.aggregate over zip_with)
in double precision — the same sequential order DuckDB's list_reduce
uses, so oracle results are bit-identical, no tolerance needed.

Scale shape: top-k for a query batch is broadcast(queries) x candidates
with a per-query TakeOrdered — one scan of the corpus, no shuffle of
the big side. The IVF/LSH variant buckets the corpus once (one narrow
shuffle of (bucket, id, vec)) and probes only matching buckets — the
standard recall/cost trade, with deterministic planes so it's testable.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns. NULL — not an
    error, not NaN — when either vector is degenerate: ``try_divide``
    yields NULL on a zero denominator (zero-norm vector; plain ``/``
    raises under ANSI mode, while DuckDB float division by zero is
    already NULL, so this is the cross-engine-identical choice), and
    ``nanvl`` folds the NaN produced by non-finite elements to NULL.
    One contract downstream: a NULL cosine never clears a ``>=``
    threshold and is filtered before any top-k rank, so garbage vectors
    can't surface as anyone's nearest neighbor (round-7 adversarial
    content fuzz: a NaN vector otherwise ranks #1 in EVERY query's
    top-k — NaN compares greater than everything in both engines)."""
    dot = _fold_sum(F.zip_with(a, b, lambda x, y: x * y))
    na = F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))
    nb = F.sqrt(_fold_sum(F.transform(b, lambda x: x * x)))
    return F.nanvl(F.try_divide(dot, na * nb), F.lit(None).cast("double"))


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _abs_sum(vec: Column) -> Column:
    return F.aggregate(F.transform(vec, F.abs), F.lit(0.0), lambda a, b: a + b)


def finite_vec(vec: Column) -> Column:
    """True iff the vector is NON-EMPTY and every element is finite.
    One fold: sum(|x|) is finite exactly when all elements are (abs
    rules out inf-inf cancellation, NaN propagates), and ``NaN < inf``
    is FALSE in both Spark and DuckDB (both order NaN above every other
    double), so a single ``< 'Infinity'`` comparison rejects NaN and
    ±Inf portably. The explicit size guard makes a ZERO-LENGTH
    embedding (a half-written producer row) inadmissible too: the
    Spark fold's 0.0 init would otherwise admit it, while DuckDB's
    init-less ``list_reduce`` RAISED on it — a vector with no
    dimensions has no geometry, and "admits vs crashes" was the
    round-7 review's one live cross-engine divergence."""
    return (F.size(vec) > 0) & (_abs_sum(vec) < F.lit(float("inf")))


def sane_vec(vec: Column) -> Column:
    """finite AND norm > 0 — the admission predicate for cosine-metric
    operators (k-means, IVF), where a zero-norm vector has no defined
    angle to anything. (``s > 0`` already excludes the empty vector;
    the SQL twin needs the explicit length guard only to keep the
    fold itself total.)"""
    s = _abs_sum(vec)
    return (s > 0) & (s < F.lit(float("inf")))


def finite_vec_sql(v: str) -> str:
    """DuckDB mirror of :func:`finite_vec`. ``list_aggregate(...,
    'sum')``, not ``list_reduce``: the init-less reduce RAISES on an
    empty list where the aggregate yields NULL, and `` len > 0 AND
    NULL `` is false — total on every input, like the Spark twin."""
    return (
        f"(len({v}) > 0 AND"
        f" list_aggregate(list_transform({v}, x -> abs(x)), 'sum')"
        f" < 'Infinity'::DOUBLE)"
    )


def sane_vec_sql(v: str) -> str:
    """DuckDB mirror of :func:`sane_vec` (total on empty lists — see
    :func:`finite_vec_sql`)."""
    s = f"list_aggregate(list_transform({v}, x -> abs(x)), 'sum')"
    return f"(len({v}) > 0 AND {s} > 0 AND {s} < 'Infinity'::DOUBLE)"


def cos_lit_sql(vec_name: str, lits: list[float], norm_name: str | None = None) -> str:
    """Cosine of a vector COLUMN NAME against a LITERAL vector as one
    SQL expression string — identical math to :func:`cosine` (sequential
    left-folds, dot / (na * nb)), but one ``F.expr`` parse instead of a
    Py4J round trip per literal (~0.5 s of serial driver time per 8x64
    candidate block — the lsh_bucket lesson, round 3; generalized to
    the centroid argmins in round 4). ``repr`` literals round-trip to
    the identical IEEE double.

    ``norm_name`` (optimization r13): name of a column already holding
    sqrt(fold(x*x)) of the vector. The centroid-argmin callers evaluate
    this expression once per CENTROID, so inlining the norm fold text
    re-computed the row's norm K times per row; the callers now bind it
    once as an attribute and pass its name. Identical expression tree
    per element either way — the norm value is the same double."""
    arr = "array(" + ",".join(f"{float(x)!r}D" for x in lits) + ")"
    dot = (
        f"aggregate(zip_with({vec_name}, {arr}, (x, y) -> x * y),"
        f" 0.0D, (acc, s) -> acc + s)"
    )
    na = norm_name or (
        f"sqrt(aggregate(transform({vec_name}, x -> x * x),"
        f" 0.0D, (acc, s) -> acc + s))"
    )
    nb = (
        f"sqrt(aggregate(transform({arr}, x -> x * x),"
        f" 0.0D, (acc, s) -> acc + s))"
    )
    # same degenerate-input contract as cosine(): NULL, never raise/NaN
    return f"nanvl(try_divide({dot}, ({na} * {nb})), CAST(NULL AS DOUBLE))"


# the norm fold cos_lit_sql inlines when no norm_name is given — bound
# once per row by the argmin callers (see cos_lit_sql's norm_name note)
def _norm_sql(vec_name: str) -> str:
    return (
        f"sqrt(aggregate(transform({vec_name}, x -> x * x),"
        f" 0.0D, (acc, s) -> acc + s))"
    )


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for a (small) query set: broadcast the
    queries across the corpus scan; rank per query."""
    emb = embeddings.select(
        F.col(id_col).alias("cand_id"), as_double(F.col(vec_col)).alias("__cv")
    )
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("__qv")
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
        # degenerate candidates (zero-norm / non-finite => NULL cosine)
        # never enter the rank: without this they'd still take the last
        # k slots when real candidates run short
        .filter(F.col("cos").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact near-duplicate pairs (cos >= threshold), optionally blocked
    on a partition column so the self-join shuffles per block instead of
    exploding all-pairs. ``block_col=None`` is an ALL-PAIRS join —
    O(n^2) comparisons with no equi-key, correct only for small frames
    (eval sets, per-cluster refinement); it warns so a corpus-sized
    call never degrades silently. Corpus-scale near-dup belongs to the
    bucketed paths (emb_semantic_dedup's eps-ball, MinHash/SimHash
    banding, LSH)."""
    if block_col is None:
        logger.warning(
            "cosine_near_dup_pairs: block_col=None compares ALL pairs "
            "(O(n^2)); only use on small frames"
        )
    base = embeddings.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__v"),
        *([F.col(block_col)] if block_col else []),
    )
    a, b = base.alias("a"), base.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .withColumn("cos", F.round(cosine(F.col("a.__v"), F.col("b.__v")), 6))
        .filter(F.col("cos") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cos",
        )
    )


# -- hyperplane LSH ---------------------------------------------------------


def planes(num_planes: int, dim: int, seed: int = 42) -> list[list[int]]:
    import random

    rng = random.Random(seed)
    return [[1 if rng.random() < 0.5 else -1 for _ in range(dim)] for _ in range(num_planes)]


def lsh_bucket(vec_name: str, plane_list: list[list[int]]) -> Column:
    """Bucket id = sign-bit vector across hyperplanes (literal ±1
    weights; dot via fold in the vector dimension).

    Takes the vector COLUMN NAME and assembles one SQL expression
    string: building num_planes x dim literals as individual ``F.lit``
    Column objects costs a Py4J round trip each (~0.5 s of driver time
    per query at 8x64 — measured), while one ``F.expr`` parse is
    milliseconds. Same Catalyst tree either way."""
    terms = []
    for p, w in enumerate(plane_list):
        arr = ",".join(f"{float(x)}D" for x in w)
        dot = (
            f"aggregate(zip_with({vec_name}, array({arr}), (x, s) -> x * s),"
            f" 0.0D, (a, b) -> a + b)"
        )
        terms.append(f"IF({dot} >= 0, {1 << p}L, 0L)")
    return F.expr("(" + " + ".join(terms) + ")")


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    num_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    dim: int,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Scale path: bucket by hyperplane signs, exact-verify within
    buckets only. Deterministic planes => oracle-checkable.

    ONE corpus exchange total (round 3; the round-2 shape staged bucket
    ids with collect_set then re-joined the vector frame twice — 3
    exchanges, a measured +37% at sf0.1): a count window partitioned by
    bucket sizes every bucket in place, ``max_bucket`` drops degenerate
    buckets BEFORE any vectors collect (so a hot bucket never
    materializes a fat row, let alone a quadratic expansion — a raw
    self-join on ``bucket`` would), and the same hash partitioning then
    feeds collect_list(struct(id, vec)) per surviving bucket; ordered
    pairs and their exact cosine expand bucket-locally, map-side, no
    joins. Per-bucket work is bounded at cap² however skewed the
    corpus; per-bucket memory at cap·dim doubles. Assumes ``id_col`` is
    unique (an embedding table key).

    ``dim`` is required (no driver-side probe job — the schema owner
    knows the embedding width); size ``num_planes`` ~
    log2(corpus / target_bucket_size) so mean bucket occupancy stays
    bounded as the corpus grows (8 planes = 256 buckets is a testdata
    setting, not a web-scale one).
    """
    pl = planes(num_planes, dim, seed)
    # finite-vector admission BEFORE bucketing: a NaN vector's bucket is
    # engine-dependent (Spark IF(NaN >= 0) is false, DuckDB's NaN sorts
    # above every double -> true), so an unfiltered NaN row lands in
    # different buckets per engine and can tip a bucket across
    # max_bucket on one side only; an empty vector crashed the oracle's
    # fold outright. Zero-norm vectors still bucket (deterministically,
    # all sign bits set on both engines) and die at the cosine verify.
    base = embeddings.filter(finite_vec(as_double(F.col(vec_col)))).select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("__v"),
    ).select(
        id_col,
        "__v",
        # row-level norm ONCE (the pair loop would recompute it per pair)
        F.expr(
            "sqrt(aggregate(transform(__v, x -> x * x), 0.0D,"
            " (a, b) -> a + b))"
        ).alias("__n"),
        lsh_bucket("__v", pl).alias("bucket"),
    )
    sized = base.withColumn(
        "__bn", F.count("*").over(Window.partitionBy("bucket"))
    ).filter(F.col("__bn") >= 2)
    if max_bucket is not None:
        sized = sized.filter(F.col("__bn") <= max_bucket)
    members = sized.groupBy("bucket").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("id"),
                    F.col("__v").alias("v"),
                    F.col("__n").alias("n"),
                )
            )
        ).alias("ms")
    )
    # one bucket per vector (single-band LSH) => pairs are already unique
    pairs_arr = F.expr(
        # nanvl(try_divide(...)) = the cosine() degenerate contract:
        # NULL (dropped by the threshold filter below), never ANSI
        # div-by-zero or a NaN that outranks every real pair
        "flatten(transform(ms, (x, i) ->"
        " transform(slice(ms, i + 2, size(ms)), y -> named_struct("
        "'id_a', x.id, 'id_b', y.id, 'cos',"
        " round(nanvl(try_divide(aggregate(zip_with(x.v, y.v, (p, q) -> p * q), 0.0D,"
        " (a, b) -> a + b), (x.n * y.n)), CAST(NULL AS DOUBLE)), 6)))))"
    )
    # the per-bucket expansion stage is byte-coalesced by AQE onto one
    # task (~0.27 s at sf0.1); width-pinning it via spread_for_compute
    # (the simhash_pairs fix) measured 1.13x WORSE here in an
    # interleaved A/B — the stage is too small to amortize the extra
    # exchange. Left alone per guide §1 measure-first. r13.
    return (
        members.select(F.explode(pairs_arr).alias("p"))
        .select("p.id_a", "p.id_b", "p.cos")
        .filter(F.col("cos") >= threshold)
    )


# -- IVF (cell-probed) ANN --------------------------------------------------


def ivf_assign(
    base: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign every vector to its nearest centroid cell (argmax cosine,
    ties to the lowest centroid id). The coarse quantizer is
    codebook-sized, so it inlines as literals and the assignment is
    MAP-ONLY — one codegen corpus scan, no join, no per-vector window
    (lexicographic array_min over (−cos, id) == ORDER BY cos DESC,
    id ASC LIMIT 1)."""
    # bind the row norm once (optimization r13): inlined in each
    # candidate's cosine it re-evaluated the fold K times per row
    normed = base.select("*", F.expr(_norm_sql("__v")).alias("__vn"))
    cands = ",".join(
        f"struct(-{cos_lit_sql('__v', cv, norm_name='__vn')} AS nc,"
        f" {int(cid)}L AS cent_id)"
        for cid, cv in centroids
    )
    best = f"array_min(array({cands}))"
    return normed.select(
        id_col, "__v", F.expr(f"{best}.cent_id").alias("cent_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: bucket the corpus into centroid cells, probe only
    each query's ``nprobe`` nearest cells, exact-rank within them.

    Centroids here are the first ``n_centroids`` corpus vectors — a
    deterministic stand-in for the k-means training step (which is
    centroid *selection*, not search; swapping in trained centroids
    changes recall, not the plan). Search cost drops from O(n) per query
    to O(n * nprobe / n_centroids); the coarse quantizer is collected
    once (codebook-sized) so both the assignment pass and the query
    probe are literal map-only scans — no join, no per-vector window."""
    base = embeddings.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__v")
    ).filter(sane_vec(F.col("__v")))  # no defined cell for zero-norm/NaN/Inf
    cents = sorted(
        (int(r[id_col]), list(r["__v"]))
        for r in base.filter(F.col(id_col) < n_centroids).collect()
    )
    assigned = ivf_assign(base, cents, id_col)

    queries = assigned.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("__v").alias("__qv")
    )
    # per-query nprobe nearest cells: sort the literal (−cos, cent_id)
    # struct array and take the prefix — ORDER BY cos DESC, id ASC
    qcands = ",".join(
        f"struct(-{cos_lit_sql('__qv', cv)} AS nc, {int(cid)}L AS cent_id)"
        for cid, cv in cents
    )
    probe = queries.select(
        "query_id",
        "__qv",
        F.expr(
            f"explode(slice(array_sort(array({qcands})), 1, {nprobe}))"
        ).alias("__pc"),
    ).select("query_id", "__qv", F.col("__pc.cent_id").alias("cent_id"))

    cands = (
        probe.alias("p")
        .join(assigned.alias("a"), F.col("p.cent_id") == F.col("a.cent_id"))
        .filter(F.col("query_id") != F.col(f"a.{id_col}"))
    )
    scored = cands.withColumn(
        "cos", F.round(cosine(F.col("__qv"), F.col("a.__v")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(f"a.{id_col}"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(f"a.{id_col}").alias("cand_id"),
            "cos",
            F.col("rank").cast("long").alias("rank"),
        )
    )


# -- DuckDB SQL mirrors -----------------------------------------------------

_COS_SQL = """
    CASE WHEN len({a}) = 0 OR len({b}) = 0 THEN NULL
    WHEN isnan(
    list_reduce(list_transform(range(len({a})), i -> {a}[i+1] * {b}[i+1]),
                (x, y) -> x + y)
    / (sqrt(list_reduce(list_transform({a}, x -> x*x), (x,y) -> x+y))
       * sqrt(list_reduce(list_transform({b}, x -> x*x), (x,y) -> x+y)))
    ) THEN NULL ELSE
    list_reduce(list_transform(range(len({a})), i -> {a}[i+1] * {b}[i+1]),
                (x, y) -> x + y)
    / (sqrt(list_reduce(list_transform({a}, x -> x*x), (x,y) -> x+y))
       * sqrt(list_reduce(list_transform({b}, x -> x*x), (x,y) -> x+y)))
    END
"""


def cosine_sql(a: str, b: str) -> str:
    """Mirrors cosine(): DuckDB float division by zero is already NULL
    (= Spark's try_divide); the isnan CASE folds non-finite-input NaN
    to NULL so both engines share one degenerate contract. The leading
    empty-length CASE branch keeps the expression TOTAL — DuckDB's
    init-less ``list_reduce`` raises on an empty list where Spark's
    0.0-seeded fold yields a NULL cosine via try_divide(0, 0); CASE
    short-circuits, and the folds stay ``list_reduce`` (not
    list_aggregate) because their sequential order IS the cross-engine
    bit-parity guarantee."""
    return _COS_SQL.format(a=a, b=b)


def brute_force_topk_sql(query_ids: list[int], k: int = 10) -> str:
    ids = ", ".join(map(str, query_ids))
    cos = cosine_sql("q.__qv", "c.__cv")
    return f"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS __qv FROM base WHERE vec_id IN ({ids})),
    c AS (SELECT vec_id AS cand_id, v AS __cv FROM base),
    -- score once per pair: inlining the cosine into SELECT + ORDER BY
    -- + WHERE re-evaluated the three list folds up to ~8x per pair on
    -- the O(n^2) path (round-7 review find)
    scored AS (
      SELECT query_id, cand_id, round({cos}, 6) AS cos
      FROM q JOIN c ON cand_id <> query_id
    )
    SELECT query_id, cand_id, cos,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, cand_id ASC) AS BIGINT) AS rank
    FROM scored
    WHERE cos IS NOT NULL
    QUALIFY rank <= {k}
    """


def ivf_topk_sql(
    query_ids: list[int], k: int = 10, n_centroids: int = 8, nprobe: int = 2
) -> str:
    ids = ", ".join(map(str, query_ids))
    assign_cos = cosine_sql("b.v", "c.cv")
    q_cos = cosine_sql("q.qv", "c.cv")
    final_cos = cosine_sql("q.qv", "a.v")
    return f"""
    WITH base AS (
      SELECT vec_id, v FROM (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings) t
      WHERE {sane_vec_sql('v')}
    ),
    cents AS (SELECT vec_id AS cent_id, v AS cv FROM base WHERE vec_id < {n_centroids}),
    assigned AS (
      SELECT vec_id, v, cent_id FROM (
        SELECT b.vec_id, b.v, c.cent_id,
               row_number() OVER (PARTITION BY b.vec_id
                   ORDER BY {assign_cos} DESC, c.cent_id ASC) AS rn
        FROM base b CROSS JOIN cents c)
      WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id IN ({ids})),
    probe AS (
      SELECT query_id, qv, cent_id FROM (
        SELECT q.query_id, q.qv, c.cent_id,
               row_number() OVER (PARTITION BY q.query_id
                   ORDER BY {q_cos} DESC, c.cent_id ASC) AS rn
        FROM q CROSS JOIN cents c)
      WHERE rn <= {nprobe}
    )
    SELECT query_id, cand_id, cos, rank FROM (
      SELECT q.query_id, a.vec_id AS cand_id,
             round({final_cos}, 6) AS cos,
             CAST(row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round({final_cos}, 6) DESC, a.vec_id ASC) AS BIGINT) AS rank
      FROM probe q JOIN assigned a ON a.cent_id = q.cent_id
      WHERE a.vec_id <> q.query_id)
    WHERE rank <= {k}
    """


def lsh_near_dup_sql(
    plane_list: list[list[int]], threshold: float = 0.9, max_bucket: int = 1000
) -> str:
    bucket_terms = []
    for p, w in enumerate(plane_list):
        lits = ", ".join(f"CAST({x} AS DOUBLE)" for x in w)
        bucket_terms.append(
            f"CASE WHEN list_reduce(list_transform(range(len(v)),"
            f" i -> v[i+1] * ([{lits}])[i+1]), (x,y) -> x+y) >= 0"
            f" THEN (CAST(1 AS BIGINT) << {p}) ELSE 0 END"
        )
    bucket = " + ".join(bucket_terms)
    cos = cosine_sql("a.v", "b.v")
    return f"""
    WITH base AS (
      -- finite-vector admission mirrors lsh_near_dup_pairs (NaN
      -- buckets are engine-dependent; empty vectors crash the fold)
      SELECT vec_id, v FROM (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings) t_adm
      WHERE {finite_vec_sql('v')}
    ),
    bucketed AS (SELECT vec_id, v, {bucket} AS bucket FROM base),
    ok AS (
      SELECT bucket FROM bucketed
      GROUP BY bucket HAVING count(*) BETWEEN 2 AND {max_bucket}
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS cos
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    JOIN ok ON ok.bucket = a.bucket
    WHERE round({cos}, 6) >= {threshold}
    """
