"""Deterministic k-means over embedding columns — the corpus-clustering
step of a curation pipeline (topic balancing, per-cluster sampling,
cluster-aware splits).

Lloyd's algorithm, Spark-first: the k centroids are collected to the
driver each iteration (k x dim doubles — hyperparameter-scale, the same
move MLlib's KMeans and pq_encode's codebook make) and inlined into the
plan as literals, so assignment is a MAP-ONLY argmax over one corpus
scan: no join, no per-vector window, no shuffle of K x N rows. The
update step is dimension-parallel — posexplode to (cluster, dim,
value), one groupBy(cluster, dim) whose per-cell mean is a SORTED
sequential fold, then re-assembly of the centroid arrays. The sorted
fold is what makes the whole iterative algorithm reproducible
bit-for-bit across engines and shuffle orders (a plain avg() varies in
the last ulp with partition order); a throughput-first deployment passes
``mean_mode="fast"`` to use plain ``F.avg`` — map-side partial
aggregation instead of shipping every value into a collect_list — and
drops only the bit-reproducibility guarantee: on any data whose
clusters are separated by more than a last-ulp cosine difference the
assignments are identical (pinned in tests/test_ann_recall.py).

Scale shape per iteration: one corpus scan (codegen'd literal argmax) +
one shuffle of (cluster, dim, value) triples for the means. The corpus
is never shuffled by cluster membership, and the only per-iteration
driver traffic is the k x dim centroid collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import as_double, cos_lit_sql, cosine_sql, sane_vec, sane_vec_sql

Centroids = list[tuple[int, list[float]]]


def _assign(base: DataFrame, cents: Centroids) -> DataFrame:
    """Nearest-centroid assignment against LITERAL centroids: map-only
    argmax of rounded cosine, ties to the lowest centroid id.

    ``array_min`` over (−cos, id, cos) structs is lexicographic, so it
    is exactly ``ORDER BY cos DESC, id ASC LIMIT 1``; the third field
    carries the winner's cosine out bit-identically (−(−x) == x for
    every double, signed zeros included)."""
    # bind the row norm once (optimization r13): inlined in each
    # candidate's cosine it re-evaluated the fold K times per row
    from .similarity import _norm_sql

    normed = base.select("*", F.expr(_norm_sql("__v")).alias("__vn"))
    cands = ",".join(
        f"struct(-round({cos_lit_sql('__v', cv, norm_name='__vn')}, 6) AS nc,"
        f" {int(cid)}L AS cluster_id)"
        for cid, cv in cents
    )
    # bind the argmin struct once as well: projecting .cluster_id and
    # -.nc from the inlined text evaluated the whole candidate array
    # twice per row
    best = normed.select(
        "*", F.expr(f"array_min(array({cands}))").alias("__best")
    )
    return best.select(
        "vec_id",
        "__v",
        F.col("__best.cluster_id").alias("cluster_id"),
        (-F.col("__best.nc")).alias("__cos"),
    )


def _update(assigned: DataFrame, mean_mode: str = "sorted_fold") -> DataFrame:
    """New centroids: per-(cluster, dim) mean, then array re-assembly.

    ``mean_mode="sorted_fold"`` (default): sorted sequential fold —
    engine- and partition-order-independent, the mode every DuckDB
    oracle mirrors. ``"fast"``: plain ``F.avg`` — partial-aggregates
    map-side (no per-cell collect_list), cheaper at scale, deterministic
    only up to float addition order."""
    cells = assigned.select(
        "cluster_id", F.posexplode("__v").alias("__d", "__x")
    )
    if mean_mode == "fast":
        means = cells.groupBy("cluster_id", "__d").agg(F.avg("__x").alias("__m"))
    elif mean_mode == "sorted_fold":
        means = cells.groupBy("cluster_id", "__d").agg(
            (
                F.aggregate(
                    F.array_sort(F.collect_list("__x")),
                    F.lit(0.0),
                    lambda a, b: a + b,
                )
                / F.count("*")
            ).alias("__m")
        )
    else:
        raise ValueError(f"mean_mode must be 'sorted_fold' or 'fast', got {mean_mode!r}")
    return means.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__d", "__m"))), lambda s: s["__m"]
        ).alias("__cv")
    )


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mean_mode: str = "sorted_fold",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations from deterministic seeds (the
    vectors with the ``k`` lowest ids — the cross-engine-reproducible
    analogue of kmeans|| seeding) and return the final assignment:
    (vec_id, cluster_id, cos). ``cluster_id`` numbers the seed order
    densely 0..k-1 (driver-side enumerate — no renumbering window).

    ``mean_mode`` picks the centroid-mean implementation (see
    ``_update``): keep the default for oracle-comparable runs; use
    ``"fast"`` when bit-reproducibility across engines isn't needed.
    """
    from pyspark.storagelevel import StorageLevel

    base = (
        embeddings.select(
            F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("__v")
        )
        # cosine-metric clustering: zero-norm / non-finite vectors have
        # no defined angle to any centroid — excluded up front (and kept
        # out of seeds and means, where one NaN would poison a centroid)
        .filter(sane_vec(F.col("__v")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seed_rows = sorted(
        base.orderBy("vec_id").limit(k).collect(), key=lambda r: r["vec_id"]
    )
    cents: Centroids = [(i, list(r["__v"])) for i, r in enumerate(seed_rows)]
    for _ in range(iters):
        assigned = _assign(base, cents)
        # collect the k x dim update (hyperparameter-scale) so the next
        # assignment stays a literal map; a cluster that loses every
        # member drops out, exactly as the DataFrame groupBy did
        cents = sorted(
            (int(r["cluster_id"]), list(r["__cv"]))
            for r in _update(assigned, mean_mode).collect()
        )
    # final assignment against the last updated centroids
    assigned = _assign(base, cents)
    return assigned.select("vec_id", "cluster_id", F.col("__cos").alias("cos"))


def kmeans_sql(k: int = 8, iters: int = 2) -> str:
    """DuckDB mirror: same seeds, same rounded-cosine assignment, same
    sorted-fold means, unrolled ``iters`` times."""
    cos_assign = cosine_sql("b.__v", "c.__cv")

    def assign_cte(cents: str, out: str) -> str:
        return f"""
    {out} AS (
      SELECT vec_id, __v, cluster_id, __cos FROM (
        SELECT b.vec_id, b.__v, c.cluster_id,
               round({cos_assign}, 6) AS __cos,
               row_number() OVER (PARTITION BY b.vec_id
                   ORDER BY round({cos_assign}, 6) DESC, c.cluster_id ASC) AS __rn
        FROM base b CROSS JOIN {cents} c) t
      WHERE __rn = 1
    )"""

    def update_cte(assigned: str, out: str) -> str:
        # per-dim sorted left fold == Spark's F.aggregate(array_sort(...))
        return f"""
    {out} AS (
      SELECT cluster_id,
             list_transform(range(1, 1 + len(vs[1])), d ->
                 list_reduce(list_sort(list_transform(vs, v -> v[d])),
                             (a, b) -> a + b) / len(vs)) AS __cv
      FROM (SELECT cluster_id, list(__v) AS vs FROM {assigned}
            GROUP BY cluster_id) g
    )"""

    ctes = [
        f"""base AS (
      SELECT vec_id, __v FROM (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS __v
        FROM embeddings) t0
      WHERE {sane_vec_sql('__v')}
    )""",
        f"""c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                 AS cluster_id,
             __v AS __cv
      FROM (SELECT vec_id, __v FROM base ORDER BY vec_id LIMIT {k}) s
    )""",
    ]
    cur = "c0"
    for i in range(iters):
        ctes.append(assign_cte(cur, f"a{i}"))
        ctes.append(update_cte(f"a{i}", f"c{i + 1}"))
        cur = f"c{i + 1}"
    ctes.append(assign_cte(cur, "final_assign"))
    body = ",\n".join(ctes)
    return f"""
    WITH {body}
    SELECT vec_id, cluster_id, __cos AS cos FROM final_assign
    """
