"""Connected components over similarity edges — duplicate clustering.

Near-dup pair generation (MinHash/SimHash/cosine) yields EDGES; dedup
decisions need CLUSTERS (keep one doc per component). This implements
iterative min-label propagation: every vertex starts labeled with the
minimum id in its closed neighborhood (the first propagation round,
folded into initialization as a plain groupBy) and repeatedly adopts
the minimum label among itself and its neighbors, converging in
O(component diameter) rounds.

Scale shape: each round is one join + one groupBy (both on vertex id —
the same partitioning reused across rounds), with localCheckpoint
between rounds so lineage stays flat. Components from near-dup graphs
are shallow (duplicates of a common source), so rounds stay in the
single digits; ``max_iter`` bounds pathological chains. This is the
standard large-star/small-star simplification that web-scale dedup
pipelines run between pair mining and keep-one selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    dedup_edges: bool = False,
) -> DataFrame:
    """Return (vertex, component) where component = min vertex id in the
    connected component. Only vertices appearing in ``edges`` are
    labeled (isolated docs are their own cluster by definition).

    Min-label propagation is duplicate-tolerant — a repeated edge cannot
    change any ``min`` — so the edge list is NOT deduplicated by default
    (our pair miners already emit distinct pairs, and the dedup would
    cost an extra corpus-wide shuffle before the loop even starts).
    Duplicated edges only inflate each round's join fan-out, so callers
    feeding an edge stream with heavy duplication (e.g. raw multi-band
    LSH hits) should pass ``dedup_edges=True`` and pay that shuffle
    once instead of every round."""
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    if dedup_edges:
        sym = sym.distinct()
    sym = sym.localCheckpoint(eager=True)

    # Fold the first propagation round into initialization: label(u) =
    # min over {u} ∪ N(u) is a plain groupBy over the symmetric edge
    # list (no join needed while every label still equals its vertex).
    # One fewer distributed round at ANY scale — on a 100 TB edge list a
    # round is a full shuffle, and the init groupBy replaces both the
    # "labels = distinct vertices" job and round 1's join.
    init_obs = Observation()
    labels = (
        sym.groupBy(F.col("u").alias("vertex"))
        .agg(F.min(F.least("u", "v")).alias("component"))
        .observe(
            init_obs, F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        )
        .localCheckpoint(eager=True)
    )

    # Convergence check: per-vertex labels are non-increasing (the min
    # always includes the vertex's own label) over a fixed vertex set,
    # so the label SUM strictly decreases iff any vertex changed — an
    # exact scalar (decimal(38,0) keeps it exact at any vertex-count x
    # id-range product). The sum rides the eager checkpoint's own
    # materialization job as an observed metric, so each round runs
    # exactly ONE job: join + groupBy + checkpoint + convergence scalar.
    # (Metrics on an eager localCheckpoint fire in both batch and
    # foreachBatch contexts — verified empirically; SQL *writes* of join
    # plans inside foreachBatch do NOT deliver observed metrics, which
    # is why consumer/persistor.py tallies with a count job instead.)
    #
    # The init labels (first propagation folded in) may already be the
    # fixed point — star components centered on their min vertex
    # converge at init — so the baseline sum rides the init job and the
    # very first loop round can detect convergence.
    prev_sum = init_obs.get["s"]
    for _ in range(max_iter):
        nbr = sym.join(
            labels, sym["v"] == labels["vertex"]
        ).select(F.col("u").alias("vertex"), "component")
        obs = Observation()
        new_labels = (
            labels.select("vertex", "component")
            .unionAll(nbr)
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
            .observe(
                obs, F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
            )
            .localCheckpoint(eager=True)
        )
        new_sum = obs.get["s"]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
