"""Connected components over similarity edges — duplicate clustering.

Near-dup pair generation (MinHash/SimHash/cosine) yields EDGES; dedup
decisions need CLUSTERS (keep one doc per component). This implements
iterative min-label propagation: every vertex starts labeled with its
own id and repeatedly adopts the minimum label among itself and its
neighbors, converging in O(component diameter) rounds.

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
) -> DataFrame:
    """Return (vertex, component) where component = min vertex id in the
    connected component. Only vertices appearing in ``edges`` are
    labeled (isolated docs are their own cluster by definition)."""
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
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
    # No pre-loop sum: round 1 always changes at least one label (every
    # edge has u != v, so the larger endpoint adopts the smaller), so
    # the first comparison that can break the loop is round 2's.
    prev_sum = None
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
        if prev_sum is not None and new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
