"""Connected components over similarity edges — duplicate clustering.

Near-dup pair generation (MinHash/SimHash/cosine) yields EDGES; dedup
decisions need CLUSTERS (keep one doc per component). This implements
the alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — the
web-scale standard between pair mining and keep-one selection):

  large-star: every vertex u connects its LARGER neighbors to the
      minimum of its closed neighborhood m(u);
  small-star: every vertex u connects its smaller neighbors (and
      itself) to that minimum.

Each half-step is one key-partitioned aggregate + one join over the
edge list — no per-vertex state beyond the edge rows themselves — and
the edge count never grows. The alternation provably converges in
O(log^2 n) iterations to per-component STARS rooted at the component
minimum, so even a transitive near-dup chain of 10^6 docs (the
adversarial shape where plain min-label propagation needs 10^6 rounds
— and where a label + pointer-jumping hybrid is still linear-ish,
measured) resolves in tens of iterations. Typical near-dup components
(duplicates of a common source) are already stars and converge in 1-2.

Scale shape: per iteration two joins + two groupBys, all keyed on
vertex id, with a RELIABLE checkpoint between iterations so lineage
stays flat AND the run survives executor loss (operators/lineage.py —
localCheckpoint's executor-resident blocks abort the whole query when
any executor dies mid-run, measured by executor_loss_chaos.py; over
tens of iterations on a 1000-executor spot fleet that abort is near
certain). The fixpoint test rides the checkpoint's materialization job
as two observed scalars (edge count + decimal endpoint sum — see the
in-loop proof sketch), so no extra probe job ever runs. ``max_iter``
bounds the loop and a non-convergence warning fires if it is ever hit.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from .lineage import truncate_lineage

logger = logging.getLogger(__name__)


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
    dedup_edges: bool = False,
    checkpoint: str = "reliable",
) -> DataFrame:
    """Return (vertex, component) where component = min vertex id in the
    connected component. Only vertices appearing in ``edges`` are
    labeled (isolated docs are their own cluster by definition);
    self-edges (u, u) are ignored.

    Both star operations are duplicate-tolerant — a repeated edge emits
    a repeated (and equal) star edge, never a different result — so the
    edge list is NOT deduplicated by default (our pair miners already
    emit distinct pairs, and the dedup would cost an extra corpus-wide
    shuffle). Callers feeding heavily duplicated edge streams (e.g. raw
    multi-band LSH hits) should pass ``dedup_edges=True`` and pay that
    shuffle once, since duplicates otherwise ride along every iteration.

    ``checkpoint`` selects the per-iteration lineage truncation:
    ``"reliable"`` (default — survives executor loss) or ``"local"``
    (executor-memory blocks, faster, aborts on any executor death; see
    operators/lineage.py for the measured failure).
    """
    # Canonical orientation (lo, hi): the undirected edge set as sorted
    # pairs. Star emissions below always produce m < v, so orientation
    # is preserved for free after the first iteration.
    ecur = edges.select(
        F.least(F.col(src), F.col(dst)).alias("lo"),
        F.greatest(F.col(src), F.col(dst)).alias("hi"),
    ).where(F.col("lo") != F.col("hi"))
    if dedup_edges:
        ecur = ecur.distinct()
    ecur = truncate_lineage(ecur, checkpoint)

    # Fixpoint detection without a comparison job: track (edge count,
    # decimal sum of lo+hi) per iteration. Large-star maps each
    # canonical edge (lo, hi) -> (m(lo), hi) with m(lo) <= lo — count
    # preserved, sum never increases, and any change strictly drops the
    # sum. Small-star re-attaches (lo, hi) with lo != m to (m, lo) —
    # m < hi, so the sum strictly drops — and collapses duplicate
    # (m, hi) rows through the mins2 aggregate — count strictly drops.
    # Nothing ever increases either scalar (for ANY ids, negative
    # included), so both unchanged across a full iteration iff the
    # iteration was the identity, i.e. the star-forest fixpoint.
    prev: tuple | None = None

    # Both star halves are expressed as WINDOW minima + single-pass
    # array emissions rather than groupBy+join pairs: each half then has
    # exactly one downstream consumer, the whole iteration pipelines
    # into ONE job (the checkpoint), and no join appears anywhere in the
    # loop. The shuffle count per iteration is the same two key
    # exchanges the aggregates would have cost.
    #
    # The iteration body is assembled from LOOP-INVARIANT SQL strings
    # (optimization r13): the Column-DSL form paid ~60 Py4J roundtrips
    # of driver latency per iteration rebuilding the identical
    # expression trees, which the event timeline showed as ~0.3 s
    # driver-side gaps BETWEEN the per-iteration jobs — on a converged
    # 3-iteration run that overhead rivaled the jobs themselves. Each
    # selectExpr parses to the same Catalyst tree the DSL built
    # (window minima, row_number, the IF/filter/explode emission);
    # results are bit-identical and the fixpoint scalars unchanged.
    ls_m = "min(least(u, v)) OVER (PARTITION BY u) AS m"
    ss_exprs = [
        "lo",
        "hi",
        "min(lo) OVER (PARTITION BY hi) AS m",
        "row_number() OVER (PARTITION BY hi ORDER BY lo) AS rn",
    ]
    emit_expr = (
        "explode(filter(array("
        " IF(lo != m, struct(m AS lo, lo AS hi), NULL),"
        " IF(rn = 1, struct(m AS lo, hi AS hi), NULL)"
        "), x -> x IS NOT NULL)) AS e"
    )
    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # --- large-star ---------------------------------------------
        # m(u) = min of u's closed neighborhood; every neighbor v > u
        # re-attaches to m(u). m(u) <= u < v, so emissions stay
        # canonically oriented and never self-loop.
        sym = ecur.selectExpr("lo AS u", "hi AS v").union(
            ecur.selectExpr("hi AS u", "lo AS v")
        )
        e_ls = (
            sym.selectExpr("u", "v", ls_m)
            .where("v > u")
            .selectExpr("m AS lo", "v AS hi")
        )

        # --- small-star ---------------------------------------------
        # Seen from the larger endpoint hi: m = min of its smaller
        # neighbors; each other smaller neighbor re-attaches to m, and
        # hi itself attaches to m (emitted once per hi, from its first
        # row). m < lo and m < hi: still canonical.
        obs = Observation()
        e_ss = truncate_lineage(
            e_ls.selectExpr(*ss_exprs)
            .selectExpr(emit_expr)
            .selectExpr("e.lo AS lo", "e.hi AS hi")
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    (F.col("lo") + F.col("hi")).cast("decimal(38,0)")
                ).alias("s"),
            ),
            checkpoint,
            supersedes=ecur,  # loop holds <= 2 materialized copies
        )
        got = obs.get
        cur = (got["n"], got["s"])
        ecur = e_ss
        if cur == prev:
            converged = True
            break
        prev = cur

    if converged:
        logger.debug("connected_components: fixpoint after %d iterations", rounds)
    if not converged:
        # Star edges at any point connect vertices of one true
        # component (never across), so the labels below are still a
        # valid refinement — but clusters may be split. Never silent.
        logger.warning(
            "connected_components: not converged after %d iterations; "
            "labels may split clusters",
            max_iter,
        )

    # At the fixpoint ecur is a star forest: (component-min, child).
    # Children take their root's id; roots label themselves. groupBy
    # (not distinct) so duplicate-edge inputs collapse here too.
    return (
        ecur.select(F.col("hi").alias("vertex"), F.col("lo").alias("component"))
        .unionAll(ecur.select(F.col("lo").alias("vertex"), F.col("lo").alias("component")))
        .groupBy("vertex")
        .agg(F.min("component").alias("component"))
    )
