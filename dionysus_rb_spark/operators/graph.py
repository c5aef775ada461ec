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
    checkpoint_interval: int = 1,
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

    ``checkpoint_interval`` (optimization r14, VERDICT r13 item 2) runs
    that many star iterations per lineage truncation instead of one:
    each checkpoint JOB pipelines ``interval`` unrolled iteration
    bodies, so an N-iteration run pays ceil(N/interval) full edge-list
    materializations instead of N. The DEFAULT IS 1 because unrolling
    was MEASURED WORSE on the near-dup workload (within-process
    alternating A/B on dd_dedup_final at sf0.1: interval=1 med 2.74 s,
    interval=2 med 3.02 s, interval=4 med 4.00 s): near-dup components
    converge in 1-3 iterations, and chunk-granular fixpoint detection
    runs up to ``interval`` extra IDENTITY iterations (2 exchanges each
    over the final star forest) — on fast-converging graphs the wasted
    exchanges exceed the saved checkpoint I/O. The knob exists for the
    opposite regime: a deep-diameter graph (many iterations) on storage
    where the per-truncation edge-list write/read dominates two in-memory
    exchanges. Costs when raised, stated: the task-failure recompute
    window widens to ``interval`` iterations of lineage (still bounded —
    the edge count never grows; executor-LOSS safety is unchanged, the
    boundary is still the reliable parquet roundtrip). Labels are
    interval-independent — pinned by tests/test_graph.py against
    interval=1 and the union-find reference.
    """
    interval = max(1, int(checkpoint_interval))
    # Canonical orientation (lo, hi): the undirected edge set as sorted
    # pairs. Star emissions below always produce m < v, so orientation
    # is preserved for free after the first iteration.
    ecur = edges.select(
        F.least(F.col(src), F.col(dst)).alias("lo"),
        F.greatest(F.col(src), F.col(dst)).alias("hi"),
    ).where(F.col("lo") != F.col("hi"))
    if dedup_edges:
        ecur = ecur.distinct()
    # No up-front truncation (optimization r14): the first chunk's job
    # consumes the caller's edge plan exactly ONCE (the explode
    # symmetrization below replaced the union's double scan), so
    # materializing a canonical copy first would be one extra full
    # write+read of the edge list for nothing. Task-level retries inside
    # the first job recompute through the caller's (deterministic)
    # lineage, exactly as any single-job consumer of that plan would.

    # Fixpoint detection without a comparison job: track (edge count,
    # decimal sum of lo+hi) per CHUNK of ``interval`` iterations.
    # Large-star maps each canonical edge (lo, hi) -> (m(lo), hi) with
    # m(lo) <= lo — count preserved, sum never increases, and any change
    # strictly drops the sum. Small-star re-attaches (lo, hi) with
    # lo != m to (m, lo) — m < hi, so the sum strictly drops — and
    # collapses duplicate (m, hi) rows through the rn=1 emission — count
    # strictly drops. Nothing ever increases either scalar (for ANY ids,
    # negative included), so both unchanged across a chunk iff EVERY
    # iteration in the chunk was the identity, i.e. the star-forest
    # fixpoint — chunk-granular detection is exactly as sound as
    # per-iteration detection, one checkpoint later at worst. The single
    # observation sits at the chunk TOP (not one per unrolled body):
    # AQE's runtime empty-relation propagation can eliminate an INNER
    # CollectMetrics node when a body's output is empty, losing its
    # metrics (measured: obs.get raised on the empty-input case), while
    # the top-of-plan node always survives. n = 0 short-circuits —
    # an empty edge set is trivially a fixpoint.
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
    # The symmetrization is a single-pass generator (inline over both
    # orientations) rather than a UNION of two projections of ecur
    # (optimization r14): the union scanned the checkpointed edge list
    # TWICE per iteration — at corpus scale a second full read of the
    # edge files per iteration, for rows a generator emits from one
    # scan. Same row multiset, same windows, bit-identical emissions.
    sym_expr = (
        "inline(array(struct(lo AS u, hi AS v), struct(hi AS u, lo AS v)))"
    )
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

    def star_iteration(e: DataFrame) -> DataFrame:
        # --- large-star ---------------------------------------------
        # m(u) = min of u's closed neighborhood; every neighbor v > u
        # re-attaches to m(u). m(u) <= u < v, so emissions stay
        # canonically oriented and never self-loop.
        e_ls = (
            e.selectExpr(sym_expr)
            .selectExpr("u", "v", ls_m)
            .where("v > u")
            .selectExpr("m AS lo", "v AS hi")
        )
        # --- small-star ---------------------------------------------
        # Seen from the larger endpoint hi: m = min of its smaller
        # neighbors; each other smaller neighbor re-attaches to m, and
        # hi itself attaches to m (emitted once per hi, from its first
        # row). m < lo and m < hi: still canonical.
        return (
            e_ls.selectExpr(*ss_exprs)
            .selectExpr(emit_expr)
            .selectExpr("e.lo AS lo", "e.hi AS hi")
        )

    converged = False
    rounds = 0
    while rounds < max_iter and not converged:
        steps = min(interval, max_iter - rounds)
        frame = ecur
        for _ in range(steps):
            frame = star_iteration(frame)
        obs = Observation()
        ecur = truncate_lineage(
            frame.observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    (F.col("lo") + F.col("hi")).cast("decimal(38,0)")
                ).alias("s"),
            ),
            checkpoint,
            supersedes=ecur,  # loop holds <= 2 materialized copies
        )
        rounds += steps
        got = obs.get
        cur = (got["n"], got["s"])
        if cur == prev or got["n"] == 0:
            converged = True
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
