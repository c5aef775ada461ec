"""N-vertex connected-components validation (round 5; N-parameterized
round 7 for the 10^7 decade run, VERDICT r6 item 5).

Two topologies, both with randomly permuted vertex ids so the
component min is never positionally convenient:

1. A single N-vertex path (diameter N-1) — the adversarial
   iteration-count shape; the O(log^2 n) star alternation must resolve
   it in tens of iterations where min-label propagation needs ~N.
2. A corpus-shaped dup graph: N edges forming ~N/5 star/chain
   clusters of size 2-12 — the realistic near-dup workload, measuring
   edge throughput at low iteration counts.

Checks: every vertex labeled, one component per expected cluster,
label = cluster min. Prints timings for SCALING.md.

Usage: python tools/validation/cc_million.py [n_vertices]   # default 1M
"""

import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

logging.basicConfig(level=logging.DEBUG)
for n in list(logging.root.manager.loggerDict):
    if not n.startswith("dionysus"):
        logging.getLogger(n).setLevel(logging.WARN)

from pyspark.sql import functions as F

from dionysus_rb_spark.operators.graph import connected_components
from dionysus_rb_spark.session import get_spark

spark = get_spark(cpus=16)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def _next_prime(n: int) -> int:
    def is_prime(x: int) -> bool:
        if x < 2 or x % 2 == 0:
            return x == 2
        f = 3
        while f * f <= x:
            if x % f == 0:
                return False
            f += 2
        return True

    while not is_prime(n):
        n += 1
    return n


# Deterministic pseudo-random permutation of vertex ids:
# id -> id * c mod p with p prime >= max id + 1 and gcd(c, p) = 1 — a
# bijection on [0, p), and the product (<= 1e8 * 2.7e9 ~ 2.7e17) stays
# inside a 64-bit long, so no ANSI overflow.
PERM_C = 2654435761
PERM_P = _next_prime(N)


def perm(col):
    return (col * F.lit(PERM_C)) % F.lit(PERM_P)


# --- topology 1: one deep path --------------------------------------
base = spark.range(N - 1)
path = base.select(
    perm(F.col("id")).alias("doc_a"), perm(F.col("id") + 1).alias("doc_b")
)
t0 = time.time()
labels = connected_components(path).cache()
n_vertices = labels.count()
n_components = labels.select("component").distinct().count()
t_path = time.time() - t0
true_min = path.select(
    F.least(F.min("doc_a"), F.min("doc_b")).alias("m")
).collect()[0]["m"]
got_min = labels.select(F.min("component").alias("m")).collect()[0]["m"]
print(
    f"PATH: {n_vertices} vertices, {n_components} component(s), "
    f"min_ok={true_min == got_min}, {t_path:.1f}s"
)
assert n_vertices == N and n_components == 1 and true_min == got_min
labels.unpersist()

# --- topology 2: corpus-shaped dup clusters -------------------------
# Fixed blocks of 12 vertices, each split into two chains: members
# [0, split) and [split, 12) with split cycling 2..12 per block. CC
# labels only vertices that appear in edges, so halves of size 1
# (split == 11) contribute no component; the expected count below
# mirrors that. N2 is N rounded down to a multiple of 12 so no
# partial block.
N2 = N - (N % 12)
blocks = spark.range(N2).select(
    (F.col("id") / 12).cast("long").alias("blk"),
    (F.col("id") % 12).alias("pos"),
    F.col("id"),
)
split = (F.col("blk") % 11 + 2).cast("long")  # 2..12 per block
edges2 = (
    blocks.withColumn("split", split)
    .where(
        (F.col("pos") + 1 < 12)
        # no edge across the split boundary
        & ((F.col("pos") + 1) != F.col("split"))
    )
    .select(
        perm(F.col("id")).alias("doc_a"), perm(F.col("id") + 1).alias("doc_b")
    )
)
n_blocks = N2 // 12
# split <= 10 -> both halves have >= 2 members (2 components); split
# in {11, 12} -> only the first half is edge-connected (1 component).
expected_components = sum(
    2 if (12 - (b % 11 + 2)) >= 2 else 1 for b in range(11)
) * (n_blocks // 11) + sum(
    2 if (12 - (b % 11 + 2)) >= 2 else 1 for b in range(n_blocks % 11)
)
n_edges2 = edges2.count()
t0 = time.time()
labels2 = connected_components(edges2).cache()
n_vertices2 = labels2.count()
n_components2 = labels2.select("component").distinct().count()
t_corpus = time.time() - t0
print(
    f"CORPUS: {n_edges2} edges, {n_vertices2} labeled vertices, "
    f"{n_components2} components (expected {expected_components}), "
    f"{t_corpus:.1f}s, {n_edges2 / t_corpus:,.0f} edges/s"
)
assert n_components2 == expected_components
