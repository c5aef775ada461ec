"""Model-vs-census recall reconciliation for the MinHash-LSH dedup
spine on the tiered corpus (VERDICT r8 item 5; SCALING.md r9).

The r9 corpus (corpus500k.py) makes within-group Jaccard an EXACT
rational constant per tier — (m-t-2)/(m+t-2) shared/union 3-shingles by
construction, with a 10,240-token vocabulary so accidental near-dups
are impossible. That turns the recall question from a forensic census
(r8's recall10m.py, which had to decompose +34/-3 after the fact) into
a falsifiable prediction:

1. *Model.* For each tier, an ideal-minhash Monte Carlo: shared-prefix
   and private-tail shingle minima are Beta(1, s)/Beta(1, t) draws per
   permutation (min of s iid uniforms); two members band-collide in a
   band iff BOTH take the shared minimum on all r rows; a group's
   survivors are the connected components of the union of per-band
   cliques. This is the exact distribution of the 1-(1-J^r)^b banding
   model INCLUDING within-group correlation (all pairs share one
   prefix), which the closed-form per-pair formula ignores.
2. *Census.* Run the pipeline's own minhash_lsh_dedup(threshold=0.5)
   over the corpus, union-find the verified pairs, count extra
   survivors per tier.
3. *Reconcile.* Observed per-tier misses must sit within the model's
   sampling band (4 sigma + a small slack for the non-ideal hash
   family: 16 linear permutations of one md5-32 value, not 16
   independent permutations). The J=0.45 tier must contribute ZERO
   merges (verify gate), and there must be ZERO accidental (cross-group
   or unique-doc) pairs at any tested size.

The recall KNOB this validates is documented in COVERAGE.md: at the
default (num_perm=16, b=4, r=4), a J=0.5 pair bands with probability
only ~0.23 per pair — and group recall is WORSE than the pair formula
suggests, because group-mates share one prefix whose minhash minima
correlate their signatures (the MC shows ~4.9 of 10 members isolated
per J=0.5 group vs ~1.0 the independent-pair formula predicts). 100 TB
users buy recall with permutations (e.g. 128 perms as b=32/r=4 lifts
J=0.5 per-pair banding to 0.87) without touching the pipeline shape,
since num_perm/bands are parameters of minhash_lsh_dedup and its
oracle alike.

Usage: python tools/validation/recall_model.py [n_docs] [mc_trials]
  n_docs defaults to 1e6 (the VERDICT r8 item 5 "1M re-run").
Foreground runs only (background execution is CPU-throttled in this
sandbox — SCALING.md round-7 methodology note).
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from dionysus_rb_spark.operators import minhash
from dionysus_rb_spark.session import get_spark
from tools.validation.corpus500k import (
    GROUP,
    N_DUP_GROUPS,
    N_TIERS,
    TIERS,
    build_corpus,
)

N_MEMBERS = N_DUP_GROUPS * GROUP
THRESHOLD = 0.5


def _merge_masks(masks: list[int]) -> list[int]:
    """Union overlapping bitmasks (each a band clique over 10 members)."""
    comps: list[int] = []
    for mask in masks:
        live = mask
        rest = []
        for c in comps:
            if c & live:
                live |= c
            else:
                rest.append(c)
        rest.append(live)
        comps = rest
    return comps


def simulate_tier(
    m: int, t: int, trials: int, rng: np.random.Generator
) -> tuple[float, float]:
    """(mean, variance) of EXTRA survivors per group under ideal
    minhash: 16 perms as 4 bands x 4 rows over a group of 10 members
    with s = m-t-2 shared and t private shingles each."""
    s = m - t - 2
    bands, rows = minhash.BANDS, minhash.ROWS_PER_BAND
    nperm = bands * rows
    # min of k iid U(0,1) ~ Beta(1, k); continuous, so ties between
    # distinct private minima have probability zero and signature
    # equality reduces to "both members took the shared minimum"
    shared = rng.beta(1.0, s, size=(trials, nperm))
    priv = rng.beta(1.0, t, size=(trials, nperm, GROUP))
    took_shared = priv > shared[:, :, None]  # (T, perm, member)
    # member is band-clique-eligible iff it took the shared min on ALL
    # rows of the band; every eligible pair in a band collides
    cliques = took_shared.reshape(trials, bands, rows, GROUP).all(axis=2)
    extras = np.empty(trials, dtype=np.int64)
    weights = 1 << np.arange(GROUP)
    masks_all = (cliques * weights).sum(axis=2)  # (T, bands) int bitmasks
    for i in range(trials):
        masks = [int(x) for x in masks_all[i] if int(x).bit_count() >= 2]
        comps = _merge_masks(masks)
        covered = 0
        for c in comps:
            covered |= c
        n_components = (GROUP - covered.bit_count()) + len(comps)
        extras[i] = n_components - 1
    return float(extras.mean()), float(extras.var())


def main() -> None:
    n_docs = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    trials = int(float(sys.argv[2])) if len(sys.argv) > 2 else 40_000
    out = REPO / ".scratch" / f"recallmodel{n_docs // 1000}k"
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark()
    build_corpus(spark, out, n_docs)
    docs = spark.read.parquet(str(out / "documents.parquet"))

    # -- census: the pipeline's own verified pairs
    t0 = time.time()
    pairs = minhash.minhash_lsh_dedup(
        docs, "text", "doc_id", k=3, threshold=THRESHOLD
    ).select("doc_a", "doc_b")
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    t_pairs = time.time() - t0
    print(f"verified pairs: {len(edges):,} ({t_pairs:.0f}s)")

    accidental = [
        (a, b)
        for a, b in edges
        if a >= N_MEMBERS or b >= N_MEMBERS or a // GROUP != b // GROUP
    ]
    assert not accidental, f"accidental pairs must vanish: {accidental[:10]}"
    control = [(a, b) for a, b in edges if (a // GROUP) % N_TIERS == 0]
    assert not control, (
        f"J=0.45 tier must never pass the verify gate: {control[:10]}"
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    comp_by_group: dict[int, set[int]] = defaultdict(set)
    for member in range(min(N_MEMBERS, n_docs)):
        comp_by_group[member // GROUP].add(find(member))

    observed = [0] * N_TIERS
    groups_per_tier = [0] * N_TIERS
    n_groups = min(N_MEMBERS, n_docs) // GROUP
    for g in range(n_groups):
        tier = g % N_TIERS
        groups_per_tier[tier] += 1
        observed[tier] += len(comp_by_group[g]) - 1

    # -- model: ideal-minhash Monte Carlo per mergeable tier
    rng = np.random.default_rng(424243)
    print(f"\n{'tier':>6} {'J':>6} {'groups':>7} {'observed':>9} "
          f"{'model':>9} {'sigma':>7}")
    total_obs, total_model, total_var = 0, 0.0, 0.0
    for tier, (j, m, t) in enumerate(TIERS):
        if tier == 0:
            print(f"{tier:>6} {j:>6} {groups_per_tier[tier]:>7} "
                  f"{observed[tier]:>9} {'gate':>9} {'—':>7}  (never merges)")
            continue
        mean, var = simulate_tier(m, t, trials, rng)
        model = groups_per_tier[tier] * mean
        sigma = (groups_per_tier[tier] * var) ** 0.5
        total_obs += observed[tier]
        total_model += model
        total_var += groups_per_tier[tier] * var
        print(f"{tier:>6} {j:>6} {groups_per_tier[tier]:>7} "
              f"{observed[tier]:>9} {model:>9.1f} {sigma:>7.1f}")
        assert abs(observed[tier] - model) <= 4 * max(sigma, 1.0) + 10, (
            tier,
            observed[tier],
            model,
            sigma,
        )
    sigma_total = total_var**0.5
    print(f"{'TOTAL':>6} {'':>6} {sum(groups_per_tier[1:]):>7} "
          f"{total_obs:>9} {total_model:>9.1f} {sigma_total:>7.1f}")
    assert abs(total_obs - total_model) <= 4 * sigma_total + 10

    merged = sum(
        GROUP - len(comp_by_group[g])
        for g in range(n_groups)
    )
    kept = n_docs - merged
    floor = n_docs - sum(
        (GROUP - 1) * groups_per_tier[tier] for tier in range(1, N_TIERS)
    )
    print(f"\nkept = {kept:,} = floor {floor:,} + {kept - floor} "
          f"banding-miss survivors (model {total_model:.1f} "
          f"± {sigma_total:.1f}); 0 accidental, 0 sub-threshold merges")
    spark.stop()


if __name__ == "__main__":
    main()
