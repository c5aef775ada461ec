"""Single-merge cost at the 10M decade: FULL vs TIERED (VERDICT r12
item 1's extrapolation, replaced with a measured point).

The tier A/B at 750k measured the in-loop spike the tier policy
removes (~11 s per full-policy firing). This probe measures the SAME
two merge operations once each at the next decade, on a scratch COPY
of the 7.5M-doc index artifact:

1. append a delivery-sized batch (fresh disjoint-vocab docs) twice,
   so the index holds base + 2 small tagged segments;
2. time ``compact_dedup_index(tier_max_docs=...)`` — the in-loop
   merge the streaming policy runs (merges ONLY the two appends);
3. time ``compact_dedup_index()`` — the full merge the old policy ran
   inside the loop (rewrites base + everything), now scheduled
   maintenance.

The delta between those two numbers is the per-firing stall that
tiered compaction removes from the loop's latency budget at 10M; the
full number is what scheduled maintenance pays instead, off the
latency path. Gate decisions are structurally unaffected (subset
merges; pinned by the crash-enum/oracle suites) — this probe measures
cost only, and asserts segment structure (base survives the tier
merge; the full merge converges to 1 live segment).

Needs SPARK_GRAFT_DRIVER_MEM=48g (index-maintenance heap at 10M) and
~10 GB scratch for the copy; the source artifact is never touched.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/validation/compact_decade_probe.py
           [docs_per_append=10000] [--index=PATH] [--tier-max-docs=100000]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from dionysus_rb_spark.operators.minhash import (  # noqa: E402
    _list_segments,
    _live_segments,
    _read_index_manifest,
    build_dedup_index,
    compact_dedup_index,
)
from dionysus_rb_spark.session import get_spark  # noqa: E402

BASE_IDX = REPO / ".scratch" / "deltagate10000k" / "dedup_index"


def main() -> None:
    nums = [a for a in sys.argv[1:] if not a.startswith("--")]
    per_append = int(nums[0]) if nums else 10_000
    tier_max = next(
        (
            int(a.split("=", 1)[1])
            for a in sys.argv[1:]
            if a.startswith("--tier-max-docs=")
        ),
        100_000,
    )
    base_idx = Path(
        next(
            (
                a.split("=", 1)[1]
                for a in sys.argv[1:]
                if a.startswith("--index=")
            ),
            str(BASE_IDX),
        )
    )
    if not (base_idx / "_dedup_index_manifest.json").exists():
        raise SystemExit(f"no index at {base_idx}")
    spark = get_spark("compact-decade-probe")
    root = REPO / ".scratch" / "compact_decade_probe"
    if root.exists():
        shutil.rmtree(root)
    root.mkdir(parents=True)
    idx = str(root / "idx")
    t = time.time()
    shutil.copytree(base_idx, idx)
    print(f"index copied in {time.time() - t:.0f}s", flush=True)

    manifest = _read_index_manifest(spark, idx)
    epoch = manifest["epoch"]

    def fresh(tag: str, lo: int):
        return spark.range(lo, lo + per_append).select(
            (F.col("id") + 8_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"pz{tag}{c}"), F.col("id").cast("string"))
                    for c in "abcdefgh"
                ],
            ).alias("text"),
        )

    t = time.time()
    for i, tag in enumerate(("pa", "pb")):
        build_dedup_index(
            fresh(tag, i * per_append),
            idx,
            k=manifest["k"],
            num_perm=manifest["num_perm"],
            bands=manifest["bands"],
            seed=manifest["seed"],
            mode="append",
            segment_tag=tag,
        )
    append_s = round(time.time() - t, 1)
    segs = _list_segments(spark, idx)
    live0 = _live_segments(segs, epoch)
    base_segs = {
        s
        for s in live0
        if ((segs[s] or {}).get("n_docs") or 0) > tier_max
    }
    print(f"appends landed in {append_s}s; live={len(live0)}", flush=True)

    t = time.time()
    compact_dedup_index(spark, idx, tier_max_docs=tier_max)
    tier_s = round(time.time() - t, 1)
    live1 = _live_segments(_list_segments(spark, idx), epoch)
    assert base_segs <= set(live1), "tier merge touched the base"
    assert len(live1) == len(base_segs) + 1

    t = time.time()
    compact_dedup_index(spark, idx)
    full_s = round(time.time() - t, 1)
    live2 = _live_segments(_list_segments(spark, idx), epoch)
    assert len(live2) == 1

    print(
        json.dumps(
            {
                "index": str(base_idx),
                "docs_per_append": per_append,
                "tier_max_docs": tier_max,
                "append_two_batches_s": append_s,
                "tier_merge_s": tier_s,
                "full_merge_s": full_s,
                "in_loop_stall_removed_x": round(full_s / max(tier_s, 0.1), 1),
            }
        ),
        flush=True,
    )
    shutil.rmtree(root)


if __name__ == "__main__":
    main()
