"""In-loop compaction policy A/B: FULL vs SIZE-TIERED (VERDICT r12
item 1's measured half).

The r12 soak proved the full policy's growth term: every ~Nth batch
rewrites the whole index inside the loop's latency budget, so
per-batch wall drifts up with corpus size (3.64 -> 6.31 s over a 50-
batch soak at a toy 20k base; a 2,500 s in-loop stall extrapolated at
30M). This harness runs the SAME streaming loop twice against copies
of a real at-decade index (750k docs by default — the
.scratch/deltagate1000k artifact), identical fresh disjoint-vocabulary
deliveries, identical auto-compaction trigger; the only difference is
``compact_tier_max_docs``:

- leg FULL: ``auto_compact_segments=N`` (r12 behavior) — every policy
  firing rewrites base+appends;
- leg TIER: same trigger plus ``compact_tier_max_docs=M`` — in-loop
  merges touch only segments at or below M docs; the base waits for
  scheduled maintenance, which this harness runs (and times) once
  AFTER the stream as the honest line item the tier mode moves the
  cost into.

Deliveries are fresh and mutually disjoint, so every doc admits in
both legs regardless of compaction schedule — decision identity
reduces to equal kept counts, asserted. Reported: per-batch wall
stamps (the drift instrument), end-to-end stream wall, the offline
full-compaction wall, and the base segment's commit-marker mtime
invariance in the TIER leg.

Usage: python tools/validation/tier_compact_ab.py
           [n_batches] [docs_per_batch]
           [--auto-compact=5] [--tier-max-docs=100000] [--index=PATH]
"""

from __future__ import annotations

import json
import os
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
    compact_dedup_index,
)
from dionysus_rb_spark.session import get_spark  # noqa: E402
from dionysus_rb_spark.streaming.neardup_stream import (  # noqa: E402
    indexed_neardup_gate_sink,
)

BASE_IDX = REPO / ".scratch" / "deltagate1000k" / "dedup_index"


def main() -> None:
    nums = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_batches = int(nums[0]) if nums else 18
    per_batch = int(nums[1]) if len(nums) > 1 else 5000

    def flag(name: str, default: int) -> int:
        return next(
            (
                int(a.split("=", 1)[1])
                for a in sys.argv[1:]
                if a.startswith(f"--{name}=")
            ),
            default,
        )

    auto_compact = flag("auto-compact", 5)
    tier_max = flag("tier-max-docs", 100_000)
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
        raise SystemExit(
            f"no index at {base_idx} — run delivery_batching_curve.py "
            "1000000 --build-only first"
        )
    spark = get_spark("tier-compact-ab")
    root = REPO / ".scratch" / "tier_compact_ab"
    if root.exists():
        shutil.rmtree(root)
    root.mkdir(parents=True)

    src = str(root / "src")
    for b in range(n_batches):
        lo = b * per_batch
        spark.range(lo, lo + per_batch).select(
            (F.col("id") + 7_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"tz{c}"), F.col("id").cast("string"))
                    for c in "abcdefgh"
                ],
            ).alias("text"),
        ).coalesce(1).write.mode("append").parquet(src)

    results = {}
    for label, tier in (("full", None), ("tier", tier_max)):
        idx = str(root / f"idx_{label}")
        t_copy = time.time()
        shutil.copytree(base_idx, idx)
        print(f"{label}: index copied in {time.time() - t_copy:.0f}s")
        out = str(root / f"out_{label}")
        ckpt = str(root / f"ckpt_{label}")
        stamps: list[float] = []
        compact_drops = []
        prev_live = [0]

        def on_batch(
            admitted, rejected, decision, batch_id, _out=out, _idx=idx,
            _stamps=stamps, _drops=compact_drops, _prev=prev_live,
        ):
            decision.write.mode("append").parquet(_out)
            _stamps.append(time.time())
            n_live = len(_live_segments(_list_segments(spark, _idx), 1))
            if n_live < _prev[0]:
                _drops.append(int(batch_id))
            _prev[0] = n_live

        base_seg = [
            s for s in _list_segments(spark, idx) if s.count("-")
        ]
        biggest = max(
            base_seg,
            key=lambda s: (_list_segments(spark, idx)[s] or {}).get(
                "n_docs", 0
            ),
        )
        base_marker = os.path.join(idx, "segments", biggest, "_seg_commit.json")
        base_mtime = os.path.getmtime(base_marker)

        sink = indexed_neardup_gate_sink(
            idx,
            threshold=0.5,
            on_batch=on_batch,
            auto_compact_segments=auto_compact,
            compact_tier_max_docs=tier,
        )
        t0 = time.time()
        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        batch_secs = [
            round(b - a, 2) for a, b in zip(stamps, stamps[1:])
        ]
        maintenance_s = None
        if tier is not None:
            assert os.path.getmtime(base_marker) == base_mtime, (
                "tier leg rewrote the base segment in-loop"
            )
            t_m = time.time()
            compact_dedup_index(spark, idx)  # scheduled maintenance
            maintenance_s = round(time.time() - t_m, 1)
        dec = spark.read.parquet(out)
        kept = dec.filter(F.col("kept") == 1).count()
        total = dec.count()
        results[label] = {
            "wall_s": round(wall, 1),
            "kept": kept,
            "total": total,
            "batch_secs": batch_secs,
            "compaction_drops_at": compact_drops,
            "offline_full_compact_s": maintenance_s,
        }
        print(f"{label}: {wall:.1f}s, kept {kept}/{total}", flush=True)

    a, b = results["full"], results["tier"]
    assert a["kept"] == b["kept"] == a["total"] == b["total"], results
    assert a["total"] == n_batches * per_batch, results

    def tail_avg(xs, n=4):
        return round(sum(xs[-n:]) / min(n, len(xs)), 2)

    def head_avg(xs, n=4):
        xs = xs[1:]  # first diff pays warmup
        return round(sum(xs[:n]) / min(n, len(xs)), 2)

    print(
        json.dumps(
            {
                "n_batches": n_batches,
                "docs_per_batch": per_batch,
                "auto_compact": auto_compact,
                "tier_max_docs": tier_max,
                "index": str(base_idx),
                "full_wall_s": a["wall_s"],
                "tier_wall_s": b["wall_s"],
                "speedup_x": round(a["wall_s"] / b["wall_s"], 2),
                "full_batch_secs": a["batch_secs"],
                "tier_batch_secs": b["batch_secs"],
                "full_early_late": [
                    head_avg(a["batch_secs"]),
                    tail_avg(a["batch_secs"]),
                ],
                "tier_early_late": [
                    head_avg(b["batch_secs"]),
                    tail_avg(b["batch_secs"]),
                ],
                "tier_offline_full_compact_s": b["offline_full_compact_s"],
            }
        )
    )


if __name__ == "__main__":
    main()
