"""Streaming accumulate_batches wall-clock A/B (VERDICT r11 item 3's
streaming half — the batch-form amortization curve is
delivery_batching_curve.py; this measures the same lever INSIDE the
checkpointed loop, staging overhead included).

Two identical availableNow streams of ``n_batches`` one-file
micro-batches (disjoint-vocabulary fresh docs — no dups, so decision
sets are trivially identical across schedules and the gate's cost is
pure scan+join) run against two COPIES of the same pre-built index:
leg A gates every micro-batch (``accumulate_batches=1``), leg B stages
and gates every ``--accumulate=N`` batches over the staged union. Both
legs append their admitted docs (equal index growth), so the only
difference is the gate schedule: A pays n_batches corpus scans, B pays
n_batches/N. Decision counts are asserted equal; the reported ratio is
end-to-end stream wall time, which includes B's staging writes — the
honest overhead the curve harness does not pay.

Uses the 1M-corpus index that delivery_batching_curve/--build-only or
bucketed_gate_ab leaves at .scratch/deltagate1000k/dedup_index (750k
docs; build one with
``python tools/validation/delivery_batching_curve.py 1000000 --build-only``).

``--index=PATH`` points both legs at another pre-built index;
``--no-append`` runs the gates read-only (``append_admitted=False``) so
the two legs share ONE index with no copytree — the right mode for
at-decade indexes (9 GiB at 10M) where the measurement target is the
gate schedule, not the append (fresh disjoint docs admit either way,
so decisions are schedule-independent in both modes).

``--only-accumulated`` runs just leg B (no A/B ratio): the mode for
single-rung capacity checks — e.g. the r13 verification that a 1.25M-
doc accumulated delivery passes at the 8 g default driver heap with
the loop's auto maxPartitionBytes scaling engaged (VERDICT r12
item 5), where the per-batch leg's wall is not the question.

Usage: python tools/validation/stream_accumulate_ab.py
           [n_batches] [docs_per_batch] [--accumulate=5]
           [--index=PATH] [--no-append] [--only-accumulated]
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

from dionysus_rb_spark.session import get_spark  # noqa: E402
from dionysus_rb_spark.streaming.neardup_stream import (  # noqa: E402
    indexed_neardup_gate_sink,
)

BASE_IDX = REPO / ".scratch" / "deltagate1000k" / "dedup_index"


def main() -> None:
    nums = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_batches = int(nums[0]) if nums else 20
    per_batch = int(nums[1]) if len(nums) > 1 else 5000
    accumulate = next(
        (
            int(a.split("=", 1)[1])
            for a in sys.argv[1:]
            if a.startswith("--accumulate=")
        ),
        5,
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
    no_append = "--no-append" in sys.argv
    if accumulate < 1 or n_batches % accumulate != 0:
        # an availableNow stream ends after the last file: a trailing
        # partial group (< accumulate staged batches) is never gated,
        # so leg B's totals would read short and the equality assert
        # below would fail with a misleading message — reject the
        # shape up front instead (ADVICE r12 item 3)
        raise SystemExit(
            f"n_batches ({n_batches}) must be a positive multiple of "
            f"--accumulate ({accumulate}): the availableNow stream "
            "never gates a trailing partial group, so leg B would end "
            "with staged-but-ungated batches and the decision-equality "
            "check would fail for harness reasons, not engine reasons"
        )
    if not (base_idx / "_dedup_index_manifest.json").exists():
        raise SystemExit(
            f"no index at {base_idx} — run delivery_batching_curve.py "
            "1000000 --build-only first"
        )
    spark = get_spark("stream-accumulate-ab")
    root = REPO / ".scratch" / "stream_accumulate_ab"
    if root.exists():
        shutil.rmtree(root)
    root.mkdir(parents=True)

    # disjoint fresh vocabulary (soak-style): zero shingle overlap with
    # the corpus500k vocab and between docs -> every doc admits, the
    # gate pays its full scan+join either way
    src = str(root / "src")
    for b in range(n_batches):
        lo = b * per_batch
        spark.range(lo, lo + per_batch).select(
            (F.col("id") + 5_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"fz{c}"), F.col("id").cast("string"))
                    for c in "abcdefgh"
                ],
            ).alias("text"),
        ).coalesce(1).write.mode("append").parquet(src)

    only_accumulated = "--only-accumulated" in sys.argv
    legs = (("per_batch", 1), (f"every_{accumulate}", accumulate))
    if only_accumulated:
        legs = legs[1:]
    results = {}
    for label, acc in legs:
        if no_append:
            idx = str(base_idx)  # read-only gates can share one index
        else:
            idx = str(root / f"idx_{label}")
            shutil.copytree(base_idx, idx)
        out = str(root / f"out_{label}")
        ckpt = str(root / f"ckpt_{label}")
        staging = str(root / f"staging_{label}")

        def on_batch(admitted, rejected, decision, batch_id, _out=out):
            decision.write.mode("append").parquet(_out)

        sink = indexed_neardup_gate_sink(
            idx,
            threshold=0.5,
            on_batch=on_batch,
            accumulate_batches=acc,
            staging_path=staging if acc > 1 else None,
            append_admitted=not no_append,
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
        dec = spark.read.parquet(out)
        kept = dec.filter(F.col("kept") == 1).count()
        total = dec.count()
        results[label] = {"wall_s": round(wall, 1), "kept": kept, "total": total}
        print(f"{label}: {wall:.1f}s, {kept}/{total} kept", flush=True)

    b = results[f"every_{accumulate}"]
    assert b["kept"] == b["total"] == n_batches * per_batch, results
    summary = {
        "n_batches": n_batches,
        "docs_per_batch": per_batch,
        "accumulate": accumulate,
        "index": str(base_idx),
        "append": not no_append,
        "accumulated_wall_s": b["wall_s"],
    }
    if not only_accumulated:
        a = results["per_batch"]
        assert a["kept"] == a["total"] == n_batches * per_batch, results
        summary |= {
            "per_batch_wall_s": a["wall_s"],
            "speedup_x": round(a["wall_s"] / b["wall_s"], 2),
        }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
