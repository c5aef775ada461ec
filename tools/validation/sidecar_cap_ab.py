"""Width-sidecar bucket cap vs count-window cap — interleaved A/B
(VERDICT r10 item 2's done criterion).

The indexed gate's ``max_bucket`` cap used to run a count window over
EVERY live band row per delivery: when AQE broadcasts the delivery's
band rows (the common small-delivery regime the capacity envelope
targets), that window was the gate's ONLY corpus-wide exchange — the
index side of the band join itself needs none. r11 amortizes the width
computation into the index artifact (per-segment ``band_widths``
sidecars, summed at gate time and anti-joined), so the broadcast-delta
gate sheds its corpus-side exchange entirely.

This harness measures it honestly per the r10 methodology: ONE session,
interleaved A/B legs (sidecar, window, sidecar, window, ...) over the
SAME persisted index and the SAME 250k-doc delivery (--mod=40 of the
tiered 10M corpus), decisions census-checked identical each leg, and
each leg's executed plan inspected — the sidecar leg must carry no
Window node and fewer shuffle exchanges.

Run the gate legs at the DEFAULT driver heap (the capacity-envelope
conditions); the index build (a corpus-sized one-time job) wants
SPARK_GRAFT_DRIVER_MEM=48g — run it first via delta_gate_scale.py
--indexed-only or build_dedup_index directly, then re-invoke this
harness at default heap with the index on disk.

Usage: python tools/validation/sidecar_cap_ab.py [n_docs] [--mod=40]
       [--legs=3]
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from dionysus_rb_spark.operators.minhash import (  # noqa: E402
    _open_dedup_index,
    build_dedup_index,
    delta_dedup_gate_indexed,
)
from dionysus_rb_spark.session import get_spark  # noqa: E402
from tools.validation.corpus500k import build_corpus  # noqa: E402

_SHUFFLE = re.compile(
    r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)"
)


def main() -> None:
    nums = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(float(nums[0])) if nums else 10_000_000
    mod = next(
        (int(a.split("=", 1)[1]) for a in sys.argv[1:] if a.startswith("--mod=")),
        40,
    )
    legs = next(
        (int(a.split("=", 1)[1]) for a in sys.argv[1:] if a.startswith("--legs=")),
        3,
    )
    out = REPO / ".scratch" / f"deltagate{n_docs // 1000}k"
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark()
    build_corpus(spark, out, n_docs)
    docs = spark.read.parquet(str(out / "documents.parquet"))
    delta = docs.filter(
        (F.col("doc_id") % 4 == 0) & (F.col("doc_id") % mod == 0)
    )
    index = docs.filter(F.col("doc_id") % 4 != 0)
    n_delta = delta.count()

    idx = str(out / "dedup_index")
    has_sidecars = False
    if (Path(idx) / "_dedup_index_manifest.json").exists():
        try:
            has_sidecars = _open_dedup_index(spark, idx)[4] is not None
        except ValueError:
            has_sidecars = False
    if not has_sidecars:
        print("index missing or pre-sidecar: rebuilding (corpus-sized job)")
        t0 = time.time()
        build_dedup_index(
            index, idx, "text", "doc_id", k=3, reclaim_grace=0.0
        )
        print(f"build: {time.time() - t0:.1f}s")

    def leg(use_sidecars: bool):
        t0 = time.time()
        d = delta_dedup_gate_indexed(
            delta,
            idx,
            "text",
            "doc_id",
            threshold=0.5,
            use_width_sidecars=use_sidecars,
        )
        census = sorted(
            map(
                tuple,
                d.groupBy("kept")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("n_dup_matches").alias("matches"),
                )
                .collect(),
            )
        )
        dt = time.time() - t0
        plan = d.df._jdf.queryExecution().executedPlan().toString()
        d.release()
        return dt, census, len(_SHUFFLE.findall(plan)), "Window" in plan

    results = {"sidecar": [], "window": []}
    baseline = None
    for _ in range(legs):
        for name, use in (("sidecar", True), ("window", False)):
            dt, census, n_ex, has_window = leg(use)
            results[name].append((dt, n_ex, has_window))
            if baseline is None:
                baseline = census
            assert census == baseline, f"{name} leg census diverged"
    side, wind = results["sidecar"], results["window"]
    assert not any(w for _, _, w in side), "sidecar leg ran a Window"
    assert all(w for _, _, w in wind), "window leg lost its Window?"
    print(
        f"sidecar-cap A/B at {n_docs:,} docs, {n_delta:,}-doc delivery, "
        f"{legs} interleaved legs each:\n"
        f"  sidecar: {[f'{t:.1f}' for t, _, _ in side]} s, "
        f"exchanges {side[0][1]}\n"
        f"  window:  {[f'{t:.1f}' for t, _, _ in wind]} s, "
        f"exchanges {wind[0][1]}\n"
        f"  min ratio window/sidecar: "
        f"{min(t for t, _, _ in wind) / min(t for t, _, _ in side):.2f}x; "
        f"decision censuses identical across all legs: {baseline}"
    )


if __name__ == "__main__":
    main()
