"""Bucketed-table index vs plain-parquet index — interleaved A/B in
the delivery-too-big-to-broadcast regime (VERDICT r10 item 3's done
criterion).

The plain-parquet index confines the gate's per-delivery cost to one
keyed shuffle per side; when the delivery is small, AQE broadcasts it
and the corpus side never shuffles at all. The regime the bucketed
tables exist for is the opposite: a delivery too big to broadcast
(here 2.5M docs against a 7.5M corpus — the full doc_id % 4 split of
the tiered 10M corpus), where the parquet gate must exchange corpus-
side band rows to meet the join and the bucketed tables instead
co-locate both joins on their bucket spec.

Method per the r10 rule: ONE session, both artifacts built first (the
parquet index and the bucketed tables — their build costs are also
reported, same-session), then interleaved gate legs (bucketed,
parquet, bucketed, parquet, ...), decision censuses asserted identical
on every leg. Run at SPARK_GRAFT_DRIVER_MEM=48g — the 2.5M-delta gate
is the corpus-sized job (r10 capacity envelope; the delivery-sized
regime at the default heap is the OTHER measured path).

Usage: python tools/validation/bucketed_gate_ab.py [n_docs] [--legs=2]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from dionysus_rb_spark.operators.minhash import (  # noqa: E402
    _open_dedup_index,
    build_dedup_index,
    build_dedup_index_bucketed,
    delta_dedup_gate_bucketed,
    delta_dedup_gate_indexed,
)
from dionysus_rb_spark.session import get_spark  # noqa: E402
from tools.validation.corpus500k import build_corpus  # noqa: E402


def main() -> None:
    nums = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(float(nums[0])) if nums else 10_000_000
    legs = next(
        (int(a.split("=", 1)[1]) for a in sys.argv[1:] if a.startswith("--legs=")),
        2,
    )
    out = REPO / ".scratch" / f"deltagate{n_docs // 1000}k"
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark()
    build_corpus(spark, out, n_docs)
    docs = spark.read.parquet(str(out / "documents.parquet"))
    delta = docs.filter(F.col("doc_id") % 4 == 0)
    index = docs.filter(F.col("doc_id") % 4 != 0)
    n_delta = delta.count()

    idx = str(out / "dedup_index")
    t_pq = 0.0
    reusable = False
    if (Path(idx) / "_dedup_index_manifest.json").exists():
        try:
            reusable = _open_dedup_index(spark, idx)[4] is not None
        except ValueError:
            reusable = False
    if not reusable:
        t0 = time.time()
        build_dedup_index(index, idx, "text", "doc_id", k=3, reclaim_grace=0.0)
        t_pq = time.time() - t0
    t0 = time.time()
    build_dedup_index_bucketed(index, "ab_bkt_gate", k=3, n_buckets=64)
    t_bkt = time.time() - t0

    def census(d):
        rows = sorted(
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
        d.release()
        return rows

    results = {"bucketed": [], "parquet": []}
    baseline = None
    for _ in range(legs):
        for name in ("bucketed", "parquet"):
            t0 = time.time()
            if name == "bucketed":
                d = delta_dedup_gate_bucketed(
                    delta, "ab_bkt_gate", "text", "doc_id", threshold=0.5
                )
            else:
                d = delta_dedup_gate_indexed(
                    delta, idx, "text", "doc_id", threshold=0.5
                )
            c = census(d)
            results[name].append(time.time() - t0)
            if baseline is None:
                baseline = c
            assert c == baseline, f"{name} leg census diverged: {c}"
    bkt, pq = results["bucketed"], results["parquet"]
    print(
        f"bucketed-gate A/B at {n_docs:,} docs, {n_delta:,}-doc delivery "
        f"(too big to broadcast), {legs} interleaved legs each:\n"
        f"  builds (same session): parquet "
        f"{'reused' if reusable else f'{t_pq:.1f}s'}, "
        f"bucketed tables {t_bkt:.1f}s\n"
        f"  bucketed gate: {[f'{t:.1f}' for t in bkt]} s\n"
        f"  parquet gate:  {[f'{t:.1f}' for t in pq]} s\n"
        f"  min ratio parquet/bucketed: {min(pq) / min(bkt):.2f}x; "
        f"decision censuses identical: {baseline}"
    )


if __name__ == "__main__":
    main()
