"""Dedup-index maintenance economics: fragmentation vs compaction
(SCALING.md r10 — VERDICT r9 item 2's done-criterion).

Builds the tiered corpus (corpus500k.build_corpus), lands the index
side (75% of docs) as ONE base segment plus N append segments (the
per-delivery production cadence), and measures the 25%-delta gate
against the FRAGMENTED index, then against the COMPACTED index, plus a
fresh single-segment control build. Asserts the decision census is
identical across all three shapes (fragmentation is an I/O state,
never a semantic) and reports parquet file counts before/after
compaction.

Usage: python tools/validation/index_maintenance.py [n_docs] [n_appends]
Foreground runs only (background execution is CPU-throttled in this
sandbox — SCALING.md round-7 methodology note).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from dionysus_rb_spark.operators.minhash import (
    build_dedup_index,
    compact_dedup_index,
    delta_dedup_gate_indexed,
)
from dionysus_rb_spark.session import get_spark
from tools.validation.corpus500k import build_corpus


def _parquet_files(root: str) -> int:
    n = 0
    for _dirpath, _dirs, files in os.walk(root):
        n += sum(f.endswith(".parquet") for f in files)
    return n


def _segments(root: str) -> int:
    seg = os.path.join(root, "segments")
    return len(os.listdir(seg)) if os.path.isdir(seg) else 0


def main() -> None:
    n_docs = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = REPO / ".scratch" / f"idxmaint{n_docs // 1000}k"
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark()
    build_corpus(spark, out, n_docs)
    docs = spark.read.parquet(str(out / "documents.parquet"))
    delta = docs.filter(F.col("doc_id") % 4 == 0)
    index_docs = docs.filter(F.col("doc_id") % 4 != 0)

    def census(dec):
        rows = (
            dec.groupBy("kept").agg(F.count("*").alias("n")).collect()
        )
        dec.release()
        return tuple(sorted((r["kept"], r["n"]) for r in rows))

    def timed_gate(idx):
        best, got = None, None
        for _ in range(3):
            t0 = time.time()
            got = census(
                delta_dedup_gate_indexed(delta, idx, threshold=0.5)
            )
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best, got

    # fragmented: base segment (first half of the index side by id
    # hash) + n_appends delivery-sized appends
    frag = str(out / "index_fragmented")
    splits = index_docs.withColumn(
        "__b", F.pmod(F.xxhash64("doc_id"), F.lit(2 * n_appends))
    )
    t0 = time.time()
    build_dedup_index(
        splits.filter(F.col("__b") < n_appends).drop("__b"), frag, k=3
    )
    for j in range(n_appends):
        build_dedup_index(
            splits.filter(F.col("__b") == n_appends + j).drop("__b"),
            frag,
            k=3,
            mode="append",
        )
    t_land = time.time() - t0
    files_before = _parquet_files(frag)
    segs_before = _segments(frag)
    t_frag, c_frag = timed_gate(frag)

    t0 = time.time()
    compact_dedup_index(spark, frag, reclaim_grace=0.0)  # immediate hygiene measurement
    t_compact = time.time() - t0
    files_after = _parquet_files(frag)
    segs_after = _segments(frag)
    t_comp, c_comp = timed_gate(frag)
    assert c_comp == c_frag, "compaction changed gate decisions"

    # single-segment control: one fresh overwrite build of the union
    single = str(out / "index_single")
    build_dedup_index(index_docs, single, k=3)
    t_single, c_single = timed_gate(single)
    assert c_single == c_frag, "fragmentation changed gate decisions"

    print(
        f"index maintenance at {n_docs:,} docs "
        f"({n_appends} appends over a half-corpus base):\n"
        f"  land base+appends: {t_land:.1f}s -> {segs_before} segments, "
        f"{files_before} parquet files\n"
        f"  gate vs fragmented: {t_frag:.1f}s\n"
        f"  compact: {t_compact:.1f}s -> {segs_after} segment(s), "
        f"{files_after} files\n"
        f"  gate vs compacted:  {t_comp:.1f}s\n"
        f"  gate vs fresh single-segment control: {t_single:.1f}s\n"
        f"  decision census identical across all shapes: {c_frag}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
