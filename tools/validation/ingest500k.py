"""JSONL ingestion at 500k docs: land-vs-cache materialization A/B
(SCALING.md round 8; closes ADVICE r7 "split_corrupt pins the raw
input" with a measurement behind the chosen default).

Renders the realistic 500k corpus (corpus500k.build_corpus) to JSON
lines with ~1% deterministically injected anomalies (doc_id % 97 == 0;
shape by doc_id % 3: truncated JSON, type-mismatched doc_id, garbage
line), then ingests it through read_jsonl -> split_corrupt under BOTH
materialization policies and reports, per mode:

* wall time and docs/s for the full split (clean.count + dead.count),
  with exact accounting asserted (clean + dead == written lines, dead
  == injected count);
* the memory footprint the mode leaves behind: executor storage bytes
  pinned (getRDDStorageInfo) for mode="cache" — before and after
  release_split — vs the on-disk landing-directory size for
  mode="land" (reclaimed at interpreter exit);
* three back-to-back re-ingests proving repeated calls accumulate
  nothing under "land" (the session-lifetime-accumulation failure mode
  ADVICE r7 flagged on the old always-cache design);
* steady-state DISK under a released ingest loop (VERDICT r8 item 3):
  with SplitResult.release() per batch the landing root returns to its
  pre-loop size after every iteration, vs one landing per batch
  (~55 MiB each at 500k) accumulating without release.

Foreground runs only (background execution is CPU-throttled in this
sandbox — SCALING.md round-7 methodology note).

Usage: python tools/validation/ingest500k.py [n_docs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from dionysus_rb_spark.session import get_spark
from dionysus_rb_spark.sources.text_ingest import (
    read_jsonl,
    release_split,
    split_corrupt,
)
from tools.validation.corpus500k import build_corpus

ANOMALY_MOD = 97  # ~1.03% of lines are dead-letter candidates


def render_jsonl(spark, corpus_dir: Path, out: Path) -> int:
    """documents.parquet -> JSON lines with injected anomalies.
    Returns the number of anomalous lines written."""
    docs = spark.read.parquet(str(corpus_dir / "documents.parquet"))
    line = F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars"))
    hit = F.pmod(F.col("doc_id"), F.lit(ANOMALY_MOD)) == 0
    shape = F.pmod(F.col("doc_id"), F.lit(3))
    corrupted = (
        F.when(shape == 0, F.substring(line, 1, 40))  # truncated JSON
        .when(  # doc_id arrives as a non-numeric string -> type mismatch
            shape == 1,
            F.regexp_replace(line, '^\\{"doc_id":\\d+', '{"doc_id":"oops"'),
        )
        .otherwise(F.concat(F.lit("%%not json%% "), F.col("doc_id")))
    )
    docs.select(
        F.when(hit, corrupted).otherwise(line).alias("value")
    ).write.mode("overwrite").text(str(out))
    return docs.filter(hit).count()


def pinned_storage_bytes(spark) -> int:
    """Bytes currently pinned in executor storage memory (cached RDDs)."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return sum(i.memSize() + i.diskSize() for i in infos)


def dir_bytes(path: Path) -> int:
    return sum(f.stat().st_size for f in path.rglob("*") if f.is_file())


def run_mode(spark, jsonl_dir: str, mode: str, n: int, n_bad: int):
    t0 = time.time()
    result = split_corrupt(
        read_jsonl(spark, jsonl_dir, table="documents"), mode=mode
    )
    nc, nd = result.clean.count(), result.dead.count()
    dt = time.time() - t0
    assert nc + nd == n, (nc, nd, n)
    assert nd == n_bad, (nd, n_bad)
    print(f"mode={mode}: split {n:,} lines in {dt:.1f}s "
          f"({n / dt:,.0f} docs/s), clean={nc:,} dead={nd:,}")
    return result, dt


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 500_000
    scratch = REPO / ".scratch" / "ingest500k"
    scratch.mkdir(parents=True, exist_ok=True)
    spark = get_spark()
    corpus_dir = scratch / "corpus"
    build_corpus(spark, corpus_dir, n)
    jsonl_dir = scratch / "jsonl"
    n_bad = render_jsonl(spark, corpus_dir, jsonl_dir)
    print(f"rendered {n:,} JSON lines ({n_bad:,} anomalous, "
          f"{dir_bytes(jsonl_dir) / 2**20:,.0f} MiB) -> {jsonl_dir}")

    # -- mode="cache": measure what stays pinned, then release it
    result, _ = run_mode(spark, str(jsonl_dir), "cache", n, n_bad)
    pinned = pinned_storage_bytes(spark)
    released = release_split(result)
    # unpersist is async-ish; poll briefly for the storage drop
    for _ in range(20):
        if pinned_storage_bytes(spark) == 0:
            break
        time.sleep(0.5)
    after = pinned_storage_bytes(spark)
    print(f"mode=cache: {pinned / 2**20:,.0f} MiB pinned in executor "
          f"storage after the split; release_split -> {released}, "
          f"{after / 2**20:,.0f} MiB pinned after")
    assert released and after == 0

    # -- mode="land" (default): nothing pinned, footprint is disk-only.
    # Un-released batches accumulate one landing each...
    from dionysus_rb_spark.operators import lineage

    root = Path(lineage._root_dir(spark))
    unreleased = []
    for _ in range(3):
        result, dt = run_mode(spark, str(jsonl_dir), "land", n, n_bad)
        assert pinned_storage_bytes(spark) == 0
        unreleased.append(result)
    accumulated = dir_bytes(root)
    print(f"mode=land (no release): 0 MiB pinned; landing root holds "
          f"{accumulated / 2**20:,.0f} MiB on disk across 3 un-released "
          f"ingests (reclaimed at exit)")
    for r in unreleased:
        assert r.release()
    floor = dir_bytes(root)

    # ...while a RELEASED loop holds O(one batch) at steady state
    # (VERDICT r8 item 3): the root returns to its pre-loop size after
    # every iteration.
    peak_resident = 0
    for _ in range(3):
        result, dt = run_mode(spark, str(jsonl_dir), "land", n, n_bad)
        peak_resident = max(peak_resident, dir_bytes(root) - floor)
        assert result.release()
        assert dir_bytes(root) == floor, "release left landing files behind"
    per_batch = accumulated / 3
    print(f"mode=land (released loop): steady-state landing root = "
          f"{floor / 2**20:,.0f} MiB between batches "
          f"(peak {peak_resident / 2**20:,.0f} MiB in flight, "
          f"~{per_batch / 2**20:,.0f} MiB per un-released batch avoided)")
    spark.stop()


if __name__ == "__main__":
    main()
