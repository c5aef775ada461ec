"""Sharded corpus sink at 500k docs (SCALING.md).

Writes the realistic 500k corpus (corpus500k.build_corpus) through
sources/corpus_sink.write_corpus_shards with production-shaped knobs
(lang-partitioned, 32 shards, 25k-row file bound, doc_id-sorted), then
audits the landed layout:

* write wall-time and docs/s;
* file count, max rows per file (must respect the bound), and the
  per-lang directory spread;
* a pruned re-read (one lang + doc_id range) proving PartitionFilters
  prune directories and the row-key predicate reaches the scan;
* determinism: a second write from a hostile 13-way upstream
  repartition must land identical per-file row sets (the sink-side
  layout-invariance statement at 500k scale).

Foreground runs only (background execution is CPU-throttled in this
sandbox — SCALING.md round-7 methodology note).

Usage: python tools/validation/sink500k.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from dionysus_rb_spark.session import get_spark
from dionysus_rb_spark.sources.corpus_sink import read_corpus, write_corpus_shards
from tools.validation.corpus500k import build_corpus

TARGET_ROWS = 25_000
SHARDS = 32


def main() -> None:
    scratch = REPO / ".scratch" / "sink500k"
    scratch.mkdir(parents=True, exist_ok=True)
    spark = get_spark()
    corpus_dir = scratch / "corpus"
    build_corpus(spark, corpus_dir)
    docs = spark.read.parquet(str(corpus_dir / "documents.parquet"))

    out = str(scratch / "landed")
    t0 = time.time()
    write_corpus_shards(
        docs,
        out,
        shard_key="doc_id",
        partition_by=("lang",),
        sort_by=("doc_id",),
        target_rows_per_file=TARGET_ROWS,
        shards=SHARDS,
        mode="overwrite",
    )
    t_write = time.time() - t0
    n = docs.count()
    print(f"write: {t_write:.1f}s ({n / t_write:,.0f} docs/s)")

    landed = read_corpus(spark, out)
    audit = (
        landed.withColumn("_f", F.input_file_name())
        .groupBy("lang", "_f")
        .count()
        .groupBy("lang")
        .agg(
            F.count("*").alias("files"),
            F.max("count").alias("max_rows_per_file"),
            F.sum("count").alias("rows"),
        )
        .orderBy("lang")
        .collect()
    )
    for r in audit:
        print(
            f"  lang={r['lang']}: {r['files']} files, "
            f"max {r['max_rows_per_file']} rows/file, {r['rows']} rows"
        )
        assert r["max_rows_per_file"] <= TARGET_ROWS
    assert sum(r["rows"] for r in audit) == n

    pruned = landed.filter((F.col("lang") == "en") & (F.col("doc_id") < 1000))
    t0 = time.time()
    n_pruned = pruned.count()
    t_pruned = time.time() - t0
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "PushedFilters" in plan, plan
    part = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    pushed = plan.split("PushedFilters", 1)[1].split("]", 1)[0]
    assert "lang" in part and "doc_id" in pushed
    print(
        f"pruned read (lang=en, doc_id<1000): {n_pruned} rows in "
        f"{t_pruned:.2f}s — PartitionFilters [{part.strip()}], "
        f"PushedFilters [{pushed.strip()}]"
    )

    out2 = str(scratch / "landed2")
    t0 = time.time()
    write_corpus_shards(
        docs.repartition(13, F.col("n_chars")),
        out2,
        shard_key="doc_id",
        partition_by=("lang",),
        sort_by=("doc_id",),
        target_rows_per_file=TARGET_ROWS,
        shards=SHARDS,
        mode="overwrite",
    )
    print(f"hostile-layout rewrite: {time.time() - t0:.1f}s")

    def file_fingerprints(path: str):
        rows = (
            read_corpus(spark, path)
            .withColumn("_f", F.input_file_name())
            .groupBy("_f")
            .agg(
                F.count("*").alias("n"),
                # decimal accumulator: 500k summed 64-bit hashes overflow
                # a long under ANSI (raises, correctly)
                F.sum(F.xxhash64("doc_id").cast("decimal(38,0)")).alias("h"),
                F.min("doc_id").alias("lo"),
                F.max("doc_id").alias("hi"),
            )
            .collect()
        )
        return sorted((r["n"], r["h"], r["lo"], r["hi"]) for r in rows)

    assert file_fingerprints(out) == file_fingerprints(out2)
    print("determinism: per-file row sets identical from hostile layout")

    # Append a 100k delta, compact, and require file-for-file
    # convergence on a fresh write of the 600k union — the property
    # that makes scheduled compaction of an incrementally grown corpus
    # safe to re-run and cheap to verify.
    from dionysus_rb_spark.sources.corpus_sink import compact_corpus

    corpus6 = scratch / "corpus600"
    build_corpus(spark, corpus6, n_docs=600_000)
    all6 = spark.read.parquet(str(corpus6 / "documents.parquet"))
    delta = all6.filter(F.col("doc_id") >= 500_000)
    t0 = time.time()
    write_corpus_shards(
        delta,
        out,
        shard_key="doc_id",
        partition_by=("lang",),
        sort_by=("doc_id",),
        target_rows_per_file=TARGET_ROWS,
        shards=SHARDS,
        mode="append",
    )
    t_append = time.time() - t0
    t0 = time.time()
    compact_corpus(spark, out)
    t_compact = time.time() - t0
    fresh6 = str(scratch / "landed600")
    write_corpus_shards(
        all6,
        fresh6,
        shard_key="doc_id",
        partition_by=("lang",),
        sort_by=("doc_id",),
        target_rows_per_file=TARGET_ROWS,
        shards=SHARDS,
        mode="overwrite",
    )
    assert file_fingerprints(out) == file_fingerprints(fresh6)
    print(
        f"append 100k: {t_append:.1f}s; compact 600k: {t_compact:.1f}s; "
        "converged file-for-file on the fresh 600k write"
    )


if __name__ == "__main__":
    main()
