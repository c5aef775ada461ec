"""Sharded, pruning-friendly corpus output sink.

The curation pipeline's last step is the one the reference never
needed: landing a filtered/deduped corpus as files a *training* job
will re-read thousands of times. At 100 TB the output layout decides
the read cost, and four properties matter:

* **Directory partitioning** on low-cardinality selector columns
  (``lang``, ``source``): a training run that wants one slice must
  prune at the PartitionFilters level, never scan-and-discard.
* **Bounded file sizes** via Spark's native ``maxRecordsPerFile``
  split: loaders schedule per file, so a skewed 40 GB straggler file
  serializes the epoch tail. Row count is the proxy that is exact and
  free; byte-targeting would need a sampling pass for ~the same
  outcome.
* **Sorted-within-file rows** on the read key (``doc_id``): parquet
  row-group min/max stats make point/range lookups skip, and a
  deterministic within-file order is what makes training-data loading
  reproducible (fixed seed -> fixed batch composition).
* **One open writer per task**: each task's rows are sorted by the
  partition columns FIRST, so it writes its output directories
  sequentially instead of holding every directory's file handle open —
  the classic executor-OOM on wide ``partitionBy`` writes.

Sharding is content-derived (``xxhash64`` of the shard key, modulo the
shard count), not task-derived: re-running the sink on the same rows
re-creates the same shard membership whatever the upstream
partitioning did (tests/test_layout_invariance.py is the engine-wide
statement of that principle; the determinism test here is its
sink-side twin). Per-FILE determinism additionally needs a total
within-shard row order, so the shard key is always appended to the
sort — with a unique shard key (the normal case) the maxRecordsPerFile
split boundaries are then content-determined too.

Partition-VALUE round-tripping is contractual, with one documented
normalization: Hive directory encoding cannot distinguish an empty
string from NULL (both land in ``__HIVE_DEFAULT_PARTITION__``), so the
sink normalizes ``''`` to NULL at write for string partition columns
— explicitly, on both engines' side of any oracle, rather than as a
silent read-back surprise. Partition-column TYPES round-trip via a
``_corpus_manifest.json`` written next to the data: the reader casts
each partition column back to its written DDL type, so a lang of
``'7'`` stays a string instead of being re-typed by Spark's default
partition-column inference (which is a session-global conf the engine
must not flip — the bucketed snapshot store relies on typed buckets).

Reference parity: the closest surface is the bulk-import sink
(lib/dionysus/utils/ — set-oriented inserts, SURVEY §2 S8); the
reference writes rows into Postgres and has no file-layout concern.
This sink is part of the beyond-reference LLM-pipeline family.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_corpus_shards", "read_corpus", "compact_corpus"]

_SHARD_COL = "_shard"
_MANIFEST = "_corpus_manifest.json"  # leading '_': ignored by parquet scans


def write_corpus_shards(
    df: DataFrame,
    path: str,
    *,
    shard_key: str,
    partition_by: Sequence[str] = (),
    sort_by: Sequence[str] = (),
    target_rows_per_file: int = 1_000_000,
    shards: int | None = None,
    mode: str = "error",
) -> None:
    """Write ``df`` as a partitioned, size-bounded, sorted shard layout.

    ``shards`` controls write parallelism (defaults to the session's
    shuffle partition count — on a real cluster that is cluster-sized);
    ``target_rows_per_file`` bounds every emitted file regardless of
    shard skew via the writer-level ``maxRecordsPerFile`` split, so a
    hot shard degrades into several bounded files, never one straggler.

    Per-file determinism holds when ``(partition_by, sort_by,
    shard_key)`` totally orders rows within each shard — automatic when
    ``shard_key`` is unique per row. With duplicate full sort keys the
    landed corpus is still content-exact as a multiset; only which side
    of a file-split boundary a tied row lands on is unpinned.
    """
    if shard_key in partition_by:
        raise ValueError("shard_key must not be a partition column")
    if _SHARD_COL in df.columns:
        raise ValueError(
            f"input already has a {_SHARD_COL!r} column — the sink needs "
            "that name for its internal shard id"
        )
    spark = df.sparkSession
    if shards is None:
        shards = int(spark.conf.get("spark.sql.shuffle.partitions"))
    shards = max(1, shards)
    # The documented '' -> NULL normalization for string partition
    # values (Hive directory encoding conflates them; we make the
    # conflation explicit and engine-independent).
    part_types: dict[str, str] = {}
    dtypes = dict(df.dtypes)
    for p in partition_by:
        part_types[p] = dtypes[p]
        if dtypes[p] == "string":
            df = df.withColumn(p, F.nullif(F.col(p), F.lit("")))
    # Content-derived shard id; NULL keys hash like any other value
    # (xxhash64(NULL, seed) is a constant, so NULL-keyed rows co-locate
    # in one shard rather than scattering nondeterministically).
    sharded = df.withColumn(
        _SHARD_COL, F.pmod(F.xxhash64(F.col(shard_key), F.lit(77)), F.lit(shards))
    )
    # shard_key appended: totally orders rows within a shard when the
    # key is unique, pinning the maxRecordsPerFile split boundaries.
    # The distribution key is the SHARD ALONE (not partition cols +
    # shard): compaction rewrites one partition directory at a time and
    # must reproduce the identical task packing from just the shard ids
    # — that is what makes compact(write+appends) converge file-for-file
    # on write(union) (test_corpus_sink.py). Partition cols still LEAD
    # the sort, so each task writes its directories sequentially.
    order = [*partition_by, *sort_by, shard_key]
    (
        sharded.repartition(shards, _SHARD_COL)
        .sortWithinPartitions(*order)
        .drop(_SHARD_COL)
        .write.mode(mode)
        .option("maxRecordsPerFile", target_rows_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )
    manifest_path = os.path.join(path, _MANIFEST)
    if mode == "append" and os.path.exists(manifest_path):
        # the FIRST write's layout governs the corpus; appends that pass
        # different knobs land physically but compaction normalizes to
        # the recorded layout
        return
    with open(manifest_path, "w") as f:
        json.dump(
            {
                "partition_types": part_types,
                "layout": {
                    "shard_key": shard_key,
                    "partition_by": list(partition_by),
                    "sort_by": list(sort_by),
                    "target_rows_per_file": target_rows_per_file,
                    "shards": shards,
                },
            },
            f,
        )


def compact_corpus(
    spark: SparkSession, path: str, partitions: Sequence[str] | None = None
) -> None:
    """Re-land a corpus (or a subset of its partition directories) in
    the manifest's canonical shard layout.

    Incremental ``mode="append"`` writes accumulate small files — the
    operational killer at 100 TB (every downstream scan pays per-file
    scheduling and footer costs). Because shard membership and
    within-file order are CONTENT-derived, compaction is *convergent*:
    compacting any sequence of appends produces byte-set-identical
    per-file layouts to a single fresh write of the union, so re-running
    a half-finished compaction (or compacting an already-compact
    corpus) is always safe and a no-op layout-wise.

    ``partitions`` selects directory names (e.g. ``["lang=en"]``) to
    compact incrementally — cost is bounded by the selected partitions'
    size, which is how a 100 TB corpus compacts on a schedule instead
    of in one job. The per-directory rewrite is replace-after-write on
    the filesystem, not transactional: a reader racing the swap can see
    a directory mid-replace (use a lakehouse table format when that
    matters; this sink is the layout algebra, proven deterministic).
    """
    import shutil
    import tempfile

    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    layout = manifest["layout"]
    part_cols = layout["partition_by"]
    # single-writer assumption (documented above): stale temp dirs from
    # a crashed compaction are garbage — reclaim them up front. They
    # were never visible to readers: the leading underscore keeps Spark's
    # source discovery from treating them as data.
    for d in os.listdir(path):
        if d.startswith("_compact_"):
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    # only true partition directories (col=value): a crashed prior
    # compaction's compact_* temp dir must never be read as data — its
    # contents are already (or about to be) somewhere else
    prefixes = tuple(f"{c}=" for c in part_cols)
    dirs = [
        d
        for d in sorted(os.listdir(path))
        if os.path.isdir(os.path.join(path, d))
        and d.startswith(prefixes)
        and (partitions is None or d in partitions)
    ]
    if not part_cols:
        dirs = ["."]  # unpartitioned corpus: compact the root
    for d in dirs:
        src = os.path.normpath(os.path.join(path, d))
        df = read_corpus(spark, path) if d == "." else read_corpus_dir(spark, path, d)
        tmp = tempfile.mkdtemp(prefix="_compact_", dir=path)
        # Re-shard through the canonical layout (the '' -> NULL partition
        # normalization is already applied on disk, so no re-normalize).
        _rewrite_dir(df, tmp, layout, part_cols, d)
        # swap: remove old contents, move new in
        if d == ".":
            for name in os.listdir(src):
                p = os.path.join(src, name)
                if name != _MANIFEST and not name.startswith("_compact_"):
                    shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
            target_dir = src
        else:
            shutil.rmtree(src)
            target_dir = src
            os.makedirs(target_dir, exist_ok=True)
        for name in os.listdir(tmp):
            os.replace(os.path.join(tmp, name), os.path.join(target_dir, name))
        shutil.rmtree(tmp, ignore_errors=True)


def _rewrite_dir(
    df: DataFrame, tmp: str, layout: dict, part_cols: Sequence[str], d: str
) -> None:
    """Write ``df`` (one partition directory's rows, partition columns
    already dropped from the files) into ``tmp`` in canonical layout."""
    shards = max(1, int(layout["shards"]))
    shard_key = layout["shard_key"]
    sort_by = layout["sort_by"]
    data_cols = [c for c in df.columns if c not in part_cols]
    body = df.select(*data_cols)
    sharded = body.withColumn(
        _SHARD_COL, F.pmod(F.xxhash64(F.col(shard_key), F.lit(77)), F.lit(shards))
    )
    order = [*sort_by, shard_key]
    (
        sharded.repartition(shards, _SHARD_COL)
        .sortWithinPartitions(*order)
        .drop(_SHARD_COL)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", layout["target_rows_per_file"])
        .parquet(tmp)
    )


def read_corpus_dir(spark: SparkSession, path: str, d: str) -> DataFrame:
    """Read ONE partition directory's rows (partition columns excluded —
    they live in the directory name, which is preserved by compaction)."""
    return spark.read.parquet(os.path.join(path, d))


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Re-open a sharded corpus. Partition columns come back from the
    directory structure and are cast to their WRITTEN types via the
    manifest — Spark's partition-column type inference would otherwise
    re-type a numeric-looking string slice value. Filters on them still
    prune before the scan (the cast sits above the partition filter)."""
    df = spark.read.parquet(path)
    manifest = os.path.join(path, _MANIFEST)
    if os.path.exists(manifest):
        with open(manifest) as f:
            part_types = json.load(f).get("partition_types", {})
        for col, ddl in part_types.items():
            if col in df.columns and dict(df.dtypes)[col] != ddl:
                df = df.withColumn(col, F.col(col).cast(ddl))
    return df
