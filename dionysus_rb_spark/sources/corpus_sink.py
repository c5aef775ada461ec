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

__all__ = ["write_corpus_shards", "read_corpus"]

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
    # key is unique, pinning the maxRecordsPerFile split boundaries
    order = [*partition_by, *sort_by, shard_key]
    (
        sharded.repartition(shards, *partition_by, _SHARD_COL)
        .sortWithinPartitions(*order)
        .drop(_SHARD_COL)
        .write.mode(mode)
        .option("maxRecordsPerFile", target_rows_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump({"partition_types": part_types}, f)


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
