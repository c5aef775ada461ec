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
sink-side twin).

Reference parity: the closest surface is the bulk-import sink
(lib/dionysus/utils/ — set-oriented inserts, SURVEY §2 S8); the
reference writes rows into Postgres and has no file-layout concern.
This sink is part of the beyond-reference LLM-pipeline family.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_corpus_shards", "read_corpus"]

_SHARD_COL = "_shard"


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
    """
    if shard_key in partition_by:
        raise ValueError("shard_key must not be a partition column")
    spark = df.sparkSession
    if shards is None:
        shards = int(spark.conf.get("spark.sql.shuffle.partitions"))
    shards = max(1, shards)
    # Content-derived shard id; NULL keys hash like any other value
    # (xxhash64(NULL, seed) is a constant, so NULL-keyed rows co-locate
    # in one shard rather than scattering nondeterministically).
    sharded = df.withColumn(
        _SHARD_COL, F.pmod(F.xxhash64(F.col(shard_key), F.lit(77)), F.lit(shards))
    )
    order = [*partition_by, *sort_by] or [_SHARD_COL]
    (
        sharded.repartition(shards, *partition_by, _SHARD_COL)
        .sortWithinPartitions(*order)
        .drop(_SHARD_COL)
        .write.mode(mode)
        .option("maxRecordsPerFile", target_rows_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Re-open a sharded corpus. Partition columns come back from the
    directory structure; filters on them prune before the scan."""
    return spark.read.parquet(path)
