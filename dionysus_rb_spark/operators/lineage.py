"""Lineage truncation for iterative operators — fault-tolerant by default.

Iterative operators (connected components' star alternation, the outbox
drain loop) re-derive a frame from itself each cycle; without breaking
lineage the logical plan doubles per iteration and the optimizer chokes
long before the data does. Spark's stock primitives each fail a
requirement:

- ``localCheckpoint``: blocks live ONLY on executors, lineage is
  discarded — losing any executor mid-run aborts the whole query with
  CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (no recompute path exists).
  Measured, not hypothetical: tools/validation/executor_loss_chaos.py
  SIGKILLed one of two executors during samp_cluster_split and the
  query died exactly that way. At 1000 executors, spot reclamation
  makes executor loss the steady state, so this cannot be the default.
- ``Dataset.checkpoint`` (reliable): survives executor loss, but (a)
  eager mode runs the plan TWICE (the materializing action and the
  separate checkpoint-write job), and (b) the rdd-N directories are
  never reclaimed while the session lives — an iterative operator
  leaks one full copy of its frame per iteration (TBs per CC run at
  corpus scale) unless the GC-coupled cleanCheckpoints conf happens to
  fire, and that conf can't be set on an externally-owned session.

So reliable truncation here is a managed parquet roundtrip: write the
frame once (ONE job — observations ride it like any action), read it
back under its own schema (works for the empty frame too, where a
bare parquet read of a fileless directory would fail), and delete the
directory this materialization SUPERSEDES once the new one is safely
on storage. An iteration loop therefore holds at most two copies on
disk at any moment, and the per-process root directory is removed at
interpreter exit. Executor loss mid-write is safe: retried tasks
re-read the previous directory (still present — deletion happens only
after the new write completes) and the commit protocol discards dead
attempts' files.

Directory contract: files must be reachable by every executor. If the
session has a checkpoint dir configured (``setCheckpointDir``), its
scheme/host is trusted and truncation dirs are created under it; else
on a single-host master a process-local temp root is auto-provisioned;
else we raise with instructions rather than silently writing
executor-local files that a relocated read would miss.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame

__all__ = ["truncate_lineage", "scratch_dir"]

_DIR_ATTR = "_dionysus_truncation_dir"
_local_root: str | None = None


def _is_single_host_master(master: str) -> bool:
    return (
        master == "local"
        or master.startswith("local[")
        or master.startswith("local-cluster[")
    )


def _cleanup_root() -> None:
    if _local_root is not None:
        shutil.rmtree(_local_root, ignore_errors=True)


def _root_dir(spark) -> str:
    ckpt = spark.sparkContext.getCheckpointDir()
    if ckpt is not None:
        # app-scoped subdir: a loop's FINAL truncation outlives the loop
        # (the returned frame reads it lazily), so on shared storage the
        # leftovers must be attributable — a janitor can reap
        # dionysus-trunc-<appId> dirs of dead applications, which a flat
        # root of uuid dirs would make impossible
        return (
            f"{ckpt.rstrip('/')}/dionysus-trunc-"
            f"{spark.sparkContext.applicationId}"
        )
    global _local_root
    if _local_root is None:
        if not _is_single_host_master(spark.sparkContext.master):
            raise RuntimeError(
                "reliable lineage truncation needs a directory on shared "
                "storage: call spark.sparkContext.setCheckpointDir("
                "'<hdfs/s3/... path>') before running iterative operators "
                "on a cluster (auto-provisioning only happens on "
                "single-host masters)"
            )
        _local_root = tempfile.mkdtemp(prefix="dionysus_ckpt_")
        atexit.register(_cleanup_root)
    return _local_root


def _delete_dir(spark, path: str) -> None:
    """Best-effort removal, through the Hadoop FS so non-file:// roots
    (a cluster checkpoint dir) are handled too."""
    try:
        jvm = spark.sparkContext._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        fs.delete(jpath, True)
    except Exception:  # noqa: BLE001 — cleanup must never fail the query
        pass


def scratch_dir(spark, prefix: str = "scratch-") -> str:
    """Allocate a unique path for intermediate files under the session's
    RECLAIMED storage root — the same root truncation uses: the
    configured cluster checkpoint dir (app-scoped, janitor-reapable) or
    the auto-provisioned local temp root removed at interpreter exit.

    For any query that must land helper files (rendered test corpora,
    export staging), this replaces bare ``tempfile.mkdtemp`` — whose
    directories nothing ever reclaims, so repeated runs accumulate
    orphans under /tmp (ADVICE r8 item 4). The returned path does NOT
    exist yet (Spark writers create their target); uniqueness comes
    from the uuid suffix.
    """
    return f"{_root_dir(spark).rstrip('/')}/{prefix}{uuid.uuid4().hex}"


def truncate_lineage(
    df: DataFrame, mode: str = "reliable", supersedes: DataFrame | None = None
) -> DataFrame:
    """Materialize ``df`` and return a frame with no upstream lineage.

    ``mode="reliable"`` (default) survives executor loss;
    ``mode="local"`` is the fast executor-memory variant that does not.
    Both are eager: the returned frame is already computed, so callers
    can ride the materialization job (e.g. with ``observe``).

    ``supersedes`` names the frame a loop is replacing: once the new
    materialization is on storage, the superseded frame's truncation
    directory is deleted, bounding an N-iteration loop at two resident
    copies instead of N. Only frames returned by this function carry a
    directory; passing anything else is a harmless no-op. NEVER pass a
    frame the loop did not itself materialize — deleting a
    caller-owned frame's backing files invalidates the caller's
    reference (drain_topic's ``owned`` pattern is the template).

    Schema contract (parquet, stricter than localCheckpoint): every
    column must have a storable type — an un-cast null literal
    (``lit(None)`` without ``.cast``) is VOID and raises at the write;
    cast it first. Nullability is widened to nullable on read-back
    (file-source semantics); names and types round-trip exactly.

    Lifetime: superseded directories are deleted eagerly; the LAST
    truncation of a loop backs the returned frame and lives until the
    auto-provisioned root's exit cleanup (single-host) or, under a
    configured cluster checkpoint dir, until the app-scoped
    ``dionysus-trunc-<applicationId>`` subdir is reaped after the
    application ends.
    """
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode != "reliable":
        raise ValueError(f"mode must be 'reliable' or 'local', got {mode!r}")
    spark = df.sparkSession
    # string join, not pathlib: the root may be a URI (hdfs://, s3a://)
    # and Path would collapse its double slash
    path = f"{_root_dir(spark).rstrip('/')}/trunc-{uuid.uuid4().hex}"
    df.write.parquet(path)
    out = spark.read.schema(df.schema).parquet(path)
    setattr(out, _DIR_ATTR, path)
    if supersedes is not None:
        prev = getattr(supersedes, _DIR_ATTR, None)
        if prev is not None:
            _delete_dir(spark, prev)
    return out
