"""Lineage truncation for iterative operators — fault-tolerant by default.

Iterative operators (connected components' star alternation, the outbox
drain loop) re-derive a frame from itself each cycle; without breaking
lineage the logical plan doubles per iteration and the optimizer chokes
long before the data does. Spark offers two truncation primitives with
opposite failure behavior, and the difference only shows up when an
executor dies:

- ``localCheckpoint``: blocks live ONLY on executors, lineage is
  discarded — losing any executor mid-run aborts the whole query with
  CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (no recompute path exists).
  Measured, not hypothetical: tools/validation/executor_loss_chaos.py
  SIGKILLed one of two executors during samp_cluster_split and the
  query died exactly that way.
- ``checkpoint`` (reliable): partitions are written to the checkpoint
  directory by the executors; a lost executor's blocks are re-read from
  storage and the query completes with the identical result.

At 1000 executors, spot reclamation makes executor loss the steady
state, so iterative operators default to RELIABLE truncation here. The
local mode stays available (``mode="local"``) for ephemeral
interactive work where a retry-from-scratch is acceptable and the
storage round-trip is not.

Checkpoint directory contract: reliable checkpointing needs a
directory every executor can reach. On a single-host master (local,
local-cluster) we auto-provision a temp dir so tests and the driver
need no setup; on any other master an unset checkpoint dir raises with
instructions rather than silently writing executor-local files that a
relocated read would miss.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame

__all__ = ["truncate_lineage"]

_SINGLE_HOST_PREFIXES = ("local", "local[", "local-cluster[")


def truncate_lineage(df: DataFrame, mode: str = "reliable") -> DataFrame:
    """Materialize ``df`` and return a frame with no upstream lineage.

    ``mode="reliable"`` (default) survives executor loss;
    ``mode="local"`` is the fast executor-memory variant that does not.
    Both are eager: the returned frame is already computed, so callers
    can ride the materialization job (e.g. with ``observe``).
    """
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode != "reliable":
        raise ValueError(f"mode must be 'reliable' or 'local', got {mode!r}")
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        if not sc.master.startswith(_SINGLE_HOST_PREFIXES):
            raise RuntimeError(
                "reliable lineage truncation needs a checkpoint directory "
                "on shared storage: call "
                "spark.sparkContext.setCheckpointDir('<hdfs/s3/... path>') "
                "before running iterative operators on a cluster "
                "(auto-provisioning only happens on single-host masters)"
            )
        sc.setCheckpointDir(tempfile.mkdtemp(prefix="dionysus_ckpt_"))
    return df.checkpoint(eager=True)
