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
    manifest_path = os.path.join(path, _MANIFEST)
    existing_manifest = None
    if mode == "append" and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            existing_manifest = json.load(f)
        recorded = existing_manifest.get("layout")
        if recorded is not None:
            # Structural knobs must match the corpus or the landed
            # directory tree itself diverges (a flat append into a
            # partitioned corpus breaks partition discovery outright) —
            # validated BEFORE any data lands. The physical knobs
            # (target_rows_per_file, shards) may differ per delta;
            # compaction normalizes them to the recorded layout.
            for k, passed in (
                ("shard_key", shard_key),
                ("partition_by", list(partition_by)),
                ("sort_by", list(sort_by)),
            ):
                if recorded[k] != passed:
                    raise ValueError(
                        f"append layout mismatch on {k!r}: corpus recorded "
                        f"{recorded[k]!r}, append passed {passed!r}"
                    )
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
    layout = {
        "shard_key": shard_key,
        "partition_by": list(partition_by),
        "sort_by": list(sort_by),
        "target_rows_per_file": target_rows_per_file,
        "shards": shards,
    }
    if existing_manifest is not None:
        if existing_manifest.get("layout") is None:
            # pre-layout manifest (older sink): this append has every
            # knob needed to make the corpus compactable — record them
            existing_manifest["layout"] = layout
            with open(manifest_path, "w") as f:
                json.dump(existing_manifest, f)
        # otherwise the FIRST write's layout stands
        return
    with open(manifest_path, "w") as f:
        json.dump({"partition_types": part_types, "layout": layout}, f)


_TRASH = "_compact_old_"
_PHASE_MARKER = "_compact_phase"
# Root-protocol commit point (ADVICE r7): the trash dir is renamed to
# this name ONLY once the new data is completely moved in, so recovery
# can distinguish "crashed while moving new in" (trash name: restore
# old) from "crashed while reclaiming" (deleting name: new is complete,
# reclaim). Without it, a crash mid-rmtree left marker+partial-trash and
# recovery deleted the COMPLETE new data to restore a PARTIAL old set.
_DELETING = "_compact_deleting_root"


def _trash_name(leafname: str) -> str:
    """Encode a leaf dir name into its trash sibling's name. The '=' must
    go: Spark's partition discovery parses any dir containing '=' as a
    partition column (underscore prefix or not) and fails the read with
    a conflict; an '='-free underscore name is fully ignored (probed).
    Percent-encoding, '%' first, keeps it reversible even for values
    Hive itself escaped (a literal '=' in a value is stored as %3D)."""
    return _TRASH + leafname.replace("%", "%25").replace("=", "%3D")


def _untrash_name(trashname: str) -> str:
    return trashname[len(_TRASH):].replace("%3D", "=").replace("%25", "%")


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

    ``partitions`` selects LEAF partition directories by relative path
    (e.g. ``["lang=en"]``, or ``["lang=en/source=web"]`` on a two-level
    corpus — a prefix selects its whole subtree); unknown names raise
    instead of silently compacting nothing. Cost is bounded by the
    selected partitions' size, which is how a 100 TB corpus compacts on
    a schedule instead of in one job.

    Crash-safety (single compactor at a time, documented): each leaf
    swap is rename-aside — old dir -> ``_compact_old_*`` sibling, new
    dir renamed in, trash removed — so every crash point leaves a
    recoverable state, and the next run's recovery pass restores or
    reclaims before doing anything else. The unpartitioned root cannot
    swap by directory rename, so it uses a phase-marker protocol with
    the same property. Underscore-prefixed temp/trash names keep Spark
    source discovery from ever reading in-flight state as data. A
    reader racing the swap can still see a directory mid-replace (use a
    lakehouse table format when that matters; this sink is the layout
    algebra underneath, proven deterministic).
    """
    import shutil
    import tempfile

    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    layout = manifest.get("layout")
    if layout is None:
        raise ValueError(
            f"{path}: manifest has no layout record — corpus written by a "
            "pre-layout sink; re-land it with write_corpus_shards to compact"
        )
    part_cols = layout["partition_by"]
    _recover_crashed_compaction(path, part_cols)
    # stale temp dirs from a crashed compaction (post-recovery, they are
    # guaranteed redundant copies) — reclaim
    for d in os.listdir(path):
        if d.startswith("_compact_") and not d.startswith(_TRASH):
            p = os.path.join(path, d)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)

    if not part_cols:
        if partitions is not None:
            raise ValueError("partitions given but the corpus is unpartitioned")
        _compact_root(spark, path, layout, part_cols)
        return

    leaves = _leaf_dirs(path, part_cols)
    if partitions is not None:
        chosen = []
        for sel in partitions:
            matched = [
                leaf
                for leaf in leaves
                if leaf == sel or leaf.startswith(sel + os.sep)
            ]
            if not matched:
                raise ValueError(
                    f"unknown partition {sel!r}; available: {leaves}"
                )
            chosen.extend(matched)
        leaves = sorted(set(chosen))
    for rel in leaves:
        src = os.path.join(path, rel)
        df = spark.read.parquet(src)  # leaf: data files only
        tmp = tempfile.mkdtemp(prefix="_compact_", dir=path)
        # Re-shard through the canonical layout (the '' -> NULL partition
        # normalization is already applied on disk, so no re-normalize).
        _rewrite_dir(df, tmp, layout, part_cols)
        # atomic-per-step swap: aside, in, reclaim
        trash = os.path.join(
            os.path.dirname(src), _trash_name(os.path.basename(src))
        )
        os.rename(src, trash)
        os.rename(tmp, src)
        shutil.rmtree(trash, ignore_errors=True)


def _compact_root(spark, path: str, layout: dict, part_cols: Sequence[str]) -> None:
    """Unpartitioned corpus: data files live at the root next to the
    manifest, so the swap is file-level under a phase marker (see
    _recover_crashed_compaction for the crash analysis)."""
    import shutil
    import tempfile

    df = read_corpus(spark, path)
    tmp = tempfile.mkdtemp(prefix="_compact_", dir=path)
    _rewrite_dir(df, tmp, layout, part_cols)
    trash = os.path.join(path, _TRASH + "root")
    os.makedirs(trash)
    for name in _root_data_entries(path):
        os.rename(os.path.join(path, name), os.path.join(trash, name))
    marker = os.path.join(path, _PHASE_MARKER)
    open(marker, "w").close()  # phase 2: old is fully aside
    for name in os.listdir(tmp):
        os.replace(os.path.join(tmp, name), os.path.join(path, name))
    # COMMIT POINT: one atomic rename records "new data is complete".
    # From here recovery always reclaims the old set, never restores it
    # — rmtree below may die or partially fail without risking the
    # marker+partial-trash ambiguity (see _recover_crashed_compaction).
    deleting = os.path.join(path, _DELETING)
    os.rename(trash, deleting)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(deleting, ignore_errors=True)
    os.remove(marker)  # marker outlives the reclaim: see recovery (b2)


def _root_data_entries(path: str) -> list[str]:
    return [
        n
        for n in sorted(os.listdir(path))
        if n != _MANIFEST and not n.startswith("_") and not n.startswith(".")
    ]


def _recover_crashed_compaction(path: str, part_cols: Sequence[str]) -> None:
    """Restore a consistent corpus from any crash point of a prior run.

    Leaf swaps are three atomic renames, so: trash present + target
    missing -> crashed between renames, restore the old dir; trash
    present + target present -> new data landed, trash is superseded,
    reclaim it. The root protocol's phase marker + the commit-point
    rename (trash -> _DELETING once the new data is fully in) split the
    file-level cases: (a) no marker + trash -> crash while moving old
    aside: move it back (names are unique, no conflicts); (b) marker +
    trash -> crash while moving new in: root data entries are partial
    new, delete them and restore the old (complete) set; (c) _DELETING
    present (marker or not) -> the commit rename happened, so the new
    data is complete and the old set is superseded: reclaim it, NEVER
    restore — this is the case that used to be ambiguous with (b) when
    a crash or silent partial failure interrupted the trash rmtree,
    and restoring there deleted complete new data / resurrected old
    part-files alongside it (ADVICE r7); (b2) marker + neither dir ->
    new data complete, reclaim done: drop the marker.
    """
    import shutil

    if not part_cols:
        trash = os.path.join(path, _TRASH + "root")
        deleting = os.path.join(path, _DELETING)
        marker = os.path.join(path, _PHASE_MARKER)
        if os.path.isdir(deleting):  # (c) committed: reclaim only
            shutil.rmtree(deleting, ignore_errors=True)
            if os.path.exists(marker):
                os.remove(marker)
        elif os.path.exists(marker):
            if os.path.isdir(trash):  # (b) partial new: restore old
                for name in _root_data_entries(path):
                    p = os.path.join(path, name)
                    shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
                for name in os.listdir(trash):
                    os.rename(os.path.join(trash, name), os.path.join(path, name))
                shutil.rmtree(trash, ignore_errors=True)
            os.remove(marker)  # (b2) when no trash
        elif os.path.isdir(trash):  # (a) move the old set back
            for name in os.listdir(trash):
                dst = os.path.join(path, name)
                if not os.path.exists(dst):
                    os.rename(os.path.join(trash, name), dst)
            shutil.rmtree(trash, ignore_errors=True)
        return

    bases = [path]
    for col in part_cols:
        nxt = []
        for base in bases:
            for name in sorted(os.listdir(base)):
                if name.startswith(_TRASH):
                    full = os.path.join(base, name)
                    target = os.path.join(base, _untrash_name(name))
                    if os.path.exists(target):
                        shutil.rmtree(full, ignore_errors=True)
                    else:
                        os.rename(full, target)
            for name in sorted(os.listdir(base)):
                full = os.path.join(base, name)
                if os.path.isdir(full) and name.startswith(f"{col}="):
                    nxt.append(full)
        bases = nxt


def _leaf_dirs(path: str, part_cols: Sequence[str]) -> list[str]:
    """Relative paths of the LEAF partition directories (full nesting
    depth — compacting an intermediate level would partition-discover
    the deeper columns into the data and destroy them)."""
    rels = [""]
    for col in part_cols:
        nxt = []
        for rel in rels:
            base = os.path.join(path, rel) if rel else path
            for name in sorted(os.listdir(base)):
                if name.startswith(f"{col}=") and os.path.isdir(
                    os.path.join(base, name)
                ):
                    nxt.append(os.path.join(rel, name) if rel else name)
        rels = nxt
    return rels


def _rewrite_dir(
    df: DataFrame, tmp: str, layout: dict, part_cols: Sequence[str]
) -> None:
    """Write ``df`` (one leaf directory's rows — partition columns live
    in the directory path, not the files) into ``tmp`` in canonical
    layout."""
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
