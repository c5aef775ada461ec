"""Versioned parquet snapshot store — the MERGE target.

The reference's consumer target table (the "world model" the upsert
maintains, persistor.rb) maps to a lakehouse table we MERGE into. Delta
isn't available in this container, so this store implements the same
contract on plain parquet: versioned directories + an atomic pointer
file, merge = guarded_merge + full rewrite of the new version.

On a real cluster this class is swapped for ``DeltaTable.merge`` (or
Iceberg MERGE INTO): the transform logic (operators/merge.py) is
identical — only the physical commit differs. The rewrite here is
O(table) per batch, which is exactly the trade Delta's copy-on-write
makes per touched file; partitioning the store by a stable key prefix
(``partition_by``) bounds the rewrite to touched partitions at scale.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import guarded_merge


class SnapshotStore:
    def __init__(self, path: str, key: str = "synced_id"):
        self.path = path
        self.key = key
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_version(self) -> str | None:
        if not os.path.exists(self._pointer):
            return None
        with open(self._pointer) as f:
            return json.load(f)["version"]

    def read(self, spark: SparkSession) -> DataFrame | None:
        v = self.current_version()
        if v is None:
            return None
        return spark.read.parquet(os.path.join(self.path, v))

    def overwrite(self, df: DataFrame) -> None:
        self._commit(df)

    def append(self, spark: SparkSession, df: DataFrame) -> None:
        """Accumulate rows (the dead-letter contract: every batch's
        rejects survive, across batches and within one batch's multiple
        reject paths)."""
        cur = self.read(spark)
        if cur is not None:
            df = cur.unionByName(df, allowMissingColumns=True)
        self.overwrite(df)

    def merge(
        self,
        spark: SparkSession,
        batch: DataFrame,
        event_col: str = "event",
        source_updated: str = "synced_updated_at",
        target_updated: str = "synced_updated_at",
        canceled_col: str | None = "synced_canceled_at",
        order_tiebreak: str | None = None,
    ) -> None:
        """Idempotent guarded MERGE of one (micro-)batch. Replaying a
        batch yields the same state (F1 guard + keep-latest), which is
        what makes foreachBatch at-least-once effectively exactly-once
        (SURVEY §2.10 T1)."""
        from pyspark.sql import functions as F

        # entities without soft-delete / update-timestamp columns degrade
        # gracefully (FIXTURES.md §4's column-less variants)
        if canceled_col is not None and canceled_col not in batch.columns:
            canceled_col = None
        if source_updated not in batch.columns:
            batch = batch.withColumn(source_updated, F.lit(None).cast("timestamp"))
        target = self.read(spark)
        if target is None:
            # bootstrap: batch IS the initial state (minus destroys)
            from ..operators.dedup import keep_latest
            from pyspark.sql import functions as F

            first = keep_latest(
                batch, [self.key], source_updated,
                [order_tiebreak] if order_tiebreak else (),
            )
            live = first.filter(F.col(event_col) != "destroyed").drop(event_col)
            self._commit(live)
            return
        merged = guarded_merge(
            target,
            batch,
            key=self.key,
            event_col=event_col,
            source_updated=source_updated,
            target_updated=target_updated,
            canceled_col=canceled_col,
            order_tiebreak=order_tiebreak,
        )
        self._commit(merged)

    def _commit(self, df: DataFrame) -> None:
        version = f"v{int(time.time() * 1000)}_{os.getpid()}"
        out = os.path.join(self.path, version)
        df.write.mode("overwrite").parquet(out)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self._pointer)  # atomic pointer swap
        self._gc(keep=3)

    def _gc(self, keep: int) -> None:
        versions = sorted(
            d for d in os.listdir(self.path)
            if d.startswith("v") and os.path.isdir(os.path.join(self.path, d))
        )
        current = self.current_version()
        for d in versions[:-keep]:
            if d != current:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)


class BucketedSnapshotStore(SnapshotStore):
    """Key-bucketed snapshot store: MERGE cost ∝ touched buckets.

    The plain store rewrites the whole table per batch — Delta's
    copy-on-write trade at file granularity, here at table granularity.
    This variant hashes the merge key into ``num_buckets`` partitions;
    a batch only reads + rewrites the buckets its keys land in, and the
    manifest (bucket -> current file set) swaps atomically. With
    num_buckets sized so each bucket ≈ a Delta file group, this IS the
    bounded-rewrite behavior `MERGE INTO` gives on a lakehouse — per
    micro-batch cost tracks batch size, not table size, which is the
    property that keeps the consumer viable at 100 TB state.

    Note on co-location: plain parquet reads carry no bucketing metadata,
    so the merge join still exchanges the (touched-bucket subset of the)
    target. What this layout bounds is IO and rewrite volume; to also
    skip the target-side exchange on a cluster, register the store as a
    Hive-bucketed table (``bucketBy(n, key).saveAsTable``) or use a
    lakehouse MERGE — the transform logic here is unchanged either way.
    """

    def __init__(self, path: str, key: str = "synced_id", num_buckets: int = 16):
        super().__init__(path, key)
        self.num_buckets = num_buckets

    def _bucket_expr(self):
        from pyspark.sql import functions as F

        return F.pmod(F.xxhash64(F.col(self.key)), self.num_buckets).cast("int")

    def _manifest(self) -> dict[str, str]:
        if not os.path.exists(self._pointer):
            return {}
        with open(self._pointer) as f:
            data = json.load(f)
        return data.get("buckets", {})

    def _write_manifest(self, buckets: dict[str, str]) -> None:
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"buckets": buckets}, f)
        os.replace(tmp, self._pointer)  # atomic swap

    def current_version(self) -> str | None:  # pragma: no cover - compat shim
        return "bucketed" if self._manifest() else None

    def read(self, spark: SparkSession, buckets: list[int] | None = None) -> DataFrame | None:
        manifest = self._manifest()
        if not manifest:
            return None
        wanted = (
            [str(b) for b in buckets if str(b) in manifest]
            if buckets is not None
            else list(manifest)
        )
        paths = [os.path.join(self.path, manifest[b]) for b in wanted]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def overwrite(self, df: DataFrame) -> None:
        self._commit_buckets(df, touched=None)

    def _commit_buckets(self, df: DataFrame, touched: list[int] | None) -> None:
        """Write ``df`` partitioned by bucket into a new version dir and
        repoint only the affected manifest entries (all, if touched is
        None)."""
        version = f"v{int(time.time() * 1000)}_{os.getpid()}"
        out = os.path.join(self.path, version)
        (
            df.withColumn("__bucket", self._bucket_expr())
            .repartition("__bucket")
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(out)
        )
        written = {
            d.split("=", 1)[1]: os.path.join(version, d)
            for d in os.listdir(out)
            if d.startswith("__bucket=")
        }
        if touched is None:  # full replace
            self._write_manifest(written)
            self._gc_unreferenced()
            return
        manifest = self._manifest()
        for b in {str(b) for b in touched}:
            if b in written:
                manifest[b] = written[b]
            else:
                manifest.pop(b, None)  # bucket fully deleted
        self._write_manifest(manifest)
        self._gc_unreferenced()

    def _gc_unreferenced(self, keep_newest: int = 2) -> None:
        """Remove version dirs no manifest entry references (each merge
        writes a new dir for its touched buckets; superseded dirs leak
        otherwise). The newest few unreferenced dirs are kept as a grace
        window for in-flight readers."""
        referenced = {p.split(os.sep, 1)[0] for p in self._manifest().values()}
        versions = sorted(
            d
            for d in os.listdir(self.path)
            if d.startswith("v") and os.path.isdir(os.path.join(self.path, d))
        )
        stale = [d for d in versions if d not in referenced]
        for d in stale[:-keep_newest] if keep_newest else stale:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def merge(
        self,
        spark: SparkSession,
        batch: DataFrame,
        event_col: str = "event",
        source_updated: str = "synced_updated_at",
        target_updated: str = "synced_updated_at",
        canceled_col: str | None = "synced_canceled_at",
        order_tiebreak: str | None = None,
    ) -> None:
        from pyspark.sql import functions as F

        from ..operators.dedup import keep_latest

        if canceled_col is not None and canceled_col not in batch.columns:
            canceled_col = None
        if source_updated not in batch.columns:
            batch = batch.withColumn(source_updated, F.lit(None).cast("timestamp"))

        touched = [
            r["__b"]
            for r in batch.select(self._bucket_expr().alias("__b")).distinct().collect()
        ]
        target = self.read(spark, buckets=touched)
        if target is None:
            first = keep_latest(
                batch, [self.key], source_updated,
                [order_tiebreak] if order_tiebreak else (),
            )
            live = first.filter(F.col(event_col) != "destroyed").drop(event_col)
            self._commit_buckets(live, touched=touched)
            return
        merged = guarded_merge(
            target,
            batch,
            key=self.key,
            event_col=event_col,
            source_updated=source_updated,
            target_updated=target_updated,
            canceled_col=canceled_col,
            order_tiebreak=order_tiebreak,
        )
        self._commit_buckets(merged, touched=touched)
