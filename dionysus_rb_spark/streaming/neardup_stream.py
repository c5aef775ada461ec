"""Streaming near-duplicate gate — MinHash-LSH as an online filter.

Batch near-dup mining (operators/minhash.py) finds pairs within a
corpus. The streaming gate answers the online question instead: does
this INCOMING document collide with an already-curated index (the
training corpus, a benchmark's held-out set)? Same signature math, run
unchanged inside readStream; the index is a static frame of band keys.

Two join shapes, picked by index size — AUTOMATICALLY by default
(``broadcast_index=None`` counts the index's distinct band keys once at
gate-construction and compares against ``BROADCAST_INDEX_MAX_KEYS``, the
same shape-gating pattern as pq.ADC_LITERAL_MAX_ENTRIES), so the
scale-safe path engages without the caller having to know the index
size; pass an explicit bool to pin a shape:

- ``broadcast_index=True``: the stream keeps its band-key ARRAY and the
  gate is one stream-static LEFT SEMI join on ``array_contains`` — a
  broadcast nested-loop join. Each stream doc emits AT MOST ONCE
  regardless of how many bands collide, no state, no watermark. Right
  for decontamination gates, where the index (a benchmark suite) is
  broadcast-sized; quadratic-ish and OOM-prone if the index is
  corpus-sized, which is why it is no longer the blanket default.
- ``broadcast_index=False``: band keys explode and the gate is an
  equi-join on band_key — the shape for a corpus-sized index (shuffled
  hash join, no broadcast). A doc colliding in several bands emits once
  per colliding band; the downstream idempotent sink (the F1-guarded
  MERGE) absorbs the duplicates, which is the same at-least-once
  contract the rest of the pipeline already holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.minhash import (
    BANDS,
    NUM_PERM,
    doc_shingles,
    minhash_signature,
)

# Auto-shape ceiling for ``near_dup_gate(broadcast_index=None)``: at or
# below this many distinct index band keys (~40 B each -> low tens of
# MB broadcast) the at-most-once broadcast semi join is used; above it
# the exploded shuffled equi-join. Benchmark decontamination suites are
# thousands of keys; a curated-corpus index is billions — the threshold
# only has to separate those regimes, not be exact.
BROADCAST_INDEX_MAX_KEYS = 1_000_000

# Scan-partition sizing for big accumulated deliveries (VERDICT r12
# item 5, from the measured r12 OOM root-cause): the gate's verify-join
# heap scales with concurrent tasks x spark.sql.files.maxPartitionBytes
# (vectored parquet ranges + decompress) ON TOP of the delivery-sized
# state, so at the stock 128 MB conf an 8 g driver covers accumulated
# deliveries to ~500k docs, while a 1.25M-doc delivery OOMs at 128 MB
# but passes at 32 MB (SCALING.md r12: 107.7 s vs the 16 g/128 MB
# rung's 81.7 s — smaller scan partitions trade ~1.3x latency for half
# the heap). The loop's ``max_partition_bytes="auto"`` therefore
# leaves the conf ALONE up to the measured-safe delivery size (no
# latency tax on the common case) and above it scales it down
# inverse-linearly through the measured-safe 1.25M/32MB anchor,
# floored to keep task counts sane. On a real cluster the same rule
# reads executor-memory / cores-per-executor >> maxPartitionBytes x
# decompress factor.
GATE_MPB_SAFE_DOCS = 500_000
GATE_MPB_ANCHOR_DOCS = 1_250_000
GATE_MPB_ANCHOR_BYTES = 32 * 1024 * 1024
GATE_MPB_FLOOR_BYTES = 8 * 1024 * 1024


def band_keys_frame(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, band_keys array<string>) for a batch or streaming frame —
    the expressions are identical either way."""
    rows = num_perm // bands
    signed = minhash_signature(
        doc_shingles(docs, text_col, id_col, k), num_perm, seed
    )
    keys = F.array(
        *[
            F.concat_ws(
                ",",
                F.lit(str(b)),
                *[
                    F.col("signature")[i].cast("string")
                    for i in range(b * rows, (b + 1) * rows)
                ],
            )
            for b in range(bands)
        ]
    )
    return signed.select("doc_id", keys.alias("band_keys"))


def near_dup_gate(
    stream_docs: DataFrame,
    index_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    seed: int = 42,
    broadcast_index: bool | None = None,
) -> DataFrame:
    """Rows of ``stream_docs`` whose MinHash bands collide with
    ``index_docs`` (LSH candidates — run exact Jaccard downstream if
    the gate must be exact rather than high-recall).

    ``broadcast_index=None`` (default) resolves the join shape from the
    index's distinct band-key count (one count job over the STATIC index
    at gate-construction; the stream side is never counted). Both shapes
    flag the same doc_ids (pinned equal in test_streaming_ops.py); they
    differ only in duplicate emission, see module docstring.
    """
    stream_bands = band_keys_frame(
        stream_docs, text_col, id_col, k, num_perm, bands, seed
    )
    index_keys = (
        band_keys_frame(index_docs, text_col, id_col, k, num_perm, bands, seed)
        .select(F.explode("band_keys").alias("band_key"))
        .distinct()
    )
    if broadcast_index is None:
        broadcast_index = index_keys.count() <= BROADCAST_INDEX_MAX_KEYS
    if broadcast_index:
        return stream_bands.join(
            F.broadcast(index_keys),
            F.array_contains(F.col("band_keys"), F.col("band_key")),
            "left_semi",
        ).select("doc_id")
    exploded = stream_bands.select(
        "doc_id", F.explode("band_keys").alias("band_key")
    )
    return exploded.join(index_keys, "band_key").select("doc_id")


_STAGED_MARKER = "_staged.json"
_GATED_MARKER = "_gated.json"


def _staged_batches(
    spark, staging_root: str
) -> dict[int, tuple[str, str | None]]:
    """batch id -> (staged directory path, stamped lineage), COMMITTED
    stagings only (the ``_staged.json`` marker is written last, so a
    crash mid-staging reads as 'never staged' and the replay re-lands
    it). The lineage is the checkpoint identity stamped at staging time
    (ADVICE r12 item 1); pre-stamp markers read as None."""
    import json

    from ..sources.corpus_sink import _fs_exists, _fs_list_dirs, _fs_read_text

    out: dict[int, tuple[str, str | None]] = {}
    for name in _fs_list_dirs(spark, staging_root):
        if name.startswith("b") and name[1:].isdigit():
            path = f"{staging_root}/{name}"
            if _fs_exists(spark, f"{path}/{_STAGED_MARKER}"):
                try:
                    meta = json.loads(
                        _fs_read_text(spark, f"{path}/{_STAGED_MARKER}")
                    )
                except ValueError:
                    meta = {}
                lin = meta.get("lineage") if isinstance(meta, dict) else None
                out[int(name[1:])] = (path, lin)
    return out


def _gated_state(spark, staging_root: str) -> tuple[int, str | None]:
    """(high-water batch id, stamped lineage) from the ``_gated.json``
    commit marker; (-1, None) when nothing has been gated yet."""
    import json

    from ..sources.corpus_sink import _fs_exists, _fs_read_text

    marker = f"{staging_root}/{_GATED_MARKER}"
    if not _fs_exists(spark, marker):
        return -1, None
    meta = json.loads(_fs_read_text(spark, marker))
    return int(meta["last_gated_batch"]), meta.get("lineage")


def indexed_neardup_gate_sink(
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    max_bucket: int | None = 1000,
    on_batch=None,
    append_admitted: bool = True,
    lock_timeout: float = 60.0,
    auto_compact_segments: int | None = None,
    compact_tier_max_docs: int | None = None,
    accumulate_batches: int = 1,
    staging_path: str | None = None,
    lineage: str | None = None,
    max_partition_bytes: int | str | None = "auto",
):
    """The continuous-curation loop (VERDICT r9 item 4): a foreachBatch
    body that gates every micro-batch against the PERSISTED dedup index
    (operators/minhash.build_dedup_index), hands the split to the
    caller's sinks, and crash-atomically APPENDS the admitted docs so
    the NEXT micro-batch's duplicates of them are rejected::

        stream.writeStream.foreachBatch(
            indexed_neardup_gate_sink(idx, on_batch=land)
        ).option("checkpointLocation", ckpt).start()

    Contracts, all inherited from the index artifact rather than
    re-invented here:

    - **Signature constants come from the index manifest** (the gate
      reads them per batch), so the stream and the index can never
      disagree on k/num_perm/bands/seed — a config drift would
      otherwise silently blind the gate.
    - **Exactly-once index growth** under foreachBatch's at-least-once
      replay: the append is tagged with the micro-batch id
      (``segment_tag``), so a re-delivered batch whose append already
      committed is a no-op, and the gate EXCLUDES the batch's own
      tagged segment from its index view (``exclude_segment_tag``) —
      a replay gates against exactly the index state its first attempt
      saw, so decisions are bit-identical even for WITHIN-BATCH
      duplicates (same text, different ids; an id-equality filter
      alone cannot stop a twin matching the other twin's committed
      copy — found by the r11 curation soak). ``exclude_self`` rides
      along as defense in depth (requires ``id_col`` to be a stable,
      non-null, unique doc key). The tags are keyed by micro-batch id,
      so the INDEX, like the staging area, lives and dies with the
      checkpoint: restarting a wiped checkpoint against an index that
      already holds tags from the old lineage treats genuinely new
      batches as replays (their appends no-op against the old tags —
      and a superseded tagged segment still no-ops the append until
      grace-reclaim actually deletes it). Point a fresh checkpoint at
      a fresh index lineage.
    - **Compaction never absorbs a replayable tag** (VERDICT r11
      item 1): ``auto_compact_segments=N`` makes the loop self-
      maintaining — at the start of any batch that finds >= N live
      segments, it runs compact_dedup_index PROTECTING the current
      batch's tag. foreachBatch is serial, so when batch B runs, every
      earlier batch's checkpoint has committed and only B itself can
      still be replayed — the protected tag is exactly the replayable
      set, so ``exclude_segment_tag`` keeps working across a crash
      that lands between the append commit and the checkpoint commit
      with a compaction on the restart path. Compact this index from
      OUTSIDE the loop only while the stream is stopped.
      ``compact_tier_max_docs`` (VERDICT r12 item 1) makes the policy
      SIZE-TIERED: only live segments with known marker ``n_docs`` at
      or below the threshold count toward the trigger and join the
      merge (compact_dedup_index's ``tier_max_docs`` mode), so a
      policy compaction costs O(docs appended since the last one),
      never O(corpus) — the r12 soak's per-batch wall drifted
      3.64 -> 6.31 s purely from in-loop full rewrites. The base
      segment and frozen tiers accumulate until a FULL compaction is
      run as scheduled maintenance (stream stopped); size the
      threshold around carry-factor x your accumulated-delivery docs
      — a few gate-latency-bounded merges per threshold's worth of
      arrivals.
    - **Sinks before append**: ``on_batch(admitted, rejected, decision,
      batch_id)`` runs first — if the caller's sink fails, the index is
      untouched and the whole batch replays. ``on_batch`` must be
      idempotent per batch_id (the standard foreachBatch contract; an
      exact replay hands it identical frames). ``decision`` is a
      :class:`~...operators.minhash.GateDecision` (COMPOSITION since
      r11, not a DataFrame subclass): DataFrame methods delegate, but
      pass ``decision.df`` anywhere a literal DataFrame is required —
      ``isinstance`` checks, or joining it from another frame.
    - Within-batch near-duplicates are NOT resolved (both admit and
      both land in the index) — same contract as the batch delta gate:
      run the batch dedup pipeline downstream if deliveries can
      self-duplicate.
    - The gate's pinned relations are released per batch (GateDecision)
      — a long-running stream holds O(one batch) cached state.

    **Delivery batching** (VERDICT r11 item 3 — the amortization lever
    the 30M scale entry names): gate latency is dominated by the
    corpus-side scan, which is paid PER GATE, not per document, so at
    extreme corpus:delivery ratios the cheapest schedule is fewer,
    bigger gates. ``accumulate_batches=N`` (with ``staging_path``)
    stages each micro-batch's rows crash-atomically and runs the
    gate+sinks+append cycle once every N batches over their union:

    - each batch lands under ``<staging>/b<id>/`` with a ``_staged``
      marker written LAST (a replayed batch whose staging committed is
      a no-op; a torn staging is invisible and re-lands);
    - the Nth batch (the TRIGGER) gates the union of all staged
      batches above the ``_gated`` high-water, calls ``on_batch`` ONCE
      with the union-derived frames (batch_id = the trigger's), appends
      admitted docs under the trigger's tag, then atomically publishes
      the new high-water. A trigger replayed after its append committed
      re-reads the identical staged files and excludes its own tag, so
      decisions stay bit-identical; a trigger replayed after the
      high-water published sees nothing pending and is a no-op
      (``on_batch`` already ran — the idempotence contract covers it);
    - staged directories at or below the high-water are reclaimed on
      the next call. Scratch held is O(accumulated group), same as the
      ingest staging;
    - **staging lives and dies with the checkpoint**: the high-water is
      keyed by micro-batch id, so wiping or replacing the checkpoint
      while ``staging_path`` survives desynchronizes them — the sink
      detects the unambiguous case (a batch id BELOW the persisted
      high-water) and fails loud instead of silently dropping the
      batch as "already gated". Clear both together.

    Non-trigger batches return without calling ``on_batch`` — sinks see
    data with up to N-1 batches of latency, the knob's explicit trade.

    **Lineage stamping** (ADVICE r12 items 1-2): both "lives and dies
    with the checkpoint" contracts above are ENFORCED, not just
    documented. Every staging marker, the ``_gated`` high-water, and
    every tagged index append carries the stream's CHECKPOINT LINEAGE
    — by default the streaming query id (stable across restarts from
    the same checkpoint, fresh for a wiped/replaced one), resolved per
    batch from the stream-execution thread; ``lineage`` overrides it
    (pass a stable token if you manage checkpoint identity yourself).
    A batch that finds staging markers, a high-water, an already-
    committed tag, or a to-be-excluded tagged segment stamped by a
    DIFFERENT lineage fails loud instead of silently dropping or
    substituting data — including the corner the batch-id ordering
    heuristic cannot see (a stale staged ``b0`` with no high-water
    yet). Pre-stamp artifacts (markers without a lineage field) skip
    the check, preserving the old heuristic-only behavior.

    **Scoped scan-partition control** (VERDICT r12 item 5):
    ``max_partition_bytes`` sets ``spark.sql.files.maxPartitionBytes``
    around each TRIGGER's gate+sinks+append and restores the previous
    value afterwards (exception-safe) — the r12-measured fix for big
    accumulated deliveries OOMing the default heap (heap tracks
    concurrent tasks x scan-partition bytes on top of delivery-sized
    state). ``"auto"`` (default) counts the delivery once per trigger
    and leaves the conf untouched up to GATE_MPB_SAFE_DOCS (~500k docs
    — the measured-safe boundary at stock confs, so the common case
    pays no latency tax), then scales inverse-linearly through the
    measured 1.25M-docs/32MB anchor; an int pins that many bytes for
    every trigger; ``None`` never touches the conf (pre-r13 behavior).
    """
    from ..operators.minhash import (
        _list_segments,
        _live_segments,
        _read_index_manifest,
        build_dedup_index,
        compact_dedup_index,
        delta_dedup_gate_indexed,
    )

    if accumulate_batches < 1:
        raise ValueError("accumulate_batches must be >= 1")
    if accumulate_batches > 1 and staging_path is None:
        raise ValueError("accumulate_batches > 1 requires staging_path")

    def gate_batch(batch_df, batch_id: int) -> None:
        import json

        from ..sources.corpus_sink import (
            _fs_delete,
            _fs_exists,
            _fs_write_text,
        )

        spark = batch_df.sparkSession
        root = index_path.rstrip("/")
        manifest = _read_index_manifest(spark, root)
        if manifest is None:
            raise ValueError(
                f"no dedup index at {index_path!r} — build one with "
                "build_dedup_index(mode='overwrite') before starting "
                "the stream"
            )
        tag = f"batch{batch_id}"
        # the checkpoint-lineage identity every marker/tag is stamped
        # with: the explicit override, else the streaming query id (the
        # stream-execution thread publishes it as a local property;
        # stable across restarts from the same checkpoint, fresh for a
        # wiped one), else None — a direct non-stream invocation, which
        # keeps the pre-stamp heuristic-only behavior
        run_lineage = lineage or spark.sparkContext.getLocalProperty(
            "sql.streaming.queryId"
        )

        def _lineage_desync(what: str, found: str | None) -> ValueError:
            return ValueError(
                f"staging/checkpoint desync at {staging_path!r}: {what} "
                f"was written by checkpoint lineage {found!r}, but this "
                f"stream runs under lineage {run_lineage!r} — staging "
                "lives and dies with the checkpoint; clear the staging "
                "area (or point the stream at a fresh staging_path) "
                "before restarting"
            )

        gate_input = batch_df
        staged_dirs: list[str] = []
        if accumulate_batches > 1:
            staging = staging_path.rstrip("/")
            high_water, gated_lineage = _gated_state(spark, staging)
            if (
                run_lineage is not None
                and gated_lineage is not None
                and gated_lineage != run_lineage
            ):
                # definitive (ADVICE r12 item 1): whatever the batch
                # ids say, this staging area's commit marker belongs to
                # another checkpoint — the ordering heuristic below
                # cannot see the batch_id == high_water corner, the
                # stamp can
                raise _lineage_desync("the _gated high-water", gated_lineage)
            if batch_id < high_water:
                # the staging area belongs to a DIFFERENT stream: batch
                # ids restart below the persisted high-water only when
                # the checkpoint was wiped/replaced while staging_path
                # survived (staging lives and dies with the checkpoint).
                # Proceeding would silently drop this batch's rows as
                # "already gated" — fail loud instead, BEFORE touching
                # the old run's staged directories. Kept alongside the
                # lineage stamp: it also catches pre-stamp staging areas
                # and lineage-unresolvable (direct-call) invocations.
                raise ValueError(
                    f"staging/checkpoint desync: micro-batch {batch_id} "
                    f"is below the staged high-water {high_water} at "
                    f"{staging!r} — this staging area was written by a "
                    "different checkpoint lineage; clear it (or point "
                    "the stream at a fresh staging_path) before "
                    "restarting"
                )
            staged = _staged_batches(spark, staging)
            if run_lineage is not None:
                for sid, (_, slin) in sorted(staged.items()):
                    if slin is not None and slin != run_lineage:
                        # a foreign staged directory — checked BEFORE
                        # this batch stages anything. Covers the
                        # stale-b0 corner (staged by the old lineage,
                        # no high-water yet, ids overlapping ours): a
                        # same-id marker would silently SUBSTITUTE the
                        # old rows for this batch's, a higher-id one
                        # would smuggle them into a later union
                        raise _lineage_desync(
                            f"staged micro-batch b{sid}", slin
                        )
            bdir = f"{staging}/b{batch_id}"
            if not _fs_exists(spark, f"{bdir}/{_STAGED_MARKER}"):
                _fs_delete(spark, bdir)  # torn earlier attempt
                batch_df.write.parquet(bdir)
                _fs_write_text(
                    spark,
                    f"{bdir}/{_STAGED_MARKER}",
                    json.dumps({"lineage": run_lineage}),
                )
                staged[batch_id] = (bdir, run_lineage)
            for done_id in sorted(i for i in staged if i <= high_water):
                _fs_delete(spark, staged.pop(done_id)[0])
            pending = sorted(i for i in staged if i > high_water)
            if len(pending) < accumulate_batches:
                return  # accumulate; the Nth batch gates the union
            staged_dirs = [staged[i][0] for i in pending]
            gate_input = spark.read.parquet(*staged_dirs)

        # scoped scan-partition control (VERDICT r12 item 5): resolve
        # the trigger's maxPartitionBytes override BEFORE any index
        # work so the compaction, the gate's verify scan, and the
        # append all run under it; restored in the outermost finally.
        # The "auto" count is one metadata-cheap job per TRIGGER
        # (non-trigger accumulate batches returned above), paid only
        # because the override must be known before the lazily-built
        # gate plan executes.
        _MPB_KEY = "spark.sql.files.maxPartitionBytes"
        mpb_override: int | None = None
        if max_partition_bytes is not None:
            if max_partition_bytes == "auto":
                n_delivery = gate_input.count()
                if n_delivery > GATE_MPB_SAFE_DOCS:
                    mpb_override = max(
                        GATE_MPB_FLOOR_BYTES,
                        GATE_MPB_ANCHOR_BYTES
                        * GATE_MPB_ANCHOR_DOCS
                        // n_delivery,
                    )
            else:
                mpb_override = int(max_partition_bytes)
        prev_mpb = None
        if mpb_override is not None:
            prev_mpb = spark.conf.get(_MPB_KEY)
            spark.conf.set(_MPB_KEY, mpb_override)
        try:
            _gate_append_publish(spark, gate_input, staged_dirs, tag,
                                 run_lineage, manifest, batch_id)
        finally:
            if mpb_override is not None:
                spark.conf.set(_MPB_KEY, prev_mpb)

    def _gate_append_publish(
        spark, gate_input, staged_dirs, tag, run_lineage, manifest, batch_id
    ):
        import json

        from ..sources.corpus_sink import _fs_write_text_atomic

        root = index_path.rstrip("/")
        # maintenance only ahead of an actual gate+append: non-trigger
        # accumulate batches return above without touching the index,
        # so they skip the per-batch segment listing (and the possible
        # compaction job) entirely — the protected tag is the gating
        # batch's own, which is still exactly the replayable set
        if auto_compact_segments is not None:
            segs = _list_segments(spark, root)
            live = _live_segments(segs, manifest["epoch"])
            if compact_tier_max_docs is not None:
                # tiered policy (VERDICT r12 item 1): trigger on the
                # count of MERGEABLE (small, known-size) segments, not
                # all live ones — base/frozen-tier segments above the
                # threshold are permanent residents the tier merge
                # never touches, so counting them would fire a no-op
                # compaction attempt every batch once they alone reach
                # the threshold
                live = [
                    s
                    for s in live
                    if isinstance(
                        n := (segs[s] or {}).get("n_docs"), int
                    )
                    and not isinstance(n, bool)
                    and 0 <= n <= compact_tier_max_docs
                ]
            if len(live) >= auto_compact_segments:
                compact_dedup_index(
                    spark,
                    index_path,
                    lock_timeout=lock_timeout,
                    protect_segment_tags=[tag],
                    tier_max_docs=compact_tier_max_docs,
                )

        decision = delta_dedup_gate_indexed(
            gate_input,
            index_path,
            text_col,
            id_col,
            threshold=threshold,
            max_bucket=max_bucket,
            exclude_self=True,
            exclude_segment_tag=tag,
            segment_lineage=run_lineage,
        )
        try:
            kept_ids = decision.filter(F.col("kept") == 1).select(
                F.col("doc_id").alias(id_col)
            )
            admitted = gate_input.join(kept_ids, id_col, "left_semi")
            if on_batch is not None:
                rejected = gate_input.join(kept_ids, id_col, "left_anti")
                on_batch(admitted, rejected, decision, batch_id)
            if append_admitted:
                build_dedup_index(
                    admitted,
                    index_path,
                    text_col,
                    id_col,
                    k=manifest["k"],
                    num_perm=manifest["num_perm"],
                    bands=manifest["bands"],
                    seed=manifest["seed"],
                    mode="append",
                    lock_timeout=lock_timeout,
                    segment_tag=tag,
                    lineage=run_lineage,
                )
            if staged_dirs:
                # the accumulated group's COMMIT POINT: a replay after
                # this publish sees nothing pending and no-ops; a crash
                # before it replays the identical staged files
                _fs_write_text_atomic(
                    spark,
                    f"{staging_path.rstrip('/')}/{_GATED_MARKER}",
                    json.dumps(
                        {
                            "last_gated_batch": batch_id,
                            "lineage": run_lineage,
                        }
                    ),
                )
        finally:
            decision.release()

    return gate_batch
