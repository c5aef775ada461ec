"""Continuous-curation loop soak — the operational profile stream_t6
certifies at 2 micro-batches, run for ~50 (VERDICT r10 item 4).

Drives a real checkpointed Structured Streaming query through
``indexed_neardup_gate_sink``: one file per delivery batch, processed
one micro-batch at a time (maxFilesPerTrigger=1), a crash-atomic tagged
index APPEND after every batch, a mid-soak ``compact_dedup_index``
fired from ``on_batch`` — i.e. WHILE that batch's already-resolved gate
decision is still being consumed, exactly the concurrent-gate-during-
compaction window the age-gated reclaim (r11) exists for — and a
KILL/RESTART mid-stream with a forced replay: the stream is stopped
after ~N/3 batches, the NEXT batch's first attempt is executed by
calling the sink body directly with the batch id the restarted stream
will assign — its index append COMMITS, its checkpoint commit does not
(exactly a crash between the two) — and the restarted stream then
re-delivers that batch: the exclude_self + tagged-append idempotence
path under real at-least-once conditions. (Deleting the newest commit
marker instead trips Spark 4's same-JVM concurrent-checkpoint guard.)

Correctness is asserted against a CLOSED-FORM oracle: deliveries are
built from disjoint-vocabulary docs (near-dup == exact text dup at any
threshold, because distinct docs share zero shingles and the gate's
exact-Jaccard verify kills chance band collisions), so the expected
decision for every doc is computable in plain Python — kept iff its
text is not in (base corpus UNION previously-admitted texts), with
within-batch duplicates both admitted (the gate's documented
contract). The soak asserts:

- every decision row (including the replayed batch's duplicate rows)
  matches the closed form — replay is decision-identical;
- the final index census equals the closed form's admitted set;
- the index stays structurally valid throughout (committed markers,
  one live lineage after compaction supersedes, file counts bounded);
- per-batch wall time does not trend up with index growth beyond the
  expected O(index scan) term; subtree RSS high-water stays flat
  (GateDecision.release holds state to O(one batch)).

``--auto-compact=N`` (VERDICT r11 item 4) replaces the manually fired
mid-soak compaction with the sink's own policy: any batch that finds
>= N live segments compacts FIRST, protecting the current batch's tag
(so the kill/restart's forced replay still gates against the index
state its first attempt saw even when a compaction fires between the
two attempts). The soak then additionally asserts the live-segment
sawtooth is bounded (max observed < N + 2 — the on_batch reading is
taken after any compaction but before that batch's own append) and
that at least one policy compaction actually fired.

``--tier-max-docs=M`` (VERDICT r12 item 1) runs the policy in
SIZE-TIERED mode (compact_tier_max_docs=M): in-loop merges touch only
small known-size segments, so per-batch wall stays flat while the base
segment and frozen tiers wait for the end-of-soak FULL compaction (the
scheduled-maintenance stand-in, which still converges to 1 segment).
The sawtooth assertion then applies to the SMALL-segment count (frozen
tiers are permanent residents by design); the soak additionally
asserts the base segment's commit marker is never rewritten.

Usage: python tools/validation/curation_soak.py [n_batches] [docs_per_batch]
       [--auto-compact=N] [--tier-max-docs=M]
       (defaults 50 x 2000; base corpus 20k docs)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from dionysus_rb_spark.operators.minhash import (  # noqa: E402
    _list_segments,
    _live_segments,
    _read_index_manifest,
    build_dedup_index,
    compact_dedup_index,
)
from dionysus_rb_spark.session import get_spark  # noqa: E402
from dionysus_rb_spark.streaming.neardup_stream import (  # noqa: E402
    indexed_neardup_gate_sink,
)
from tools.validation.corpus500k import _RssHighWater  # noqa: E402

_NUMS = [a for a in sys.argv[1:] if not a.startswith("--")]
N_BATCHES = int(_NUMS[0]) if _NUMS else 50
DOCS_PER_BATCH = int(_NUMS[1]) if len(_NUMS) > 1 else 2000
AUTO_COMPACT = next(
    (
        int(a.split("=", 1)[1])
        for a in sys.argv[1:]
        if a.startswith("--auto-compact=")
    ),
    None,
)
TIER_MAX_DOCS = next(
    (
        int(a.split("=", 1)[1])
        for a in sys.argv[1:]
        if a.startswith("--tier-max-docs=")
    ),
    None,
)
if TIER_MAX_DOCS is not None and AUTO_COMPACT is None:
    raise SystemExit("--tier-max-docs requires --auto-compact=N")
BASE_DOCS = 20_000
DUP_OF_BASE = 0.15  # fraction of each batch duplicating base-corpus text
DUP_OF_PRIOR = 0.15  # fraction duplicating an earlier batch's text
WITHIN_BATCH_DUP = 0.05  # fraction duplicating text WITHIN the batch
COMPACT_AT = None  # filled in main(): mid-soak batch id
KILL_AFTER = None  # batches to process before the kill/restart


def _text(n: int) -> str:
    # disjoint 8-word vocabulary per logical doc: near-dup == exact dup
    return " ".join(f"w{n}{c}" for c in "abcdefgh")


def make_batches(n_batches: int, per_batch: int):
    """Deterministic delivery plan: list of (doc_id, text) lists, plus
    the closed-form expected decision for every doc id."""
    base_texts = {_text(i) for i in range(BASE_DOCS)}
    admitted = set(base_texts)
    batches, expected = [], {}
    next_id = 1_000_000
    fresh_n = BASE_DOCS  # counter for fresh vocabulary
    prior_fresh: list[str] = []  # texts introduced by earlier batches
    for b in range(n_batches):
        rows = []
        n_base = int(per_batch * DUP_OF_BASE)
        n_prior = int(per_batch * DUP_OF_PRIOR) if prior_fresh else 0
        n_within = int(per_batch * WITHIN_BATCH_DUP)
        n_fresh = per_batch - n_base - n_prior - n_within
        fresh_texts = []
        for _ in range(n_fresh):
            t = _text(fresh_n)
            fresh_n += 1
            fresh_texts.append(t)
            rows.append((t, None))
        for i in range(n_base):
            # deterministic spread over the base corpus
            rows.append((_text((b * 7919 + i * 104729) % BASE_DOCS), None))
        for i in range(n_prior):
            rows.append((prior_fresh[(b * 31 + i * 17) % len(prior_fresh)], None))
        for i in range(n_within):
            rows.append((fresh_texts[i % len(fresh_texts)], None))
        batch, newly = [], []
        for text, _ in rows:
            doc_id = next_id
            next_id += 1
            batch.append((doc_id, text))
            if text in admitted:
                expected[doc_id] = 0
            else:
                # within-batch dups: ALL admitted (gate checks only the
                # index), and all land in the index afterwards
                expected[doc_id] = 1
                newly.append(text)
        admitted.update(newly)
        prior_fresh.extend(fresh_texts)
        batches.append(batch)
    return batches, expected, admitted


def main() -> None:
    global COMPACT_AT, KILL_AFTER
    COMPACT_AT = N_BATCHES // 2
    KILL_AFTER = max(2, N_BATCHES // 3)
    spark = get_spark("curation-soak")
    root = REPO / ".scratch" / "curation_soak"
    if root.exists():
        shutil.rmtree(root)
    root.mkdir(parents=True)
    idx, src, out, ckpt = (str(root / d) for d in ("idx", "src", "out", "ckpt"))

    base = spark.createDataFrame(
        [(i, _text(i)) for i in range(BASE_DOCS)], "doc_id long, text string"
    )
    t0 = time.time()
    build_dedup_index(base, idx, k=3)
    print(f"base index: {BASE_DOCS} docs in {time.time() - t0:.1f}s")
    base_seg = [
        s for s in _list_segments(spark, idx) if "-overwrite-" in s
    ]
    base_marker = os.path.join(
        idx, "segments", base_seg[0], "_seg_commit.json"
    )
    base_marker_mtime = os.path.getmtime(base_marker)

    batches, expected, admitted_texts = make_batches(N_BATCHES, DOCS_PER_BATCH)
    for i, batch in enumerate(batches):
        spark.createDataFrame(batch, "doc_id long, text string").coalesce(
            1
        ).write.mode("append" if i else "overwrite").parquet(src)
        # one parquet file per delivery: rename into a stable order so
        # maxFilesPerTrigger=1 == one delivery per micro-batch
    # (parquet append lands one part file per write; order by mtime is
    # what the file source uses, and the writes above are sequential)

    rss = _RssHighWater()
    batch_times: dict[int, float] = {}
    seg_counts: list[int] = []
    compactions: list[int] = []

    def on_batch(admitted, rejected, decision, batch_id):
        decision.withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        ).write.mode("append").parquet(out)
        if AUTO_COMPACT is None and batch_id == COMPACT_AT:
            # mid-soak compaction, fired while THIS batch's resolved
            # gate decision is still live — and before this batch's
            # APPEND, whose admitted-frame lineage still reads the now-
            # superseded segments: the age-gated reclaim keeps them on
            # disk for the grace period, so both complete
            compact_dedup_index(spark, idx)
            compactions.append(batch_id)
        # completion stamp; per-batch wall = diff to the previous stamp
        # within a pass (the kill/restart boundary is excluded below)
        batch_times[int(batch_id)] = time.time()
        segs = _list_segments(spark, idx)
        live = _live_segments(segs, 1)
        if TIER_MAX_DOCS is not None:
            # tiered mode: the sawtooth contract covers MERGEABLE
            # (small) segments; base + frozen tiers are permanent
            # residents between full compactions
            live = [
                s
                for s in live
                if isinstance(n := (segs[s] or {}).get("n_docs"), int)
                and not isinstance(n, bool)
                and 0 <= n <= TIER_MAX_DOCS
            ]
        seg_counts.append(len(live))

    def start():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            stream.writeStream.foreachBatch(
                indexed_neardup_gate_sink(
                    idx,
                    threshold=0.5,
                    on_batch=on_batch,
                    auto_compact_segments=AUTO_COMPACT,
                    compact_tier_max_docs=TIER_MAX_DOCS,
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # ---- pass 1: run until ~KILL_AFTER batches, then kill ------------
    t0 = time.time()
    q = start()
    while True:
        done = len(
            [f for f in os.listdir(f"{ckpt}/commits") if f.isdigit()]
        ) if os.path.isdir(f"{ckpt}/commits") else 0
        if done >= KILL_AFTER or not q.isActive:
            break
        if q.exception() is not None:
            raise RuntimeError(q.exception())
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    commits = sorted(
        (f for f in os.listdir(f"{ckpt}/commits") if f.isdigit()), key=int
    )
    # force a REPLAY: execute the NEXT batch's FIRST ATTEMPT by hand —
    # same sink body, same batch id the restarted stream will assign
    # (committed offsets + 1; availableNow processes files in landing
    # order, one per trigger) — so its index append COMMITS while its
    # checkpoint commit never lands: a crash between the two. The
    # restarted stream then re-delivers it.
    replayed = int(commits[-1]) + 1
    src_files = sorted(
        (f"{src}/{f}" for f in os.listdir(src) if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    if replayed >= len(src_files):
        raise RuntimeError(
            f"pass 1 overran: {len(commits)} batches committed before the "
            f"stop landed, no batch left to replay — raise n_batches"
        )
    first_attempt = indexed_neardup_gate_sink(
        idx,
        threshold=0.5,
        on_batch=on_batch,
        auto_compact_segments=AUTO_COMPACT,
        compact_tier_max_docs=TIER_MAX_DOCS,
    )
    first_attempt(spark.read.parquet(src_files[replayed]), replayed)
    print(
        f"pass 1: killed after {len(commits)} batches in "
        f"{time.time() - t0:.1f}s; crashed first attempt of batch "
        f"{replayed} executed (append committed, checkpoint not)"
    )

    # ---- pass 2: restart from the checkpoint, run to completion ------
    t1 = time.time()
    q = start()
    q.awaitTermination()
    wall = time.time() - t1
    print(f"pass 2: completed remaining batches in {wall:.1f}s")

    # ---- assertions ---------------------------------------------------
    dec = spark.read.parquet(out)
    rows = dec.select("doc_id", "kept", "batch_id").collect()
    # the replayed batch appears twice; decisions must be identical
    per_doc: dict[int, set[int]] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], set()).add(r["kept"])
    diverged = {d: k for d, k in per_doc.items() if len(k) > 1}
    assert not diverged, f"replay changed decisions for {len(diverged)} docs"
    n_replayed_rows = len(rows) - len(per_doc)
    assert n_replayed_rows > 0, "the forced replay did not re-deliver"

    wrong = {
        d: (k, expected[d])
        for d, ks in per_doc.items()
        for k in ks
        if expected[d] != k
    }
    assert not wrong, (
        f"{len(wrong)} decisions diverged from the closed form; sample: "
        f"{dict(list(wrong.items())[:5])}"
    )
    assert len(per_doc) == N_BATCHES * DOCS_PER_BATCH

    # final index census == closed form's admitted set
    manifest = _read_index_manifest(spark, idx)
    segs = _list_segments(spark, idx)
    live = _live_segments(segs, manifest["epoch"])
    shingle_paths = [f"{idx}/segments/{s}/shingles" for s in live]
    census = (
        spark.read.parquet(*shingle_paths)
        .select("index_id")
        .distinct()
        .count()
    )
    # distinct index DOCS: base corpus + every kept delivery doc
    # (within-batch duplicates BOTH land — the gate's contract)
    expected_census = BASE_DOCS + sum(expected.values())
    assert census == expected_census, (census, expected_census)
    for s in live:
        assert segs[s] is not None, f"live segment {s} lost its marker"

    if AUTO_COMPACT is not None:
        # policy mode: the sawtooth must be bounded by the threshold
        # (the on_batch reading lands after any policy compaction but
        # before that batch's own append), and the policy must have
        # actually fired at least once (observed as a drop between
        # consecutive readings)
        assert max(seg_counts) < AUTO_COMPACT + 2, (
            f"live-segment sawtooth unbounded under "
            f"auto_compact_segments={AUTO_COMPACT}: {seg_counts}"
        )
        drops = sum(
            1 for a, b in zip(seg_counts, seg_counts[1:]) if b < a
        )
        assert drops >= 1, f"policy never compacted: {seg_counts}"
        print(
            f"auto-compact policy (N={AUTO_COMPACT}): max live segments "
            f"{max(seg_counts)}, {drops} observed compaction drops"
        )
    if TIER_MAX_DOCS is not None:
        # the O(corpus) term really left the loop: the base segment was
        # never rewritten by any in-loop policy compaction
        assert os.path.getmtime(base_marker) == base_marker_mtime, (
            "tiered policy rewrote the base segment inside the loop"
        )

    # a final compaction converges and decisions stay derivable
    compact_dedup_index(spark, idx)
    live_after = _live_segments(_list_segments(spark, idx), manifest["epoch"])
    assert len(live_after) == 1

    stamps = [batch_times[b] for b in sorted(batch_times)]
    diffs = [b - a for a, b in zip(stamps, stamps[1:])]
    # drop the kill/restart boundary (one huge diff) and warmup
    diffs = sorted(diffs)[: len(diffs) - 1]
    times = [
        batch_times[b] - batch_times[b - 1]
        for b in sorted(batch_times)
        if b - 1 in batch_times
        and batch_times[b] - batch_times[b - 1] < 10 * (sum(diffs) / len(diffs))
    ]
    early = sum(times[2:7]) / 5
    late = sum(times[-5:]) / 5
    peak_rss = rss.stop_gb()
    print(
        json.dumps(
            {
                "batches": N_BATCHES,
                "docs_per_batch": DOCS_PER_BATCH,
                "base_docs": BASE_DOCS,
                "replayed_batch": replayed,
                "replayed_rows": n_replayed_rows,
                "compact_at": compactions,
                "auto_compact": AUTO_COMPACT,
                "tier_max_docs": TIER_MAX_DOCS,
                "max_live_segments": max(seg_counts),
                "live_segments_over_time": seg_counts[:: max(1, len(seg_counts) // 10)],
                "batch_secs_early_avg": round(early, 2),
                "batch_secs_late_avg": round(late, 2),
                "rss_high_water_gb": round(peak_rss, 2),
                "final_census": census,
            }
        )
    )
    print("curation soak: ALL ASSERTIONS PASSED")


if __name__ == "__main__":
    main()
