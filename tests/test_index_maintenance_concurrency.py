"""Age-gated reclaim: index maintenance concurrent with live gates and
lock-less writers (VERDICT r10 item 1).

The crash-enum suite (test_dedup_index_crash_enum.py) proves every
interruption of a build/append/compaction yields exactly the pre- or
post-state — under IMMEDIATE reclaim (ttl/grace 0), the single-writer
regime. This suite certifies the operational contract the continuous
curation loop actually needs, where maintenance runs alongside gating:

1. a YOUNG uncommitted segment directory — on lock-less (non-local)
   storage this could be a CONCURRENT writer mid-landing, not crash
   debris — survives every maintenance pass until it is older than
   ``reclaim_ttl``;
2. a gate that resolved its live-segment list BEFORE a compaction
   commits still completes its deferred parquet reads (the superseded
   directories outlive the commit by ``reclaim_grace``), and its
   decisions equal the pre-compaction — i.e. the only — semantics;
3. the same pre-resolve window across an OVERWRITE's epoch switch: the
   old epoch's segments keep serving an already-resolved gate for the
   grace period;
4. aged-out debris IS reclaimed (the gates defer deletion, they do not
   leak disk), and the deferred grace-reclaim is itself crash-safe at
   every delete (decisions never move — re-using the crash-enum
   instrumentation on the aged tree).
"""

from __future__ import annotations

import os
import time

from test_dedup_index_crash_enum import (
    _Crasher,
    _frames,
    _indexed_decisions,
    _inline_decisions,
    _InjectedCrash,
    _instrumented,
)

from dionysus_rb_spark.operators.minhash import (
    _SEG_COMMIT,
    _live_segments,
    _list_segments,
    build_dedup_index,
    compact_dedup_index,
    delta_dedup_gate_indexed,
)

_OLD = time.time() - 30 * 86400  # "a month ago" — far past any gate


def _age(path: str) -> None:
    # recursive: directory age is judged by the NEWEST FILE under it
    # (ADVICE r11 item 2 — object stores fake directory statuses), so
    # aging a directory must age its contents too
    os.utime(path, (_OLD, _OLD))
    if os.path.isdir(path):
        for root, dirs, files in os.walk(path):
            for n in (*dirs, *files):
                os.utime(os.path.join(root, n), (_OLD, _OLD))


def _seg_dirs(idx: str) -> list[str]:
    seg = os.path.join(idx, "segments")
    return sorted(os.listdir(seg)) if os.path.isdir(seg) else []


def test_young_uncommitted_dir_survives_until_ttl(spark, tmp_path):
    """An uncommitted (markerless) segment directory is only reclaimed
    once older than the TTL — a concurrent in-flight append on storage
    where the flock degrades to nullcontext can never be deleted
    mid-write by another writer's maintenance pass."""
    base, batch, probe = _frames(spark)
    idx = str(tmp_path / "idx")
    build_dedup_index(base, idx, k=3)

    # another writer's in-flight append: directory exists, marker not
    # yet created (exactly what a concurrent build looks like between
    # its first parquet write and its commit)
    inflight = os.path.join(idx, "segments", "e1-append-otherwriter")
    os.makedirs(os.path.join(inflight, "shingles"))
    with open(os.path.join(inflight, "shingles", "part-0.parquet"), "wb") as f:
        f.write(b"partial")

    pre = _indexed_decisions(probe, idx)  # uncommitted == invisible
    build_dedup_index(batch, idx, k=3, mode="append")  # default TTL
    assert os.path.isdir(inflight), (
        "a YOUNG uncommitted directory must survive maintenance — it "
        "may be a concurrent writer mid-landing"
    )

    # once aged past the TTL it is crash debris and is reclaimed
    _age(inflight)
    build_dedup_index(batch.limit(0), idx, k=3, mode="append")
    assert not os.path.isdir(inflight)
    post = _inline_decisions(probe, base.unionByName(batch))
    assert _indexed_decisions(probe, idx) == post
    assert pre != post  # the probe actually distinguishes the states


def test_inflight_dir_with_fresh_files_survives_fake_dir_mtime(
    spark, tmp_path
):
    """ADVICE r11 item 2: directory aging must key on the newest FILE
    mtime, not the directory status — S3A-style object stores report
    fake-directory mtimes of 0 ("infinitely old": an in-flight writer's
    directory would be reclaimed under it immediately). Simulated by
    zeroing the DIRECTORY mtimes while the file inside stays fresh."""
    base, batch, probe = _frames(spark)
    idx = str(tmp_path / "idx")
    build_dedup_index(base, idx, k=3)

    inflight = os.path.join(idx, "segments", "e1-append-otherwriter")
    os.makedirs(os.path.join(inflight, "shingles"))
    with open(
        os.path.join(inflight, "shingles", "part-0.parquet"), "wb"
    ) as f:
        f.write(b"partial")  # fresh file: the writer is mid-landing
    os.utime(inflight, (0, 0))  # the S3A fake-directory lie
    os.utime(os.path.join(inflight, "shingles"), (0, 0))

    build_dedup_index(batch, idx, k=3, mode="append")  # default TTL
    assert os.path.isdir(inflight), (
        "a directory whose newest FILE is fresh is an in-flight writer "
        "— a lying directory mtime must not get it reclaimed"
    )
    _age(inflight)  # now the files are old too: genuine crash debris
    build_dedup_index(batch.limit(0), idx, k=3, mode="append")
    assert not os.path.isdir(inflight)


def test_committed_orphan_never_resurrected_by_overwrite_retry(
    spark, tmp_path
):
    """ADVICE r11 item 1: an overwrite that COMMITTED its segment
    (marker landed) but crashed before the manifest publish leaves a
    committed next-epoch orphan, which the default reclaim TTL rightly
    spares (on lock-less storage it could be a concurrent writer). A
    RETRIED overwrite must therefore never reuse the orphan's epoch —
    otherwise the moment the retry's manifest commits, the orphan's
    stale docs silently join the live set and corrupt gate decisions.
    The fix picks the retry epoch past every on-disk segment."""
    from dionysus_rb_spark.operators import minhash as _mh

    base, batch, probe = _frames(spark)
    # corpus B holds the probe's _NEW twin: if B's orphan were ever
    # resurrected, probe doc 101 would flip to rejected
    corpus_b = batch  # [(10, _NEW)]
    corpus_c = spark.createDataFrame(
        [(60, "entirely different third corpus words never probed")],
        "doc_id long, text string",
    )

    budget = 0
    while True:
        budget += 1
        idx = str(tmp_path / f"orph{budget}")
        build_dedup_index(base, idx, k=3)
        crasher = _Crasher(budget)
        completed = False
        with _instrumented(crasher):
            try:
                # DEFAULT reclaim TTL — the regime the crash-enum
                # suite's ttl=0 pin cannot see
                _mh.build_dedup_index(corpus_b, idx, k=3, mode="overwrite")
                completed = True
            except _InjectedCrash:
                pass
        assert not completed, "crasher must fire before the build ends"
        if crasher.ops[-1].startswith("manifest"):
            break  # crashed BETWEEN the marker commit and the publish
    # the orphan is committed on disk at epoch 2, manifest still epoch 1
    segs = _list_segments(spark, idx)
    assert any(
        meta is not None and s.startswith("e2-") for s, meta in segs.items()
    ), "setup: the crashed overwrite must have committed its segment"

    _mh.build_dedup_index(corpus_c, idx, k=3, mode="overwrite")  # retry
    want = _inline_decisions(probe, corpus_c)
    assert _indexed_decisions(probe, idx) == want, (
        "the retried overwrite resurrected the crashed attempt's "
        "committed orphan into the live index"
    )
    manifest = _mh._read_index_manifest(spark, idx)
    live = _live_segments(_list_segments(spark, idx), manifest["epoch"])
    assert len(live) == 1 and manifest["epoch"] == 3, (
        "retry must take an epoch past the orphan's, making it a "
        "prior-epoch segment for grace reclaim"
    )


def test_gate_outliving_grace_fails_loud_not_wrong(spark, tmp_path):
    """VERDICT r11 item 5: sizing contract for ``reclaim_grace`` — a
    gate whose deferred reads outlive the grace window must fail LOUDLY
    (missing-file read error), never return a silently wrong decision
    set. Gate latency is linear in the corpus (SCALING.md ladder: ~7 s
    at 1M, ~48 s at 10M, 139.8 s at 30M for a 258k delivery), so
    deployments size grace >= a few multiples of their decade's
    measured gate latency; this pins what happens when they get it
    wrong."""
    import pytest

    base, batch, probe = _frames(spark)
    idx = str(tmp_path / "idx")
    build_dedup_index(base, idx, k=3)
    build_dedup_index(batch, idx, k=3, mode="append")

    gate = delta_dedup_gate_indexed(probe, idx, threshold=0.5)
    try:
        # grace=0 models "the gate outlived the window": the superseded
        # segments the gate resolved are reclaimed mid-flight
        compact_dedup_index(spark, idx, reclaim_grace=0)
        with pytest.raises(Exception) as excinfo:
            gate.collect()
        msg = str(excinfo.value)
        assert any(
            s in msg
            for s in ("FileNotFound", "does not exist", "FILE_NOT_EXIST")
        ), f"expected a loud missing-file failure, got: {msg[:500]}"
    finally:
        gate.release()


def test_gate_resolved_before_compaction_still_reads(spark, tmp_path):
    """The concurrent-gate-during-compaction matrix: a gate constructed
    (= segment list resolved, parquet relations planned) BEFORE
    compaction commits must still complete its reads and return the
    exact same decisions afterwards — the superseded directories
    outlive the commit by the grace period."""
    base, batch, probe = _frames(spark)
    idx = str(tmp_path / "idx")
    build_dedup_index(base, idx, k=3)
    build_dedup_index(batch, idx, k=3, mode="append")
    want = _inline_decisions(probe, base.unionByName(batch))

    gate = delta_dedup_gate_indexed(probe, idx, threshold=0.5)
    try:
        compact_dedup_index(spark, idx)  # default grace: defers deletes
        # the superseded segments are still on disk for the resolved gate
        assert len(_seg_dirs(idx)) == 3  # base + append + merged
        got = sorted(
            (r["doc_id"], r["n_dup_matches"], r["kept"])
            for r in gate.collect()
        )
        assert got == want, "pre-resolved gate must read the superseded tree"
    finally:
        gate.release()

    # a gate resolved AFTER the commit sees exactly one live segment
    segs = _list_segments(spark, idx)
    live = _live_segments(segs, 1)
    assert len(live) == 1 and live[0].startswith("e1-compact-")
    assert _indexed_decisions(probe, idx) == want


def test_gate_resolved_before_overwrite_epoch_switch(spark, tmp_path):
    """Same pre-resolve window across an overwrite: the old epoch's
    segments keep serving an already-constructed gate for the grace
    period after the manifest's atomic epoch switch."""
    base, batch, probe = _frames(spark)
    idx = str(tmp_path / "idx")
    build_dedup_index(base, idx, k=3)
    old_want = _indexed_decisions(probe, idx)

    gate = delta_dedup_gate_indexed(probe, idx, threshold=0.5)
    try:
        build_dedup_index(batch, idx, k=3, mode="overwrite")  # epoch 2
        got = sorted(
            (r["doc_id"], r["n_dup_matches"], r["kept"])
            for r in gate.collect()
        )
        assert got == old_want, (
            "gate resolved pre-switch must keep reading epoch 1"
        )
    finally:
        gate.release()
    assert _indexed_decisions(probe, idx) == _inline_decisions(probe, batch)


def test_aged_debris_is_reclaimed_and_reclaim_is_crash_safe(spark, tmp_path):
    """Grace defers deletion, it does not leak: once the superseding
    marker (and the manifest, for old-epoch segments) is older than the
    grace period, the next maintenance pass deletes the dead
    directories — and a crash at EVERY one of those deferred deletes
    leaves decisions unchanged (leaves-first order, enumerated)."""
    base, batch, probe = _frames(spark)
    idx = str(tmp_path / "idx")
    build_dedup_index(base, idx, k=3)
    build_dedup_index(batch, idx, k=3, mode="append")
    want = _inline_decisions(probe, base.unionByName(batch))
    compact_dedup_index(spark, idx)  # superseded stay (grace)
    assert len(_seg_dirs(idx)) == 3

    # age the merged segment's marker so the grace window has passed
    (merged,) = [s for s in _seg_dirs(idx) if "-compact-" in s]
    _age(os.path.join(idx, "segments", merged, _SEG_COMMIT))

    # enumerate crashes through the deferred reclaim's deletes
    budget = 0
    while True:
        budget += 1
        crasher = _Crasher(budget)
        completed = False
        with _instrumented(crasher):
            try:
                compact_dedup_index(spark, idx)
                completed = True
            except _InjectedCrash:
                pass
        assert _indexed_decisions(probe, idx) == want, (
            f"grace-reclaim crash before op {budget} "
            f"({crasher.ops[-1]}) changed gate decisions"
        )
        if completed:
            break
    assert budget >= 3, "expected >= 2 deferred deletes enumerated"
    assert _seg_dirs(idx) == [merged], "aged superseded dirs reclaimed"
    assert _indexed_decisions(probe, idx) == want
