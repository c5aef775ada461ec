"""Exhaustive crash-point enumeration for the persisted dedup index.

VERDICT r9 item 1 / ADVICE r9 item 1: the pre-segment index landed its
bands relation BEFORE its shingle relation with no commit marker, so a
crash between the two writes left band rows whose candidates silently
vanished in the verify join — a true duplicate of a half-appended doc
was ADMITTED, the one failure mode the gate exists to prevent, and
nothing ever surfaced it. The segment layout's claim is the opposite:
every interruption point of a build, append, or compaction yields
either the exact pre-operation index or the exact post-operation index
(commit = one marker/manifest publish), and a retry converges.

This suite removes hand-picking exactly like the corpus sink's
test_compaction_crash_enum: it instruments every index mutation —
parquet relation writes, marker creation, manifest publish, reclaim
deletes — and crashes immediately BEFORE the N-th one for EVERY N,
asserting after each crash that the gate's admit/reject decisions over
a fixed probe delivery equal the pre- or post-state decisions computed
by the INLINE gate (the oracle-certified semantics), never a third
thing. Matrices:

1. append — every mutation, plus a TORN-MARKER variant (the marker
   file exists but holds truncated JSON: a reader must treat it as
   uncommitted, not crash or half-read);
2. overwrite over a live index — the manifest publish is the epoch
   switch, so every earlier crash must keep serving the OLD corpus's
   decisions in full (ADVICE r9's stale-manifest scenario);
3. compaction — decisions must be invariant at every crash point, the
   superseded segments must never be resurrected (leaves-first
   reclaim), and a crash DURING the reclaim of a previous crash's
   debris (the double-crash / crash-looping case) must converge too.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import pytest

from dionysus_rb_spark.operators import minhash as _mh
from dionysus_rb_spark.operators.minhash import (
    delta_dedup_gate,
    delta_dedup_gate_indexed,
)


def build_dedup_index(*a, **kw):
    """Suite-local pin of the IMMEDIATE-reclaim semantics (ttl/grace
    0): this suite enumerates crash points of the reclaim deletes
    themselves, which the age gates would otherwise defer. The age-
    gated contract (young debris survives, superseded segments outlive
    a concurrent gate) has its own suite,
    test_index_maintenance_concurrency.py."""
    kw.setdefault("reclaim_ttl", 0.0)
    kw.setdefault("reclaim_grace", 0.0)
    return _mh.build_dedup_index(*a, **kw)


def compact_dedup_index(*a, **kw):
    kw.setdefault("reclaim_ttl", 0.0)
    kw.setdefault("reclaim_grace", 0.0)
    return _mh.compact_dedup_index(*a, **kw)
from dionysus_rb_spark.sources import corpus_sink


class _InjectedCrash(Exception):
    pass


class _Crasher:
    """Counts index mutations; raises before op #budget (1-indexed).
    ``torn_marker`` turns the crash AT a marker write into a torn
    write: half the JSON lands, then the crash."""

    def __init__(self, budget: int | None, torn_marker: bool = False):
        self.budget = budget
        self.torn_marker = torn_marker
        self.ops: list[str] = []

    def tick(self, name: str) -> bool:
        """True -> proceed with the op; raises at the crash point.
        Returns False only for the torn-marker half-write signal."""
        self.ops.append(name)
        if self.budget is not None and len(self.ops) == self.budget:
            if self.torn_marker and name.startswith("marker"):
                return False  # caller half-writes, then we raise
            raise _InjectedCrash(f"crash before op {len(self.ops)}: {name}")
        return True


@contextmanager
def _instrumented(crasher: _Crasher):
    from pyspark.sql.readwriter import DataFrameWriter

    orig_parquet = DataFrameWriter.parquet
    orig_write = corpus_sink._fs_write_text
    orig_atomic = corpus_sink._fs_write_text_atomic
    orig_delete = corpus_sink._fs_delete

    def parquet(self, path, *a, **kw):
        crasher.tick(f"parquet:{os.path.basename(path)}")
        return orig_parquet(self, path, *a, **kw)

    def write_text(spark, path, text):
        name = os.path.basename(path)
        kind = "marker" if name == "_seg_commit.json" else f"write:{name}"
        if not crasher.tick(kind):
            orig_write(spark, path, text[: len(text) // 2])
            raise _InjectedCrash("torn marker write")
        return orig_write(spark, path, text)

    def write_atomic(spark, path, text):
        crasher.tick(f"manifest:{os.path.basename(path)}")
        return orig_atomic(spark, path, text)

    def delete(spark, path):
        crasher.tick(f"delete:{os.path.basename(path)}")
        return orig_delete(spark, path)

    DataFrameWriter.parquet = parquet
    corpus_sink._fs_write_text = write_text
    corpus_sink._fs_write_text_atomic = write_atomic
    corpus_sink._fs_delete = delete
    try:
        yield
    finally:
        DataFrameWriter.parquet = orig_parquet
        corpus_sink._fs_write_text = orig_write
        corpus_sink._fs_write_text_atomic = orig_atomic
        corpus_sink._fs_delete = orig_delete


_BASE = "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8"
_NEW = "completely fresh content never indexed before anywhere today ok"
_OTHER = "some other totally distinct batch of words landing second here"


def _frames(spark):
    base = spark.createDataFrame(
        [(1, _BASE), (2, "unrelated filler words nothing shared with any")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame([(10, _NEW)], "doc_id long, text string")
    # the probe delivery whose decisions DIFFER pre/post append: dup of
    # the base corpus (always rejected), dup of the appended batch
    # (rejected only once the append committed), and a fresh doc
    probe = spark.createDataFrame(
        [(100, _BASE), (101, _NEW), (102, "wholly novel probe text here yes")],
        "doc_id long, text string",
    )
    return base, batch, probe


def _indexed_decisions(probe, idx):
    with delta_dedup_gate_indexed(probe, idx, threshold=0.5) as d:
        return sorted(
            (r["doc_id"], r["n_dup_matches"], r["kept"]) for r in d.collect()
        )


def _inline_decisions(probe, corpus):
    with delta_dedup_gate(probe, corpus, threshold=0.5) as d:
        return sorted(
            (r["doc_id"], r["n_dup_matches"], r["kept"]) for r in d.collect()
        )


def _committed_segments(idx: str) -> list[str]:
    seg = os.path.join(idx, "segments")
    if not os.path.isdir(seg):
        return []
    return sorted(
        n
        for n in os.listdir(seg)
        if os.path.exists(os.path.join(seg, n, "_seg_commit.json"))
    )


@pytest.mark.parametrize("torn_marker", [False, True])
def test_append_crash_at_every_mutation(spark, tmp_path, torn_marker):
    base, batch, probe = _frames(spark)
    pre = _inline_decisions(probe, base)
    post = _inline_decisions(probe, base.unionByName(batch))
    assert pre != post, "probe must distinguish pre/post append"

    budget = 0
    while True:
        budget += 1
        idx = str(tmp_path / f"append{int(torn_marker)}_{budget}")
        build_dedup_index(base, idx, k=3)
        assert _indexed_decisions(probe, idx) == pre

        crasher = _Crasher(budget, torn_marker=torn_marker)
        completed = False
        with _instrumented(crasher):
            try:
                build_dedup_index(batch, idx, k=3, mode="append")
                completed = True
            except _InjectedCrash:
                pass
        if completed:
            assert _indexed_decisions(probe, idx) == post
            assert budget > len(crasher.ops)
            break
        # ATOMICITY: every interruption point yields exactly the
        # pre-append decisions — the half-appended silent-admit state
        # cannot exist (a segment without a parseable marker is not a
        # segment)
        assert _indexed_decisions(probe, idx) == pre, (
            f"crash before op {budget} ({crasher.ops[-1]}) leaked a "
            "partial append into the gate"
        )
        # RETRY converges: the next append reclaims the debris and lands
        build_dedup_index(batch, idx, k=3, mode="append")
        assert _indexed_decisions(probe, idx) == post
        assert len(_committed_segments(idx)) == 2  # base + the one append
    assert budget >= 4, "expected >= 3 mutations in an append"


def test_overwrite_crash_keeps_old_epoch_serving(spark, tmp_path):
    """A rebuild dying over a LIVE index must keep serving the old
    corpus's decisions in full until the single manifest publish —
    including the stale-manifest window ADVICE r9 called out (new bands
    landed, old manifest still matching)."""
    base, batch, probe = _frames(spark)
    corpus_b = spark.createDataFrame(
        [(50, _OTHER)], "doc_id long, text string"
    )
    pre = _inline_decisions(probe, base)
    post = _inline_decisions(probe, corpus_b)
    assert pre != post

    budget = 0
    while True:
        budget += 1
        idx = str(tmp_path / f"ow{budget}")
        build_dedup_index(base, idx, k=3)

        crasher = _Crasher(budget)
        completed = False
        manifest_published = False
        with _instrumented(crasher):
            try:
                build_dedup_index(corpus_b, idx, k=3, mode="overwrite")
                completed = True
            except _InjectedCrash:
                manifest_published = any(
                    op.startswith("manifest") for op in crasher.ops[:-1]
                )
        if completed:
            assert _indexed_decisions(probe, idx) == post
            break
        want = post if manifest_published else pre
        assert _indexed_decisions(probe, idx) == want, (
            f"crash before op {budget} ({crasher.ops[-1]}): epoch switch "
            "must be atomic at the manifest publish"
        )
        # retry converges regardless of where the first attempt died;
        # the old epoch's segment may legitimately remain on disk until
        # the next reclaim pass (it was the LIVE epoch while the retry
        # ran) — it is invisible to readers, and compaction sweeps it
        build_dedup_index(corpus_b, idx, k=3, mode="overwrite")
        assert _indexed_decisions(probe, idx) == post
        compact_dedup_index(spark, idx)
        assert len(_committed_segments(idx)) == 1
        assert _indexed_decisions(probe, idx) == post
    assert budget >= 5, "expected >= 4 mutations in an overwrite"


def test_compact_crash_decisions_invariant_incl_double_crash(spark, tmp_path):
    """Compaction must be decision-invariant at EVERY crash point (the
    merged segment's marker names its victims, so readers never see
    both), superseded segments must never resurrect, and recovery of a
    crashed compaction must itself survive a crash at every mutation
    (the crash-looping compactor — the matrix that found the corpus
    sink's re-entrancy hole)."""
    base, batch, probe = _frames(spark)
    batch2 = spark.createDataFrame([(20, _OTHER)], "doc_id long, text string")
    full = base.unionByName(batch).unionByName(batch2)
    want = _inline_decisions(probe, full)

    def fresh_index(tag: str) -> str:
        idx = str(tmp_path / f"cp{tag}")
        build_dedup_index(base, idx, k=3)
        build_dedup_index(batch, idx, k=3, mode="append")
        build_dedup_index(batch2, idx, k=3, mode="append")
        return idx

    budget = 0
    while True:
        budget += 1
        idx = fresh_index(str(budget))
        assert _indexed_decisions(probe, idx) == want
        crasher = _Crasher(budget)
        completed = False
        with _instrumented(crasher):
            try:
                compact_dedup_index(spark, idx)
                completed = True
            except _InjectedCrash:
                pass
        assert _indexed_decisions(probe, idx) == want, (
            f"compaction crash before op {budget} ({crasher.ops[-1]}) "
            "changed gate decisions"
        )
        if completed:
            assert len(_committed_segments(idx)) == 1
            break

        # DOUBLE CRASH: a second compaction (which first reclaims the
        # debris) dies at every one of ITS mutations; decisions must
        # still never move, and a final run must converge to 1 segment
        inner = 0
        while True:
            inner += 1
            crasher2 = _Crasher(inner)
            done2 = False
            with _instrumented(crasher2):
                try:
                    compact_dedup_index(spark, idx)
                    done2 = True
                except _InjectedCrash:
                    pass
            assert _indexed_decisions(probe, idx) == want, (
                f"double-crash (first at {budget}, second before op "
                f"{inner}: {crasher2.ops[-1]}) changed gate decisions"
            )
            if done2:
                break
        compact_dedup_index(spark, idx)  # idempotent once converged
        assert len(_committed_segments(idx)) == 1
        assert _indexed_decisions(probe, idx) == want
    assert budget >= 6, "expected >= 5 mutations in a 3-segment compaction"
