"""Size-tiered dedup-index compaction (VERDICT r12 item 1).

The streaming loop's policy compaction was a FULL rewrite — O(corpus)
inside the loop's latency budget (the r12 soak's per-batch wall curve,
3.64 -> 6.31 s, is the growth term). Tiered mode merges only small,
known-size segments under the TIER_CARRY_FACTOR carry rule, so an
in-loop merge costs O(docs appended since the last one) and the
O(corpus) merge moves to scheduled maintenance. These tests pin:

- the pure policy (_tier_merge_group): who merges, who is left alone,
  determinism, the carry rule's geometric re-merge behavior;
- decision identity: a tier merge never changes gate decisions, at
  every crash point (the crash-enum matrix, extended to tier merges);
- the loop integration: compact_tier_max_docs keeps the small-segment
  sawtooth bounded while the base segment is NEVER rewritten.

Reference basis: the reference has no persisted LSH index (its dedup
surface is per-query); this artifact and its maintenance policy are
part of the beyond-reference LLM-pipeline family (SURVEY §2 addendum).
"""

from __future__ import annotations

import os

import pytest

from dionysus_rb_spark.operators import minhash as _mh
from dionysus_rb_spark.operators.minhash import (
    _list_segments,
    _live_segments,
    _read_index_manifest,
    _tier_merge_group,
    delta_dedup_gate,
    delta_dedup_gate_indexed,
)


def build_dedup_index(*a, **kw):
    kw.setdefault("reclaim_ttl", 0.0)
    kw.setdefault("reclaim_grace", 0.0)
    return _mh.build_dedup_index(*a, **kw)


def compact_dedup_index(*a, **kw):
    kw.setdefault("reclaim_ttl", 0.0)
    kw.setdefault("reclaim_grace", 0.0)
    return _mh.compact_dedup_index(*a, **kw)


# ---------------------------------------------------------------------------
# pure policy
# ---------------------------------------------------------------------------


def test_tier_group_same_size_appends_all_merge():
    sizes = {"e1-append-b3": 100, "e1-append-b1": 100, "e1-append-b2": 100}
    assert _tier_merge_group(sizes, 10_000) == [
        "e1-append-b1",
        "e1-append-b2",
        "e1-append-b3",
    ]


def test_tier_group_excludes_base_and_frozen_tiers():
    sizes = {
        "e1-overwrite-base": 1_000_000,  # above threshold: untouched
        "e1-compact-frozen": 50_000,  # grew past threshold: frozen
        "e1-append-b1": 100,
        "e1-append-b2": 120,
    }
    assert _tier_merge_group(sizes, 10_000) == ["e1-append-b1", "e1-append-b2"]


def test_tier_group_unknown_sizes_left_to_full_compaction():
    sizes = {"e1-append-b1": None, "e1-append-b2": 100, "e1-append-b3": 90}
    assert _tier_merge_group(sizes, 10_000) == ["e1-append-b3", "e1-append-b2"]
    # bool is an int subclass; a corrupt marker must read as unknown
    assert _tier_merge_group({"a": True, "b": 5, "c": 5}, 10) == ["b", "c"]
    assert _tier_merge_group({"a": -3, "b": 5, "c": 5}, 10) == ["b", "c"]


def test_tier_group_singleton_never_merges():
    assert _tier_merge_group({"e1-append-b1": 100}, 10_000) == []
    assert _tier_merge_group({}, 10_000) == []
    # one small + one too-big-to-carry: wait for more smalls
    assert _tier_merge_group({"small": 10, "open": 1000}, 10_000) == []


def test_tier_group_carry_rule_is_geometric():
    # open tier of 1000 docs re-merges only once the accumulated small
    # segments can "carry" it (sum >= open/FACTOR, FACTOR=4)
    appends = {f"a{i}": 50 for i in range(4)}  # 200 docs: 1000 > 4*200? no
    assert "open" in _tier_merge_group({**appends, "open": 800}, 10_000)
    assert "open" not in _tier_merge_group({**appends, "open": 801}, 10_000)
    # the group still merges the smalls while the open tier waits
    assert _tier_merge_group({**appends, "open": 801}, 10_000) == [
        "a0",
        "a1",
        "a2",
        "a3",
    ]


# ---------------------------------------------------------------------------
# decision identity + structure on a real index
# ---------------------------------------------------------------------------

_BASE = "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8"
_N1 = "wholly fresh first append words never indexed anywhere before"
_N2 = "second appended batch of entirely new and different words here"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _decisions(probe, idx):
    with delta_dedup_gate_indexed(probe, idx, threshold=0.5) as d:
        return sorted(
            (r["doc_id"], r["n_dup_matches"], r["kept"]) for r in d.collect()
        )


def test_tier_compaction_merges_appends_leaves_base(spark, tmp_path):
    base = _mk(spark, [(i, f"{_BASE} tail{i}a tail{i}b") for i in range(8)])
    idx = str(tmp_path / "idx")
    build_dedup_index(base, idx, k=3)
    build_dedup_index(_mk(spark, [(10, _N1)]), idx, k=3, mode="append")
    build_dedup_index(_mk(spark, [(11, _N2)]), idx, k=3, mode="append")

    probe = _mk(spark, [(100, _N1), (101, _N2), (102, "novel probe words")])
    corpus = base.unionByName(_mk(spark, [(10, _N1), (11, _N2)]))
    with delta_dedup_gate(probe, corpus, threshold=0.5) as d:
        want = sorted(
            (r["doc_id"], r["n_dup_matches"], r["kept"]) for r in d.collect()
        )
    assert _decisions(probe, idx) == want

    segs_before = _list_segments(spark, idx)
    base_seg = [s for s in segs_before if "-overwrite-" in s]
    assert len(base_seg) == 1

    # appends are 1 doc each (< threshold); the 8-doc base is above it
    compact_dedup_index(spark, idx, tier_max_docs=4)
    manifest = _read_index_manifest(spark, idx)
    live = _live_segments(_list_segments(spark, idx), manifest["epoch"])
    assert base_seg[0] in live, "tier merge must not touch the base segment"
    merged = [s for s in live if "-compact-" in s]
    assert len(merged) == 1 and len(live) == 2
    meta = _list_segments(spark, idx)[merged[0]]
    assert meta["n_docs"] == 2 and set(meta["supersedes"]) == {
        s for s in segs_before if "-append-" in s
    }
    assert _decisions(probe, idx) == want

    # idempotent: nothing small left to merge (the merged pair is 2
    # docs <= threshold but it is a singleton candidate)
    compact_dedup_index(spark, idx, tier_max_docs=4)
    assert (
        _live_segments(_list_segments(spark, idx), manifest["epoch"]) == live
    )

    # full compaction (scheduled maintenance) still converges to 1
    compact_dedup_index(spark, idx)
    assert (
        len(_live_segments(_list_segments(spark, idx), manifest["epoch"]))
        == 1
    )
    assert _decisions(probe, idx) == want


def test_tier_compaction_respects_protected_tags(spark, tmp_path):
    base = _mk(spark, [(1, _BASE)])
    idx = str(tmp_path / "idx")
    build_dedup_index(base, idx, k=3)
    build_dedup_index(
        _mk(spark, [(10, _N1)]), idx, k=3, mode="append", segment_tag="b7"
    )
    build_dedup_index(_mk(spark, [(11, _N2)]), idx, k=3, mode="append")
    build_dedup_index(
        _mk(spark, [(12, "third fresh append of distinct words again")]),
        idx,
        k=3,
        mode="append",
    )
    compact_dedup_index(
        spark, idx, tier_max_docs=100, protect_segment_tags=["b7"]
    )
    manifest = _read_index_manifest(spark, idx)
    live = _live_segments(_list_segments(spark, idx), manifest["epoch"])
    assert any(s.endswith("-append-b7") for s in live), (
        "a protected (replayable) tag must survive a tier merge"
    )
    # the base (1 doc, under threshold) and the two unprotected appends
    # merged; protected tag stands apart
    assert len(live) == 2


# ---------------------------------------------------------------------------
# crash-enum: tier merges are decision-invariant at every crash point
# ---------------------------------------------------------------------------


def test_tier_compact_crash_decisions_invariant(spark, tmp_path):
    """The crash-enum matrix of test_dedup_index_crash_enum, run over
    the TIERED merge: every interruption point yields the same gate
    decisions, the base segment is never touched, and a retry (or a
    final full compaction) converges."""
    import tests.test_dedup_index_crash_enum as enum

    base = _mk(
        spark,
        [(i, f"{_BASE} tail{i}a tail{i}b") for i in range(6)],
    )
    idx_docs = [(10, _N1), (11, _N2)]
    probe = _mk(spark, [(100, _N1), (101, "entirely novel probe words now")])
    full = base.unionByName(_mk(spark, idx_docs))
    with delta_dedup_gate(probe, full, threshold=0.5) as d:
        want = sorted(
            (r["doc_id"], r["n_dup_matches"], r["kept"]) for r in d.collect()
        )

    budget = 0
    while True:
        budget += 1
        idx = str(tmp_path / f"tier{budget}")
        build_dedup_index(base, idx, k=3)
        for doc in idx_docs:
            build_dedup_index(_mk(spark, [doc]), idx, k=3, mode="append")
        base_seg = [
            s for s in _list_segments(spark, idx) if "-overwrite-" in s
        ]

        crasher = enum._Crasher(budget)
        completed = False
        with enum._instrumented(crasher):
            try:
                compact_dedup_index(spark, idx, tier_max_docs=4)
                completed = True
            except enum._InjectedCrash:
                pass
        assert _decisions(probe, idx) == want, (
            f"tier-merge crash before op {budget} ({crasher.ops[-1]}) "
            "changed gate decisions"
        )
        live = _live_segments(
            _list_segments(spark, idx),
            _read_index_manifest(spark, idx)["epoch"],
        )
        assert base_seg[0] in live, "crash must never cost the base segment"
        if completed:
            assert len(live) == 2  # base + merged tier
            # retry is a no-op; a full compaction still converges
            compact_dedup_index(spark, idx, tier_max_docs=4)
            compact_dedup_index(spark, idx)
            assert _decisions(probe, idx) == want
            break
        # retry converges from every crash point
        compact_dedup_index(spark, idx, tier_max_docs=4)
        assert _decisions(probe, idx) == want
    assert budget >= 5, "expected >= 4 mutations in a 2-segment tier merge"


# ---------------------------------------------------------------------------
# loop integration
# ---------------------------------------------------------------------------


def test_loop_tier_policy_bounds_sawtooth_without_touching_base(
    spark, tmp_path
):
    """compact_tier_max_docs in indexed_neardup_gate_sink: the
    small-segment sawtooth stays bounded, decisions match the inline
    closed form, and the BASE segment survives the whole run untouched
    (the O(corpus) term has left the loop)."""
    from pyspark.sql import functions as F

    from dionysus_rb_spark.streaming.neardup_stream import (
        indexed_neardup_gate_sink,
    )

    base_rows = [(i, f"{_BASE} tail{i}a tail{i}b") for i in range(20)]
    base = _mk(spark, base_rows)
    idx = str(tmp_path / "idx")
    build_dedup_index(base, idx, k=3)
    base_seg = [s for s in _list_segments(spark, idx) if "-overwrite-" in s]
    base_mtime = os.path.getmtime(
        os.path.join(idx, "segments", base_seg[0], "_seg_commit.json")
    )

    out = str(tmp_path / "out")

    def on_batch(admitted, rejected, decision, batch_id):
        decision.df.withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        ).write.mode("append").parquet(out)

    fn = indexed_neardup_gate_sink(
        idx,
        threshold=0.5,
        on_batch=on_batch,
        auto_compact_segments=3,
        compact_tier_max_docs=10,
    )
    seen_small = []
    # 8 batches: 2 fresh docs (disjoint per-batch vocabulary — zero
    # shingle overlap across batches) + 1 exact dup of batch 0's first
    b0_text = " ".join(f"fa0{c}" for c in "abcdefgh")
    for b in range(8):
        rows = [
            (1000 + b * 10, " ".join(f"fa{b}{c}" for c in "abcdefgh")),
            (1001 + b * 10, " ".join(f"gb{b}{c}" for c in "abcdefgh")),
        ]
        if b > 0:
            rows.append((1002 + b * 10, b0_text))
        fn(_mk(spark, rows), b)
        segs = _list_segments(spark, idx)
        live = _live_segments(segs, 1)
        assert base_seg[0] in live
        seen_small.append(
            sum(
                1
                for s in live
                if isinstance(n := (segs[s] or {}).get("n_docs"), int)
                and n <= 10
            )
        )
    # sawtooth bounded by the trigger, with compactions observed
    assert max(seen_small) <= 3 + 1, seen_small
    assert any(
        b < a for a, b in zip(seen_small, seen_small[1:])
    ), f"tier policy never compacted: {seen_small}"
    # base segment never rewritten: same commit marker, same mtime
    assert (
        os.path.getmtime(
            os.path.join(idx, "segments", base_seg[0], "_seg_commit.json")
        )
        == base_mtime
    )
    # decisions: every dup of b0's first doc rejected after batch 0,
    # everything else kept
    got = {
        r["doc_id"]: r["kept"]
        for r in spark.read.parquet(out).collect()
    }
    for doc_id, kept in got.items():
        assert kept == (0 if doc_id % 10 == 2 else 1), (doc_id, kept, got)


def test_accumulated_replay_straddling_tier_compaction_with_lineage(
    spark, tmp_path
):
    """The full r13 stack in one scenario: delivery accumulation +
    TIERED auto-compaction + lineage stamping + a trigger replay
    (crash after the group's append committed, before the high-water
    published) landing on a restart path where the tier policy fires
    MID-REPLAY. The tier merge must absorb the earlier append segments
    but protect the replayed trigger's tag AND leave the (frozen) base
    alone; the re-gate over the identical staged union must be
    bit-identical — within-group twins split across staged batches and
    a cross-group duplicate whose corpus copy MOVES into the merged
    tier segment between the two attempts included. Every marker the
    round stamps must carry the explicit lineage."""
    import json as _json
    import os

    from dionysus_rb_spark.streaming.neardup_stream import (
        indexed_neardup_gate_sink,
    )

    base = _mk(
        spark,
        [(i, f"{_BASE} tail{i}a tail{i}b") for i in range(30)],
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(base, idx, k=3)
    base_seg = [s for s in _list_segments(spark, idx) if "-overwrite-" in s]
    base_mtime = os.path.getmtime(
        os.path.join(idx, "segments", base_seg[0], "_seg_commit.json")
    )

    seen = []

    def capture(admitted, rejected, decision, batch_id):
        seen.append(
            sorted(
                (r["doc_id"], r["n_dup_matches"], r["kept"])
                for r in decision.collect()
            )
        )

    stage = str(tmp_path / "stage")
    fn = indexed_neardup_gate_sink(
        idx,
        threshold=0.5,
        on_batch=capture,
        accumulate_batches=2,
        staging_path=stage,
        auto_compact_segments=3,
        compact_tier_max_docs=10,
        lineage="qA",
    )
    g0a = "first group first batch content wholly new to the index"
    g0b = "first group second batch content also wholly new today"
    tw = "twin text split across the second accumulated group staged"
    tw2 = "another twin text split across the third group batches ok"
    fn(_mk(spark, [(10, g0a)]), 0)
    fn(_mk(spark, [(11, g0b)]), 1)  # trigger 0: appends tag batch1
    fn(_mk(spark, [(20, tw)]), 2)
    fn(_mk(spark, [(21, tw), (22, g0a)]), 3)  # trigger 1: tag batch3
    assert seen[0] == [(10, 0, 1), (11, 0, 1)]
    assert seen[1] == [(20, 0, 1), (21, 0, 1), (22, 1, 0)]

    fn(_mk(spark, [(30, tw2)]), 4)
    fn(_mk(spark, [(31, tw2), (32, g0a)]), 5)  # trigger 2: tag batch5
    assert seen[2] == [(30, 0, 1), (31, 0, 1), (32, 1, 0)]

    # crash between the group's append commit and the high-water
    # publish; the replay's restart path now counts 3 mergeable
    # append segments (batch1, batch3, batch5) -> the TIER policy
    # fires mid-replay, protecting the replayed trigger's own tag
    os.remove(os.path.join(stage, "_gated.json"))
    fn(_mk(spark, [(31, tw2), (32, g0a)]), 5)
    assert seen[3] == seen[2], (
        "trigger replay straddling the tier compaction must be "
        "bit-identical (twins stay admitted; the cross-group dup's "
        "match count survives its corpus copy moving into the merged "
        "tier segment)"
    )

    segs = _list_segments(spark, idx)
    live = _live_segments(segs, 1)
    # base untouched and still live; batch1+batch3 merged into ONE
    # tier segment; the replayed trigger's tagged segment survives
    assert base_seg[0] in live
    assert os.path.getmtime(
        os.path.join(idx, "segments", base_seg[0], "_seg_commit.json")
    ) == base_mtime
    assert sum("-compact-" in s for s in live) == 1
    assert sum(s.endswith("append-batch5") for s in live) == 1
    assert not any(
        s.endswith("append-batch1") or s.endswith("append-batch3")
        for s in live
    )

    # every stamp carries the explicit lineage
    tag_seg = next(s for s in live if s.endswith("append-batch5"))
    marker = _json.loads(
        open(
            os.path.join(idx, "segments", tag_seg, "_seg_commit.json")
        ).read()
    )
    assert marker["lineage"] == "qA"
    gated = _json.loads(open(os.path.join(stage, "_gated.json")).read())
    assert gated == {"last_gated_batch": 5, "lineage": "qA"}
    for b in os.listdir(stage):
        if b.startswith("b"):
            staged = _json.loads(
                open(os.path.join(stage, b, "_staged.json")).read()
            )
            assert staged == {"lineage": "qA"}, (b, staged)


@pytest.mark.parametrize("seed", [0, 7, 1234])
def test_tier_policy_amortization_bound(seed):
    """The carry rule's write-amplification claim, pinned formally: a
    segment of size S only joins a merge group once the smaller
    candidates sum to >= S/FACTOR, so every rewrite grows a doc's
    containing segment by >= (1 + 1/FACTOR)x — each doc is rewritten
    at most log_{1+1/F}(total docs) times no matter the append
    schedule. Simulated in pure Python with randomized append sizes,
    merging EAGERLY (worst case for rewrite counting) whenever the
    policy proposes a group; segments above the threshold freeze and
    never merge again, exactly like the loop."""
    import math
    import random

    from dionysus_rb_spark.operators.minhash import (
        TIER_CARRY_FACTOR,
        _tier_merge_group,
    )

    rng = random.Random(seed)
    tier_max = 5_000
    sizes: dict[str, int] = {}
    rewrites: dict[str, int] = {}  # per-SEGMENT lineage max rewrite depth
    seg_depth: dict[str, int] = {}  # max rewrites any member doc has seen
    total_docs = 0
    next_id = 0
    for _ in range(400):
        name = f"a{next_id}"
        next_id += 1
        n = rng.randint(1, 200)
        sizes[name] = n
        seg_depth[name] = 0
        total_docs += n
        while True:
            group = _tier_merge_group(sizes, tier_max)
            if not group:
                break
            merged = f"m{next_id}"
            next_id += 1
            new_size = sum(sizes[g] for g in group)
            # the invariant that gives the log bound: the LARGEST
            # group member grows by at least the carried smaller sum
            biggest = max(sizes[g] for g in group)
            assert new_size * TIER_CARRY_FACTOR >= (
                TIER_CARRY_FACTOR + 1
            ) * biggest, (group, {g: sizes[g] for g in group})
            depth = 1 + max(seg_depth[g] for g in group)
            for g in group:
                del sizes[g]
                del seg_depth[g]
            sizes[merged] = new_size
            seg_depth[merged] = depth
            rewrites[merged] = depth
    growth = math.log(1 + 1 / TIER_CARRY_FACTOR)
    bound = math.ceil(math.log(max(total_docs, 2)) / growth) + 1
    worst = max([*seg_depth.values(), *rewrites.values()], default=0)
    assert worst <= bound, (worst, bound, total_docs)
