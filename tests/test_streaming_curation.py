"""The curation operators under Structured Streaming: the same column
expressions that pass the batch oracle run unchanged in a readStream
pipeline (quality + repetition + lang gates, exact-dedup within the
stream), proving the training-data filter funnel deploys as a streaming
ingest stage, not only a batch sweep."""

from __future__ import annotations

import pyspark.sql.functions as F

from dionysus_rb_spark.functions.hashing import tokenize
from dionysus_rb_spark.operators import textops
from dionysus_rb_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _curation_filter(df):
    """quality >= 0.3 AND not repetition-flagged AND en/de/fr/es, plus
    the content fingerprint for dedup — identical expressions to the
    batch queries (they are plain Columns, source-agnostic)."""
    rep = textops.repetition_stats(F.col("text"))
    out = df.select(
        "doc_id",
        "text",
        textops.quality_score(F.col("text"), F.col("n_chars")).alias("quality"),
        rep["dup_token_frac"].alias("dup_frac"),
        rep["top_token_frac"].alias("top_frac"),
        textops.predicted_lang(textops.lang_scores(F.col("text"))).alias("lang"),
        textops.fingerprint(F.col("text")).alias("fp"),
    )
    return out.filter(
        (F.col("quality") >= 0.3)
        & (F.col("dup_frac") < 0.75)
        & (F.col("top_frac") < 0.2)
        & (F.col("lang") != "und")
    )


def test_streaming_curation_matches_batch(spark, tmp_path):
    batch_docs = load_table(spark, SF_DIR, "documents")
    expected = {
        r["doc_id"]
        for r in _curation_filter(batch_docs)
        .dropDuplicates(["fp"])
        .select("doc_id")
        .collect()
    }

    import shutil

    # file streams read directories, not single files
    src_dir = tmp_path / "docs_in"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", src_dir / "part-0.parquet")
    src = spark.readStream.schema(batch_docs.schema).parquet(str(src_dir))
    # dropDuplicates keyed on the fingerprint: streaming exact-dedup
    # (state = one fingerprint per kept doc; bound with a watermark on
    # an event-time column in a live deployment)
    filtered = _curation_filter(src).dropDuplicates(["fp"])
    q = (
        filtered.select("doc_id")
        .writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM curated_stream").collect()}

    # fingerprint-duplicate groups may keep a different representative
    # in stream vs batch order; compare kept fingerprints + count
    assert len(got) == len(expected)
    fp_of = {
        r["doc_id"]: r["fp"]
        for r in _curation_filter(batch_docs).select("doc_id", "fp").collect()
    }
    assert {fp_of[d] for d in got} == {fp_of[d] for d in expected}


def test_indexed_neardup_gate_stream_two_batches(spark, tmp_path):
    """VERDICT r9 item 4 — the streaming near-dup gate wired to the
    PERSISTED index artifact: batch 2's duplicates of batch 1's
    ADMITTED docs are rejected (the admit->crash-atomic-append loop
    actually closed), batch 1's rejected docs do NOT poison the index,
    and the stream reads its signature constants from the manifest.
    Runs a real file-source stream twice against one checkpoint (two
    micro-batches), exactly the production restart cadence."""
    import os

    from pyspark.sql import functions as F

    from dionysus_rb_spark.operators.minhash import build_dedup_index
    from dionysus_rb_spark.streaming.neardup_stream import (
        indexed_neardup_gate_sink,
    )

    base_a = "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8"
    fresh_x = "brand new streaming content never seen by the index before"
    fresh_y = "another later piece of wholly original words to admit too"
    corpus = spark.createDataFrame(
        [(1, base_a), (2, "unrelated corpus filler text sharing nothing at all")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, k=3)

    batch1 = spark.createDataFrame(
        [(10, fresh_x), (11, base_a)],  # 10 admits, 11 dups the corpus
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        # 20 dups batch 1's ADMITTED doc -> must reject via the append;
        # 21 dups batch 1's REJECTED doc's content (== corpus doc 1) ->
        # rejected via the CORPUS, with exactly 1 match (the rejected
        # doc 11 must not have been appended); 22 is fresh
        [(20, fresh_x), (21, base_a), (22, fresh_y)],
        "doc_id long, text string",
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")

    def land(admitted, rejected, decision, batch_id):
        decision.withColumn(
            "batch", F.lit(int(batch_id)).cast("int")
        ).write.mode("append").parquet(out)

    def run_stream():
        stream = spark.readStream.schema(batch1.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                indexed_neardup_gate_sink(idx, threshold=0.5, on_batch=land)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch1.coalesce(1).write.mode("append").parquet(src)
    run_stream()
    batch2.coalesce(1).write.mode("append").parquet(src)
    run_stream()

    got = {
        r["doc_id"]: (r["n_dup_matches"], r["kept"], r["batch"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        10: (0, 1, 0),
        11: (1, 0, 0),
        20: (1, 0, 1),  # rejected against batch 1's APPENDED admit
        21: (1, 0, 1),  # 1 match, not 2: rejected doc 11 never appended
        22: (0, 1, 1),
    }
    # exactly-once growth: base + one tagged segment per micro-batch
    segs = sorted(os.listdir(os.path.join(idx, "segments")))
    assert [s.split("-", 2)[2] for s in segs if "append" in s] == [
        "batch0",
        "batch1",
    ]


def test_indexed_neardup_gate_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a micro-batch re-delivered after
    its index append committed (crash before the checkpoint write) must
    produce BIT-IDENTICAL decisions (exclude_self keeps its docs from
    matching their own committed copies) and must not grow the index
    again (the tagged append is a no-op)."""
    import os

    from dionysus_rb_spark.operators.minhash import build_dedup_index
    from dionysus_rb_spark.streaming.neardup_stream import (
        indexed_neardup_gate_sink,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, k=3)

    seen = []

    def capture(admitted, rejected, decision, batch_id):
        seen.append(
            sorted(
                (r["doc_id"], r["n_dup_matches"], r["kept"])
                for r in decision.collect()
            )
        )

    batch = spark.createDataFrame(
        [
            (10, "fresh words that will be admitted and appended today"),
            (11, "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8"),
        ],
        "doc_id long, text string",
    )
    fn = indexed_neardup_gate_sink(idx, threshold=0.5, on_batch=capture)
    fn(batch, 7)
    fn(batch, 7)  # the replay
    assert seen[0] == [(10, 0, 1), (11, 1, 0)]
    assert seen[1] == seen[0], "replayed decisions must be bit-identical"
    segs = [
        s
        for s in os.listdir(os.path.join(idx, "segments"))
        if s.endswith("batch7")
    ]
    assert len(segs) == 1, "tagged append must be exactly-once"


def test_indexed_neardup_gate_replay_within_batch_dups(spark, tmp_path):
    """The r11 curation soak's find, pinned: a batch containing
    WITHIN-BATCH duplicates (same text, DIFFERENT ids — the gate's
    contract admits both) must replay bit-identically. exclude_self
    alone cannot do it — on replay each twin matches the OTHER twin's
    committed copy, flipping both to rejected — so the gate excludes
    the batch's own tagged segment from its index view
    (exclude_segment_tag), replaying against exactly the index state
    the first attempt saw."""
    import os

    from dionysus_rb_spark.operators.minhash import build_dedup_index
    from dionysus_rb_spark.streaming.neardup_stream import (
        indexed_neardup_gate_sink,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, k=3)

    seen = []

    def capture(admitted, rejected, decision, batch_id):
        seen.append(
            sorted(
                (r["doc_id"], r["n_dup_matches"], r["kept"])
                for r in decision.collect()
            )
        )

    twin = "completely fresh content never indexed before anywhere yes"
    batch = spark.createDataFrame(
        [(10, twin), (11, twin), (12, "other new words entirely here now")],
        "doc_id long, text string",
    )
    fn = indexed_neardup_gate_sink(idx, threshold=0.5, on_batch=capture)
    fn(batch, 3)
    fn(batch, 3)  # the replay, after the tagged append committed
    assert seen[0] == [(10, 0, 1), (11, 0, 1), (12, 0, 1)], (
        "within-batch twins both admit (gate checks only the index)"
    )
    assert seen[1] == seen[0], (
        "replay with within-batch twins must be bit-identical — each "
        "twin must not match the other's committed copy"
    )
    segs = [
        s
        for s in os.listdir(os.path.join(idx, "segments"))
        if s.endswith("batch3")
    ]
    assert len(segs) == 1

    # the NEXT batch (a different tag) DOES see the twins' copies
    seen.clear()
    fn(spark.createDataFrame([(20, twin)], "doc_id long, text string"), 4)
    assert seen == [[(20, 2, 0)]], "later batches match both committed twins"


def test_replay_straddling_auto_compaction_is_bit_identical(spark, tmp_path):
    """VERDICT r11 item 1, closed: the one residual replay-identity
    edge was a replay whose tagged segment a compaction had ABSORBED —
    exclude_segment_tag finds nothing and the exclude_self fallback
    cannot save within-batch twins. The loop's auto-compaction now
    PROTECTS the current batch's tag (the only replayable one, since
    foreachBatch is serial), so a crash between the append commit and
    the checkpoint commit followed by a compaction on the restart path
    still replays bit-identically."""
    import os

    from dionysus_rb_spark.operators.minhash import build_dedup_index
    from dionysus_rb_spark.streaming.neardup_stream import (
        indexed_neardup_gate_sink,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, k=3)

    seen = []

    def capture(admitted, rejected, decision, batch_id):
        seen.append(
            sorted(
                (r["doc_id"], r["n_dup_matches"], r["kept"])
                for r in decision.collect()
            )
        )

    fn = indexed_neardup_gate_sink(
        idx, threshold=0.5, on_batch=capture, auto_compact_segments=3
    )
    fn(
        spark.createDataFrame(
            [(10, "first fresh batch content admitted and appended fine")],
            "doc_id long, text string",
        ),
        0,
    )
    # batch 1 holds WITHIN-BATCH twins — the case segment exclusion
    # exists for. Its first attempt sees 2 live segments (no compaction
    # yet), gates, appends tag batch1, then "crashes" before the
    # checkpoint commit.
    twin = "totally novel twin text that only this batch contains today"
    b1 = spark.createDataFrame(
        [(20, twin), (21, twin), (22, "yet more new words landing here")],
        "doc_id long, text string",
    )
    fn(b1, 1)
    # the REPLAY: 3 live segments now (base + batch0 + batch1), so the
    # auto-compaction policy fires on the restart path — it must absorb
    # base+batch0 but PROTECT batch1, or the twins flip to rejected
    fn(b1, 1)
    assert seen[0] == [(10, 0, 1)]  # batch 0's own capture
    assert seen[1] == [(20, 0, 1), (21, 0, 1), (22, 0, 1)]
    assert seen[2] == seen[1], (
        "replay straddling the auto-compaction must be bit-identical"
    )
    segs = sorted(os.listdir(os.path.join(idx, "segments")))
    committed = [
        s
        for s in segs
        if os.path.exists(os.path.join(idx, "segments", s, "_seg_commit.json"))
    ]
    assert any("-compact-" in s for s in committed), "compaction ran"
    assert sum(s.endswith("batch1") for s in committed) == 1, (
        "the replayable tagged segment must survive the compaction"
    )
    # steady state afterwards: a later batch sees the merged view and
    # matches the twins' committed copies
    seen.clear()
    fn(spark.createDataFrame([(30, twin)], "doc_id long, text string"), 2)
    assert seen == [[(30, 2, 0)]]


def test_accumulated_gate_every_n_batches(spark, tmp_path):
    """VERDICT r11 item 3: the delivery-batching lever. With
    accumulate_batches=2, the loop stages micro-batches crash-atomically
    and runs ONE gate + sink + tagged append per pair — on_batch fires
    once per group with the union, the index grows one segment per
    group, and duplicates of an earlier GROUP's admitted docs are
    rejected by the next group's gate."""
    import os

    from dionysus_rb_spark.operators.minhash import build_dedup_index
    from dionysus_rb_spark.streaming.neardup_stream import (
        indexed_neardup_gate_sink,
    )

    base_a = "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8"
    fresh_x = "brand new streaming content never seen by the index before"
    fresh_y = "another later piece of wholly original words to admit too"
    corpus = spark.createDataFrame(
        [(1, base_a)], "doc_id long, text string"
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, k=3)

    calls = []

    def capture(admitted, rejected, decision, batch_id):
        calls.append(
            (
                batch_id,
                sorted(
                    (r["doc_id"], r["n_dup_matches"], r["kept"])
                    for r in decision.collect()
                ),
            )
        )

    stage = str(tmp_path / "stage")
    fn = indexed_neardup_gate_sink(
        idx,
        threshold=0.5,
        on_batch=capture,
        accumulate_batches=2,
        staging_path=stage,
    )
    fn(
        spark.createDataFrame([(10, fresh_x)], "doc_id long, text string"),
        0,
    )
    assert calls == [], "non-trigger batch must accumulate, not gate"
    fn(
        spark.createDataFrame(
            [(11, base_a), (12, fresh_y)], "doc_id long, text string"
        ),
        1,
    )
    # one gate over the union of batches 0+1: 10 and 12 admit, 11 dups
    # the corpus
    assert calls == [(1, [(10, 0, 1), (11, 1, 0), (12, 0, 1)])]
    segs = [
        s
        for s in os.listdir(os.path.join(idx, "segments"))
        if "append" in s
    ]
    assert [s.split("-", 2)[2] for s in sorted(segs)] == ["batch1"], (
        "one tagged segment per accumulated GROUP"
    )

    # a replay of the trigger AFTER its high-water published is a no-op
    fn(
        spark.createDataFrame(
            [(11, base_a), (12, fresh_y)], "doc_id long, text string"
        ),
        1,
    )
    assert len(calls) == 1, "post-publish trigger replay must no-op"

    # next group: duplicates of group 1's admitted docs are rejected
    fn(
        spark.createDataFrame([(20, fresh_x)], "doc_id long, text string"),
        2,
    )
    fn(
        spark.createDataFrame([(21, fresh_y)], "doc_id long, text string"),
        3,
    )
    assert calls[1] == (3, [(20, 1, 0), (21, 1, 0)])
    # staged directories at or below the high-water get reclaimed
    staged_left = [
        d for d in os.listdir(stage) if d.startswith("b")
    ]
    assert "b0" not in staged_left and "b1" not in staged_left


def test_accumulated_trigger_replay_before_publish_is_bit_identical(
    spark, tmp_path
):
    """The accumulated path's crash window: append committed, high-water
    NOT yet published (simulated by deleting ``_gated.json``). The
    replayed trigger must re-gate the identical staged union, excluding
    its own tagged segment — pinned with twins SPLIT ACROSS the two
    staged batches, where the exclude_self fallback alone would flip
    both to rejected."""
    import os

    from dionysus_rb_spark.operators.minhash import build_dedup_index
    from dionysus_rb_spark.streaming.neardup_stream import (
        indexed_neardup_gate_sink,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, k=3)

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
    )
    twin = "twin text split across two different staged micro batches"
    fn(spark.createDataFrame([(10, twin)], "doc_id long, text string"), 0)
    fn(spark.createDataFrame([(11, twin)], "doc_id long, text string"), 1)
    assert seen == [[(10, 0, 1), (11, 0, 1)]], (
        "within-GROUP twins both admit (the gate checks only the index)"
    )
    # crash between the append commit and the high-water publish
    os.remove(os.path.join(stage, "_gated.json"))
    fn(spark.createDataFrame([(11, twin)], "doc_id long, text string"), 1)
    assert seen[1] == seen[0], (
        "trigger replay before the publish must re-gate bit-identically"
    )
    segs = [
        s
        for s in os.listdir(os.path.join(idx, "segments"))
        if s.endswith("batch1")
    ]
    assert len(segs) == 1, "the accumulated append stays exactly-once"


def test_accumulated_replay_straddling_auto_compaction(spark, tmp_path):
    """The two r12 knobs interacting: a TRIGGER replay (crash after the
    group's append committed, before the high-water published) that
    lands on a restart path where the auto-compaction policy fires.
    The compaction must absorb every earlier segment but protect the
    replayed trigger's tag, and the re-gate over the identical staged
    union must be bit-identical — including within-group twins split
    across the staged batches (exclude_self can't save those) and a
    cross-group duplicate whose corpus copy MOVES into the compacted
    segment between the two attempts (n_dup_matches must not change)."""
    import os

    from dionysus_rb_spark.operators.minhash import build_dedup_index
    from dionysus_rb_spark.streaming.neardup_stream import (
        indexed_neardup_gate_sink,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, k=3)

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
    )
    group0_text = "first group content wholly new to the index today"
    fn(
        spark.createDataFrame([(10, group0_text)], "doc_id long, text string"),
        0,
    )
    fn(
        spark.createDataFrame(
            [(11, "more novel words to round out the first group")],
            "doc_id long, text string",
        ),
        1,
    )
    assert len(seen) == 1  # group 0 gated once; live segments now 2
    twin = "twin text split across the second group's staged batches"
    fn(spark.createDataFrame([(20, twin)], "doc_id long, text string"), 2)
    fn(
        spark.createDataFrame(
            [(21, twin), (22, group0_text)], "doc_id long, text string"
        ),
        3,
    )
    # first attempt: live was 2 < 3, no compaction; twins admit, 22
    # matches group 0's committed copy in segment batch1
    assert seen[1] == [(20, 0, 1), (21, 0, 1), (22, 1, 0)]
    # crash between the append commit and the high-water publish; the
    # restart now sees 3 live segments, so the policy fires MID-REPLAY
    os.remove(os.path.join(stage, "_gated.json"))
    fn(
        spark.createDataFrame(
            [(21, twin), (22, group0_text)], "doc_id long, text string"
        ),
        3,
    )
    assert seen[2] == seen[1], (
        "trigger replay straddling the auto-compaction must be "
        "bit-identical (twins stay admitted, the cross-group dup's "
        "match count survives its corpus copy moving into the "
        "compacted segment)"
    )
    segdir = os.path.join(idx, "segments")
    committed = [
        s
        for s in os.listdir(segdir)
        if os.path.exists(os.path.join(segdir, s, "_seg_commit.json"))
    ]
    assert any("-compact-" in s for s in committed), "compaction ran"
    assert sum(s.endswith("batch3") for s in committed) == 1, (
        "the replayed group's tagged segment must survive exactly once"
    )


def test_accumulate_staging_checkpoint_desync_fails_loud(spark, tmp_path):
    """Staging lives and dies with the checkpoint: if the checkpoint is
    wiped while staging_path survives, batch ids restart BELOW the
    persisted high-water — proceeding would reclaim the new batch's
    staging as 'already gated' and silently drop its rows. The sink
    must fail loud, before touching the old run's staged directories."""
    import pytest

    from dionysus_rb_spark.operators.minhash import build_dedup_index
    from dionysus_rb_spark.streaming.neardup_stream import (
        indexed_neardup_gate_sink,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, k=3)

    stage = str(tmp_path / "stage")
    fn = indexed_neardup_gate_sink(
        idx,
        threshold=0.5,
        accumulate_batches=2,
        staging_path=stage,
    )
    fresh = spark.createDataFrame(
        [(10, "wholly new words for the first accumulated group today")],
        "doc_id long, text string",
    )
    fn(fresh, 0)
    fn(
        spark.createDataFrame(
            [(11, "second batch content triggering the group gate now")],
            "doc_id long, text string",
        ),
        1,
    )  # trigger: publishes high-water 1

    # "checkpoint wiped, staging kept": the new stream's batch 0
    with pytest.raises(ValueError, match="desync"):
        fn(fresh, 0)

    # a legitimate post-publish replay of the trigger stays a no-op
    fn(
        spark.createDataFrame(
            [(11, "second batch content triggering the group gate now")],
            "doc_id long, text string",
        ),
        1,
    )


def test_lineage_stamped_tag_conflicts_fail_loud(spark, tmp_path):
    """ADVICE r12 item 2 (unit layer): a tagged append that finds its
    tag committed by ANOTHER checkpoint lineage must fail loud (not
    no-op — that silently drops the new batch's docs), and a gate asked
    to exclude another lineage's tagged segment must fail loud (not
    blind itself to that segment's live docs). Same-lineage and
    unknown-lineage (legacy) paths keep the old semantics."""
    import pytest

    from dionysus_rb_spark.operators.minhash import (
        build_dedup_index,
        delta_dedup_gate_indexed,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, k=3)
    fresh = spark.createDataFrame(
        [(10, "wholly new words appended under the first lineage today")],
        "doc_id long, text string",
    )
    build_dedup_index(
        fresh, idx, k=3, mode="append", segment_tag="batch0", lineage="qA"
    )
    # same lineage replay: idempotent no-op, still exactly one segment
    build_dedup_index(
        fresh, idx, k=3, mode="append", segment_tag="batch0", lineage="qA"
    )
    import os

    segs = sorted(os.listdir(os.path.join(idx, "segments")))
    assert sum(s.endswith("append-batch0") for s in segs) == 1

    # foreign lineage reusing the tag: loud, not a silent drop
    other = spark.createDataFrame(
        [(20, "a different stream's batch zero content entirely here")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="lineage desync"):
        build_dedup_index(
            other, idx, k=3, mode="append", segment_tag="batch0", lineage="qB"
        )
    # unknown lineage (legacy caller): old no-op behavior preserved
    build_dedup_index(other, idx, k=3, mode="append", segment_tag="batch0")

    probe = spark.createDataFrame(
        [(100, "wholly new words appended under the first lineage today")],
        "doc_id long, text string",
    )
    # owning lineage may exclude its own tag: the probe's dup of the
    # tagged segment's doc is then invisible -> admitted
    with delta_dedup_gate_indexed(
        probe,
        idx,
        threshold=0.5,
        exclude_segment_tag="batch0",
        segment_lineage="qA",
    ) as d:
        assert [r["kept"] for r in d.collect()] == [1]
    # a foreign lineage must NOT silently exclude qA's live segment
    with pytest.raises(ValueError, match="lineage desync"):
        delta_dedup_gate_indexed(
            probe,
            idx,
            threshold=0.5,
            exclude_segment_tag="batch0",
            segment_lineage="qB",
        )
    # unknown lineage: legacy exclusion behavior preserved
    with delta_dedup_gate_indexed(
        probe, idx, threshold=0.5, exclude_segment_tag="batch0"
    ) as d:
        assert [r["kept"] for r in d.collect()] == [1]


def test_gated_marker_lineage_conflict_covers_heuristic_blind_spots(
    spark, tmp_path
):
    """ADVICE r12 item 1: the batch-id ordering heuristic only fires on
    batch_id < high_water; a wiped checkpoint whose new batch id lands
    ON or ABOVE the old lineage's high-water slipped past it. The
    lineage stamp in _gated.json catches every id."""
    import pytest

    from dionysus_rb_spark.operators.minhash import build_dedup_index
    from dionysus_rb_spark.streaming.neardup_stream import (
        indexed_neardup_gate_sink,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, k=3)
    stage = str(tmp_path / "stage")
    fn_a = indexed_neardup_gate_sink(
        idx,
        threshold=0.5,
        accumulate_batches=2,
        staging_path=stage,
        lineage="qA",
    )
    fn_a(
        spark.createDataFrame(
            [(10, "first fresh batch content for the original lineage")],
            "doc_id long, text string",
        ),
        0,
    )
    fn_a(
        spark.createDataFrame(
            [(11, "second fresh batch content triggering the group gate")],
            "doc_id long, text string",
        ),
        1,
    )  # publishes high-water 1 under lineage qA

    fn_b = indexed_neardup_gate_sink(
        idx,
        threshold=0.5,
        accumulate_batches=2,
        staging_path=stage,
        lineage="qB",
    )
    fresh = spark.createDataFrame(
        [(50, "a replacement stream's batch with entirely new words")],
        "doc_id long, text string",
    )
    # batch_id == high_water: invisible to the ordering heuristic,
    # caught by the stamp
    with pytest.raises(ValueError, match="lineage"):
        fn_b(fresh, 1)
    # batch_id > high_water: ditto
    with pytest.raises(ValueError, match="lineage"):
        fn_b(fresh, 2)
    # the matching lineage replays/continues fine: trigger replay is a
    # no-op, the next group proceeds
    fn_a(
        spark.createDataFrame(
            [(11, "second fresh batch content triggering the group gate")],
            "doc_id long, text string",
        ),
        1,
    )


def test_stale_staged_b0_with_no_high_water_fails_loud(spark, tmp_path):
    """ADVICE r12 item 1's second corner, end to end with REAL streams
    (auto lineage = the streaming query id): the old stream staged b0
    but never triggered (no _gated marker, high_water -1), the
    checkpoint was wiped, and the new stream's batch 0 would previously
    see 'b0 already staged' and silently SUBSTITUTE the old rows for
    its own. The stamp fails it loud."""
    import shutil

    import pytest

    from dionysus_rb_spark.operators.minhash import build_dedup_index
    from dionysus_rb_spark.streaming.neardup_stream import (
        indexed_neardup_gate_sink,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, k=3)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    stage = str(tmp_path / "stage")
    spark.createDataFrame(
        [(10, "first stream's only batch of wholly fresh words here")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)

    def run_stream():
        q = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(src)
            .writeStream.foreachBatch(
                indexed_neardup_gate_sink(
                    idx,
                    threshold=0.5,
                    accumulate_batches=3,
                    staging_path=stage,
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    run_stream()  # stages b0, never triggers (1 < 3 pending)
    import os

    assert os.path.exists(os.path.join(stage, "b0", "_staged.json"))
    assert not os.path.exists(os.path.join(stage, "_gated.json"))

    shutil.rmtree(ckpt)  # wipe the checkpoint, keep the staging area
    with pytest.raises(Exception, match="lineage"):
        run_stream()


def test_wiped_checkpoint_old_index_tags_fail_loud_in_stream(spark, tmp_path):
    """ADVICE r12 item 2, end to end with REAL streams: restarting a
    FRESH checkpoint against an index still holding the old lineage's
    tagged append segments previously (a) blinded the gate via
    exclude_segment_tag and (b) no-opped the new batch's append — both
    silent. With auto lineage stamping the new stream's first gate
    fails loud."""
    import shutil

    import pytest

    from dionysus_rb_spark.operators.minhash import build_dedup_index
    from dionysus_rb_spark.streaming.neardup_stream import (
        indexed_neardup_gate_sink,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, k=3)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(10, "first stream's admitted batch of wholly fresh words")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)

    def run_stream(checkpoint):
        q = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(src)
            .writeStream.foreachBatch(
                indexed_neardup_gate_sink(idx, threshold=0.5)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream(ckpt)  # gates + appends under tag batch0, lineage = qid A
    import os

    segs = os.listdir(os.path.join(idx, "segments"))
    assert any(s.endswith("append-batch0") for s in segs)

    shutil.rmtree(ckpt)  # fresh checkpoint, same index: new query id
    spark.createDataFrame(
        [(20, "second stream's different content colliding tag batch0")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(Exception, match="lineage"):
        run_stream(ckpt)


def test_gate_scoped_max_partition_bytes_set_and_restored(
    spark, tmp_path, monkeypatch
):
    """VERDICT r12 item 5: the loop's max_partition_bytes knob scopes
    spark.sql.files.maxPartitionBytes to the trigger's gate+sinks+
    append and RESTORES it afterwards — including when the caller's
    sink raises. "auto" engages only above the measured-safe delivery
    size and scales through the anchor; None never touches the conf."""
    import pytest

    from dionysus_rb_spark.operators.minhash import build_dedup_index
    from dionysus_rb_spark.streaming import neardup_stream as ns

    key = "spark.sql.files.maxPartitionBytes"
    original = spark.conf.get(key)
    corpus = spark.createDataFrame(
        [(1, "alpha0 beta1 gamma2 delta3 epsilon4 zeta5 eta6 theta7 iota8")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(corpus, idx, k=3)

    seen: list[str] = []

    def observe(admitted, rejected, decision, batch_id):
        seen.append(spark.conf.get(key))

    def batch(n, tag):
        return spark.createDataFrame(
            [
                (100 + i, " ".join(f"{tag}{i}{c}" for c in "abcdefgh"))
                for i in range(n)
            ],
            "doc_id long, text string",
        )

    # explicit int: pinned for the batch, restored after
    fn = ns.indexed_neardup_gate_sink(
        idx, threshold=0.5, on_batch=observe, max_partition_bytes=7_000_000
    )
    fn(batch(2, "aa"), 0)
    assert seen == ["7000000"] and spark.conf.get(key) == original

    # auto below the safe boundary: conf untouched during the batch
    seen.clear()
    fn = ns.indexed_neardup_gate_sink(idx, threshold=0.5, on_batch=observe)
    fn(batch(2, "bb"), 1)
    assert seen == [original] and spark.conf.get(key) == original

    # auto above the boundary: inverse-linear through the anchor
    monkeypatch.setattr(ns, "GATE_MPB_SAFE_DOCS", 2)
    monkeypatch.setattr(ns, "GATE_MPB_ANCHOR_DOCS", 8)
    monkeypatch.setattr(ns, "GATE_MPB_ANCHOR_BYTES", 32 * 1024 * 1024)
    monkeypatch.setattr(ns, "GATE_MPB_FLOOR_BYTES", 1024 * 1024)
    seen.clear()
    fn = ns.indexed_neardup_gate_sink(idx, threshold=0.5, on_batch=observe)
    fn(batch(4, "cc"), 2)  # 4 docs > safe 2 -> 32MB * 8/4 = 64MB
    assert seen == [str(64 * 1024 * 1024)]
    assert spark.conf.get(key) == original

    # the floor clamps a huge delivery's scale-down
    seen.clear()
    fn = ns.indexed_neardup_gate_sink(idx, threshold=0.5, on_batch=observe)
    monkeypatch.setattr(ns, "GATE_MPB_ANCHOR_DOCS", 1)
    fn(batch(40, "dd"), 3)  # 32MB * 1/40 < 1MB floor
    assert seen == [str(1024 * 1024)]
    assert spark.conf.get(key) == original

    # restored even when the caller's sink raises
    def explode(admitted, rejected, decision, batch_id):
        raise RuntimeError("sink boom")

    fn = ns.indexed_neardup_gate_sink(
        idx, threshold=0.5, on_batch=explode, max_partition_bytes=9_000_000
    )
    with pytest.raises(RuntimeError, match="sink boom"):
        fn(batch(2, "ee"), 4)
    assert spark.conf.get(key) == original

    # None: never touched, not even read
    seen.clear()
    fn = ns.indexed_neardup_gate_sink(
        idx, threshold=0.5, on_batch=observe, max_partition_bytes=None
    )
    fn(batch(2, "ff"), 5)
    assert seen == [original] and spark.conf.get(key) == original
