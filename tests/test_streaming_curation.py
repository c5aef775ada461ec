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
