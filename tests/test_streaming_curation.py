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
