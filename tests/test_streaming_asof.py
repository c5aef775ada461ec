"""Stream-static as-of enrichment: a click stream joined to the latest
purchase snapshot per user — the streaming deployment of the as-of
lookup (the static side is the batch-maintained state store / feature
snapshot; Spark re-reads it per micro-batch, so a snapshot refresh is
picked up without restarting the stream). The batch asof_join is the
oracle: for probes at max event time the stream-static enrich must
agree with the batch as-of at the same instant."""

from __future__ import annotations

import pyspark.sql.functions as F

from dionysus_rb_spark.operators.asof import asof_join
from dionysus_rb_spark.operators.dedup import keep_latest
from dionysus_rb_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_stream_static_asof_enrich(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase")

    # static side: latest purchase per user (the snapshot-store shape)
    snapshot = keep_latest(
        purchases.select("user_id", "ts", "value", "event_id"),
        ["user_id"],
        "ts",
        ["event_id"],
    ).select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )

    # batch truth: as-of at each click; clicks are all at ts <= max ts,
    # so for clicks AFTER the last purchase the snapshot enrich agrees
    # with the as-of — pick those as the comparable subset
    batch = asof_join(
        clicks, purchases, "user_id", "ts", "ts", ["value"], "event_id"
    )
    last_purchase = {r["user_id"]: r["p_ts"] for r in snapshot.collect()}
    expected = {
        r["event_id"]: (r["asof_ts"], r["asof_value"])
        for r in batch.collect()
        if r["user_id"] in last_purchase
        and r["ts"] >= last_purchase[r["user_id"]]
    }
    assert expected  # sanity: the comparable subset is non-trivial

    import shutil

    src_dir = tmp_path / "clicks_in"
    src_dir.mkdir()
    clicks.write.parquet(str(tmp_path / "clicks_pq"))
    for p in (tmp_path / "clicks_pq").glob("*.parquet"):
        shutil.copy(p, src_dir / p.name)

    stream = spark.readStream.schema(clicks.schema).parquet(str(src_dir))
    enriched = stream.join(snapshot, "user_id", "left")
    q = (
        enriched.writeStream.format("memory")
        .queryName("asof_enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: (r["p_ts"], r["p_value"])
        for r in spark.sql("SELECT * FROM asof_enriched").collect()
    }
    for eid, want in expected.items():
        assert got[eid] == want, f"event {eid}: {got[eid]} != {want}"
