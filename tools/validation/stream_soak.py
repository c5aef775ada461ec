"""Streaming long-run soak — state-store growth over hundreds of
micro-batches (round 7, VERDICT r6 item 6).

The streaming paths are certified per-micro-batch; this harness runs
the two stateful shapes whose state could in principle grow without
bound and measures the state store row count batch-over-batch:

1. ``keep_latest_stream`` (applyInPandasWithState, one state row per
   key) against a key-CHURNING rate stream — every key receives a burst
   then goes silent forever, the worst shape for per-key state:
     a. without a TTL (the documented hazard): state must grow ~linearly
        with distinct keys seen — measured and reported as the baseline;
     b. with ``state_ttl_ms``: ProcessingTimeTimeout must reap silent
        keys, so state PLATEAUS near (key arrival rate x TTL) while the
        stream keeps introducing new keys. The soak asserts the plateau:
        late-run state stays within a small multiple of the TTL-window
        key count and far below total keys seen.

2. ``sessionize`` (native session_window, JVM state) on the same
   churning stream: closed sessions must be evicted once the event-time
   watermark passes them, so open-session state plateaus too.

Metrics come from StreamingQueryProgress.stateOperators[0]
(numRowsTotal / numRowsUpdated / numRowsRemoved), sampled every batch.

Usage: python tools/validation/stream_soak.py [target_batches]  # default 250
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import functions as F

from dionysus_rb_spark.session import get_spark
from dionysus_rb_spark.streaming.dedup_stream import keep_latest_stream
from dionysus_rb_spark.streaming.sessionize import sessionize

TARGET = int(sys.argv[1]) if len(sys.argv) > 1 else 250
ROWS_PER_SEC = 1000
KEY_BURST = 200  # rows per key before the key goes silent forever


def churn_stream(spark):
    """Rate stream where key k receives KEY_BURST rows (~0.2 s of
    traffic) and then never appears again — ~5 fresh keys/s."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", ROWS_PER_SEC)
        .load()
        .select(
            F.concat(F.lit("k"), (F.col("value") / KEY_BURST).cast("long")).alias(
                "key"
            ),
            F.col("timestamp").alias("ts"),
            F.col("value"),
        )
    )


def run_soak(name: str, out_df, target_batches: int, output_mode: str) -> list[dict]:
    """Run the streaming frame to a noop sink for ``target_batches``
    micro-batches, sampling state-operator metrics per batch."""
    ckpt = tempfile.mkdtemp(prefix=f"soak_{name}_")
    q = (
        out_df.writeStream.format("noop")
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .start()
    )
    seen: dict[int, dict] = {}
    try:
        while True:
            p = q.lastProgress
            if p and p.get("stateOperators"):
                so = p["stateOperators"][0]
                seen[p["batchId"]] = {
                    "rows_total": so.get("numRowsTotal"),
                    "rows_updated": so.get("numRowsUpdated"),
                    "rows_removed": so.get("numRowsRemoved"),
                    "input_rows": p.get("numInputRows"),
                }
                if p["batchId"] >= target_batches:
                    break
            if q.exception() is not None:
                raise RuntimeError(q.exception())
            time.sleep(0.1)
    finally:
        q.stop()
    return [seen[b] | {"batch": b} for b in sorted(seen)]


def report(name: str, hist: list[dict]) -> None:
    pts = [h for h in hist if h["rows_total"] is not None]
    tail = pts[-20:]
    peak = max(h["rows_total"] for h in pts)
    last = tail[-1]["rows_total"]
    removed = sum(h["rows_removed"] or 0 for h in pts)
    print(
        f"{name}: {len(pts)} batches sampled, peak state {peak} rows, "
        f"final {last}, removed {removed} total; "
        f"trajectory {[pts[i]['rows_total'] for i in range(0, len(pts), max(1, len(pts)//10))]}"
    )


def main() -> None:
    spark = get_spark("stream-soak", cpus=8)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    # --- 1a. keep_latest WITHOUT TTL: the documented growth hazard ----
    hist_nottl = run_soak(
        "keep_latest_nottl",
        keep_latest_stream(churn_stream(spark), ["key"], "ts"),
        min(60, TARGET),
        "update",
    )
    report("keep_latest no-TTL (hazard baseline)", hist_nottl)
    growth = [h["rows_total"] for h in hist_nottl if h["rows_total"]]
    assert growth[-1] > growth[len(growth) // 3], (
        "no-TTL state should grow with churning keys"
    )

    # --- 1b. keep_latest WITH TTL: state must plateau ------------------
    ttl_ms = 3000
    hist_ttl = run_soak(
        "keep_latest_ttl",
        keep_latest_stream(churn_stream(spark), ["key"], "ts", state_ttl_ms=ttl_ms),
        TARGET,
        "update",
    )
    report(f"keep_latest TTL={ttl_ms}ms", hist_ttl)
    pts = [h for h in hist_ttl if h["rows_total"] is not None]
    keys_seen = sum(h["input_rows"] or 0 for h in pts) / KEY_BURST
    mid = [h["rows_total"] for h in pts[len(pts) // 3 : 2 * len(pts) // 3]]
    late = [h["rows_total"] for h in pts[-len(pts) // 3 :]]
    peak_late, peak_mid = max(late), max(mid)
    # plateau: the late third must not exceed the middle third by more
    # than 50% — TTL reaping balances key arrival (no unbounded growth)
    assert peak_late <= peak_mid * 1.5, (peak_mid, peak_late)
    print(
        f"  plateau held: late-third peak {peak_late} vs mid-third "
        f"{peak_mid}, while ~{keys_seen:.0f} distinct keys arrived"
    )

    # --- 2. sessionize: watermark must evict closed sessions -----------
    hist_sess = run_soak(
        "sessionize",
        sessionize(
            churn_stream(spark), ["key"], "ts", gap="2 seconds", watermark="5 seconds"
        ),
        TARGET,
        "append",
    )
    report("sessionize gap=2s wm=5s", hist_sess)
    pts = [h for h in hist_sess if h["rows_total"] is not None]
    mid = [h["rows_total"] for h in pts[len(pts) // 3 : 2 * len(pts) // 3]]
    late = [h["rows_total"] for h in pts[-len(pts) // 3 :]]
    assert max(late) <= max(mid) * 1.5, (max(mid), max(late))
    print(f"  plateau held: late-third peak {max(late)} vs mid-third {max(mid)}")


if __name__ == "__main__":
    main()
