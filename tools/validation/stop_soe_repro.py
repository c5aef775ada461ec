"""Minimal repro for the cosmetic stop-path StackOverflowError
(VERDICT r12 item 8 / SCALING.md r12 methodology footnote).

Both r12 soak runs printed one JVM ``StackOverflowError`` (pure
``java.util.regex`` frames) from the DYING stream-execution thread at
the planned mid-soak ``q.stop()``; the restarted stream resumed
cleanly and decision identity held, and the same print reproduces on
the r11 end-of-round tree — i.e. it predates every r12 change. This
harness isolates the trigger with NO dionysus code in the loop at all:
a vanilla file-source availableNow stream with a trivial foreachBatch
body, stopped while a micro-batch is in flight. Any SOE it prints is
therefore Spark's own stop/interrupt handling (the interrupt lands in
log4j/regex message formatting on the stream thread), not this
package's sink.

Exit status: 0 either way — this is an evidence-gatherer, not a test.
Run a few attempts; the print is racy by nature (the interrupt must
land inside the formatter).

FINDING (r13 run, 6 attempts): the trivial body NEVER fires it —
stop_exceptions=0, stderr clean — while the curation soak printed the
identical SOE again on this tree the same hour (one per planned stop:
``Exception in thread "stream execution thread for [id=...]"
java.lang.StackOverflowError`` with every visible frame in
``java.util.regex Pattern$Loop/GroupTail``, immediately after
DAGScheduler's "Failed to cancel job group" warning, AFTER the last
checkpoint commit; ``q.exception()`` stays None and the restart
resumes cleanly). Read together: the overflow is catastrophic regex
recursion inside Spark's stop-path log/error formatting and needs a
VERY LONG subject string to recurse deep enough — the soak's
corpus-sized gate plans / job descriptions provide one, a trivial
count() body does not. It is Spark-internal and cosmetic to this
package's sinks (no dionysus frame ever appears in the stack; state
and decisions are unaffected on three consecutive round trees) — see
README's streaming section for the known-issue note.

Usage: python tools/validation/stop_soe_repro.py [attempts=5]
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from dionysus_rb_spark.session import get_spark  # noqa: E402


def main() -> None:
    attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("stop-soe-repro")
    root = REPO / ".scratch" / "stop_soe_repro"

    captured: list[str] = []
    observed = 0
    for attempt in range(attempts):
        if root.exists():
            shutil.rmtree(root)
        root.mkdir(parents=True)
        src, ckpt = str(root / "src"), str(root / "ckpt")
        for b in range(40):
            spark.range(b * 100, (b + 1) * 100).selectExpr(
                "id as doc_id"
            ).coalesce(1).write.mode("append").parquet(src)

        def body(df, bid):
            df.count()
            time.sleep(0.05)

        q = (
            spark.readStream.schema("doc_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        # let a few micro-batches land, then stop mid-flight — the
        # soak's planned-kill cadence
        deadline = time.time() + 30
        while time.time() < deadline:
            if not q.isActive:
                break
            p = q.lastProgress
            if p and p["batchId"] >= 3:
                break
            time.sleep(0.1)
        q.stop()
        q.awaitTermination(60)
        # the SOE, when it fires, is PRINTED by the dying JVM thread to
        # the driver's stderr (it never propagates to the query status:
        # q.exception() stays None) — scrape the JVM for evidence via
        # the last-thrown holder is not exposed, so this harness relies
        # on the operator watching stderr; we still record stop health:
        exc = q.exception()
        if exc is not None:
            observed += 1
            captured.append(str(exc)[:500])
        time.sleep(0.5)

    print(
        f"attempts={attempts} stop_exceptions={observed} "
        f"(the cosmetic SOE prints on STDERR from the dying stream "
        f"thread and does not surface via q.exception())"
    )
    for c in captured:
        print("---", c)
    spark.stop()


if __name__ == "__main__":
    main()
