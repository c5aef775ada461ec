"""Task-retry chaos: results must survive first-attempt task failures.

On a 1000-executor cluster, task retries are not an edge case — they
are the steady state (preemption, spot reclamation, shuffle-fetch
failures, speculative execution). Spark re-runs the failed task on the
same input split; a query is retry-safe iff its per-task work is a
deterministic function of its input partition. Anything that isn't —
hidden state, nondeterministic expressions feeding a non-idempotent
sink, first-attempt side effects — shows up as a result that differs
from the no-failure run.

This harness injects failures WITHOUT touching query code: it pre-seeds
the session's table-load memo (tables.load_table's per-path cache) with
chaos-wrapped twins of every input table — a mapInPandas passthrough
that raises on the task's FIRST attempt for every third partition, and
yields the batch unchanged on retry. Every batch catalog query then
runs over the chaos tables at sf0.001 and must match its DuckDB oracle
exactly (the driver's hash discipline). Streaming twins are excluded:
they construct their own readStream sources, so the cache injection
cannot reach them (their retry story is the checkpoint + idempotent
foreachBatch MERGE, certified separately).

Usage: python tools/validation/task_retry_chaos.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from pyspark import TaskContext
from pyspark.sql import DataFrame

from dionysus_rb_spark.plans import all_queries
from dionysus_rb_spark.session import get_spark
from dionysus_rb_spark.tables import TABLES, load_table

SF_DIR = "/root/testdata/sf0.001"
FAIL_EVERY_NTH_PARTITION = 3


def chaos_wrap(df: DataFrame) -> DataFrame:
    schema = df.schema

    def passthrough(batches):
        ctx = TaskContext.get()
        if ctx is not None and ctx.attemptNumber() == 0 and (
            ctx.partitionId() % FAIL_EVERY_NTH_PARTITION == 0
        ):
            raise RuntimeError("chaos: injected first-attempt task failure")
        yield from batches

    return df.mapInPandas(passthrough, schema)


def main() -> None:
    from test_oracle_parity import _duck, frames_match

    spark = get_spark("task-retry-chaos", task_retries=3)
    # Seed the load_table memo with chaos twins: every query's scan now
    # fails its first attempt on a third of its partitions.
    cache = {}
    for t in TABLES:
        clean = load_table(spark, SF_DIR, t)
        cache[f"{SF_DIR}/{t}.parquet"] = chaos_wrap(clean)
    spark._dionysus_table_cache = cache

    failures = []
    t0 = time.time()
    n_run = 0
    for name, qd in sorted(all_queries().items()):
        if not qd.oracle or name.startswith("stream_"):
            continue
        n_run += 1
        try:
            got = qd.fn(spark, SF_DIR).toPandas()
            con = _duck(SF_DIR)
            want = con.execute(qd.oracle).df()
            con.close()
            if not frames_match(got, want):
                failures.append((name, "mismatch"))
        except Exception as exc:  # noqa: BLE001 — survey, report at end
            failures.append((name, repr(exc)[:200]))
    print(
        f"chaos sweep: {n_run} queries in {time.time() - t0:.1f}s; "
        f"failures: {failures if failures else 'NONE (all green)'}"
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
