"""Execution-conf adversarial sweep: parity must survive engine knobs.

A 1000-executor deployment does not run our laptop confs. Ops teams
disable AQE to debug, Arrow batch sizes shrink under memory pressure,
codegen falls back to interpreted mode past the 64KB method limit or
on JIT blacklisting, broadcast thresholds get zeroed when size
estimates lie, and shuffle parallelism is whatever the cluster manager
says. A result that silently depends on any one of those knobs is a
latent wrong answer at scale. This sweep runs EVERY oracle catalog
query (streaming twins included) under one perturbed conf profile at a
time and requires exact DuckDB parity — the driver's own hash
discipline — under each:

- ``arrow_batch_1``     spark.sql.execution.arrow.maxRecordsPerBatch=1
                        Every mapInPandas/applyInPandas sees one-row
                        batches; any code that assumes a partition (or
                        a group) arrives as a single pandas batch
                        breaks here and nowhere else.
- ``codegen_off``       wholeStage=false + factoryMode=NO_CODEGEN
                        Interpreted expression evaluation end-to-end —
                        the fallback path Spark takes on codegen
                        failure; divergence means we depended on a
                        codegen-only behavior.
- ``shuffle_1``         spark.sql.shuffle.partitions=1
                        Zero shuffle parallelism: every groupBy/join/
                        window collapses to one partition. Flushes out
                        any partition-count-dependent logic.
- ``broadcast_off``     spark.sql.autoBroadcastJoinThreshold=-1
                        The "size estimates lie" regime: every
                        un-hinted join becomes a shuffled join.
                        Explicit broadcast() hints still apply (they
                        are hints, not thresholds), so the audited
                        bounded-side decorations keep their shape.
- ``aqe_off``           spark.sql.adaptive.enabled=false
                        Static planning only (re-run of the round-7
                        one-off, now a standing profile).
- ``tiny_split``        spark.sql.files.maxPartitionBytes=65536 (+
                        openCostInBytes=0): every parquet file shatters
                        into many input splits — the 100 TB scan shape
                        where a table is thousands of splits per
                        executor. Results must be split-count
                        invariant (catches per-split logic that
                        assumes file == partition).

Confs are set per-profile on the shared session and restored after, so
profiles compose into one process. Exit non-zero on any divergence.

Usage: python tools/validation/conf_sweep.py [profile ...]
       (no args = all profiles)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from dionysus_rb_spark.plans import all_queries
from dionysus_rb_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

PROFILES: dict[str, dict[str, str]] = {
    "arrow_batch_1": {"spark.sql.execution.arrow.maxRecordsPerBatch": "1"},
    "codegen_off": {
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
    },
    "shuffle_1": {"spark.sql.shuffle.partitions": "1"},
    "broadcast_off": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "tiny_split": {
        "spark.sql.files.maxPartitionBytes": "65536",
        "spark.sql.files.openCostInBytes": "0",
    },
}


def run_profile(spark, name: str, confs: dict[str, str]) -> list[tuple[str, str]]:
    from test_oracle_parity import _duck, frames_match

    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    failures: list[tuple[str, str]] = []
    t0 = time.time()
    n = 0
    try:
        for qname, qd in sorted(all_queries().items()):
            if not qd.oracle:
                continue
            n += 1
            try:
                got = qd.fn(spark, SF_DIR).toPandas()
                con = _duck(SF_DIR)
                want = con.execute(qd.oracle).df()
                con.close()
                if not frames_match(got, want):
                    failures.append((qname, "mismatch"))
            except Exception as exc:  # noqa: BLE001 — survey, report at end
                failures.append((qname, repr(exc)[:200]))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    status = "GREEN" if not failures else f"FAILURES: {failures}"
    print(f"[{name}] {n} queries in {time.time() - t0:.1f}s — {status}", flush=True)
    return failures


def main() -> None:
    wanted = sys.argv[1:] or list(PROFILES)
    unknown = [p for p in wanted if p not in PROFILES]
    if unknown:
        sys.exit(f"unknown profile(s): {unknown}; known: {list(PROFILES)}")
    spark = get_spark("conf-sweep")
    all_failures: dict[str, list] = {}
    for p in wanted:
        f = run_profile(spark, p, PROFILES[p])
        if f:
            all_failures[p] = f
    print(
        "conf sweep:",
        "ALL GREEN" if not all_failures else f"DIVERGENCES: {all_failures}",
    )
    sys.exit(1 if all_failures else 0)


if __name__ == "__main__":
    main()
