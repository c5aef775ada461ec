"""Speculative-execution probe: can this sandbox exercise speculation?

Answer (measured, reproducible by running this script): **no** — and
the probe documents exactly why, so the gap is an environmental fact
rather than an untested assumption.

At 1000 executors, speculative execution is the steady state of
straggler mitigation: once a stage's quantile of tasks finishes, every
slow remainder gets a concurrent duplicate attempt and the two race to
commit. A result is speculation-safe iff (a) task output is a
deterministic function of the input split and (b) the output committer
dedups attempt outputs. This is the SAME contract task retries demand
— speculation is re-execution that races instead of follows — and that
contract is certified by tools/validation/task_retry_chaos.py (564
injected first-attempt failures across every batch catalog query,
exact oracle parity). Sinks go through Spark's commit protocol
(DataFrameWriter / foreachBatch MERGE), which serializes attempt
commits via the OutputCommitCoordinator.

What this probe demonstrates, in order:

1. ``local[N]`` (the test master): TaskSchedulerImpl.start() guards the
   speculation thread on ``!isLocal`` — ``spark.speculation=true`` is
   silently inert. No ``task-scheduler-speculation`` thread exists.
2. ``local-cluster[2,4,2048]`` (real executor JVMs, one host): the
   speculation thread RUNS, yet with maximally aggressive knobs
   (quantile=0, multiplier=1, interval=100ms, efficiency gate off), a
   15s straggler holding 4 of 16 tasks while 4 slots sit free launches
   ZERO speculative attempts (verified via the status REST API's
   per-task ``speculative`` flag). Cause: TaskSetManager's
   dequeueSpeculativeTask refuses any candidate host that already has
   an attempt of that task (``!hasAttemptOnHost``) — and a single-host
   cluster has no other host. Speculation is structurally unlaunchable
   on one machine, independent of configuration.

So a conf-sweep "speculation" profile would be vacuously green here —
worse than no coverage, because it would LOOK like coverage. We keep
the speculation-safety claim pinned to the chaos harness instead, and
this probe exists so a future run on a real multi-host cluster can
flip the check: on >= 2 hosts, stage 2 below SHOULD count speculative
attempts > 0, at which point the full catalog can be swept under the
same profile.

Usage: python tools/validation/speculation_probe.py
Exit 0 = environment behaves as documented above (sandbox cannot
speculate); exit 1 = behavior changed (e.g. multi-host — upgrade the
sweep).
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

SPEC_CONF = {
    "spark.speculation": "true",
    "spark.speculation.interval": "100ms",
    "spark.speculation.multiplier": "1.0",
    "spark.speculation.quantile": "0.0",
    "spark.speculation.efficiency.enabled": "false",
}


def _speculation_thread_names(sc) -> list[str]:
    threads = sc._jvm.java.lang.Thread.getAllStackTraces().keySet().toArray()
    return sorted(
        t.getName() for t in threads if "specul" in t.getName().lower()
    )


def _straggler_job(sc) -> None:
    """16 tasks on 8 cores; the second wave's top 4 sleep 15s.

    After the 4 fast second-wave tasks finish, 4 slots are free while
    4 stragglers run — the canonical speculation trigger shape.
    """

    def work(it):
        idx = list(it)
        if idx and idx[0] >= 12:
            time.sleep(15)
        return iter(idx)

    n = sc.parallelize(range(16), 16).mapPartitions(work).count()
    assert n == 16


def probe_local() -> bool:
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[8]")
        .appName("speculation-probe-local")
        .config("spark.ui.enabled", "false")
    )
    for k, v in SPEC_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    try:
        names = _speculation_thread_names(spark.sparkContext)
        print(f"local[8]: speculation threads = {names}")
        return names == []  # expected: guard on !isLocal keeps it off
    finally:
        spark.stop()


def probe_local_cluster() -> tuple[bool, int]:
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("speculation-probe-cluster")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4444")
    )
    for k, v in SPEC_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    try:
        sc = spark.sparkContext
        names = _speculation_thread_names(sc)
        print(f"local-cluster: speculation threads = {names}")
        thread_runs = names == ["task-scheduler-speculation"]
        _straggler_job(sc)
        # uiWebUrl, not a hardcoded port: Spark silently walks to 4445+
        # when 4444 is taken (spark.port.maxRetries)
        url = (
            f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
            "/stages/0/0/taskList?length=100"
        )
        tasks = json.load(urllib.request.urlopen(url))
        n_spec = sum(1 for t in tasks if t.get("speculative"))
        print(
            f"local-cluster: {len(tasks)} task attempts, "
            f"{n_spec} speculative (host-level attempt exclusion on a "
            "single host => expected 0)"
        )
        return thread_runs, n_spec
    finally:
        spark.stop()


def main() -> None:
    local_inert = probe_local()
    cluster_thread, n_spec = probe_local_cluster()
    if not local_inert:
        sys.exit("UNEXPECTED: local[N] started a speculation thread")
    if not cluster_thread:
        sys.exit("UNEXPECTED: local-cluster did not start the speculation thread")
    if n_spec > 0:
        sys.exit(
            f"ENVIRONMENT CHANGED: {n_spec} speculative attempts launched — "
            "this host can now exercise speculation; promote the probe to a "
            "full-catalog conf-sweep profile (see module docstring)"
        )
    print(
        "CONFIRMED: speculation is structurally unlaunchable in this "
        "sandbox (single host); speculation-safety stays certified via "
        "task_retry_chaos.py's determinism-under-reexecution sweep"
    )


if __name__ == "__main__":
    main()
