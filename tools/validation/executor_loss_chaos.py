"""Executor-loss chaos: results must survive losing a whole executor.

The task-retry chaos sweep (task_retry_chaos.py) proves per-task
re-execution is safe; this harness proves the coarser failure that
dominates real clusters — an EXECUTOR dies mid-query (spot reclamation,
OOM kill, hardware loss), taking with it every running task, every
shuffle block it wrote, and every cached partition it held. Spark's
recovery path is categorically different from a task retry: shuffle
fetches from the dead executor fail (FetchFailed), the scheduler
resubmits the finished map stages that lost their output, and cached
partitions are recomputed from lineage. At 1000 executors this is the
steady state; a query is executor-loss-safe iff its result is
bit-identical to the no-failure run afterward.

Mechanics: a ``local-cluster[2,4,2048]`` session runs real executor
JVMs (separate processes — unlike ``local[N]``, they can actually die).
For each probed query we first time a clean run on the same cluster,
then re-run it while a timer thread SIGKILLs one live
CoarseGrainedExecutorBackend process ~40% into the measured duration
(retrying at shorter delays if a run finishes before the kill lands —
the kill must land DURING execution to count). The standalone worker
respawns a replacement executor, so each probe starts from a healthy
2-executor cluster. The chaos result must match the DuckDB oracle
exactly (the driver's hash discipline).

The probed set deliberately spans the recovery surfaces: multi-stage
shuffle DAGs (dd_dedup_final's LSH -> connected components,
samp_cluster_split), a persisted/cached staged frame whose partitions
die with the executor (pipe_full_curation), a broadcast-model pipeline
(t_lm_quality), and the two write-path roundtrips where the commit
protocol must discard the dead executor's attempt files
(pipe_corpus_shard_roundtrip, pipe_jsonl_ingest_roundtrip).

A second mode sweeps BREADTH instead of depth: ``--rolling`` runs the
ENTIRE oracle-bearing catalog once (batch + streaming twins) while a
daemon thread SIGKILLs one executor every ROLLING_KILL_EVERY_S seconds
for the whole sweep — the single-host analogue of a spot fleet where
reclamation is uncorrelated with query boundaries. Every query must
match its oracle exactly; the sweep also asserts a minimum number of
kills actually happened so a quiet killer can't green it vacuously.

Usage:
    python tools/validation/executor_loss_chaos.py [sf_dir]
    python tools/validation/executor_loss_chaos.py --rolling [sf_dir]
Exit 0 = every probed query had an executor killed mid-run (targeted
mode) / every catalog query stayed exact under continuous kills
(rolling mode).
"""

from __future__ import annotations

import os
import signal
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

PROBED = (
    "dd_dedup_final",
    "samp_cluster_split",
    "pipe_full_curation",
    "t_lm_quality",
    "pipe_corpus_shard_roundtrip",
    "pipe_jsonl_ingest_roundtrip",
    # Streaming: the kill lands mid-stream — applyInPandasWithState
    # state must reload from the checkpoint's state store and the
    # foreachBatch MERGE must stay idempotent across the retried batch.
    "stream_t1_replay_dedup",
    "stream_t4_sessionize",
    "stream_t5_snapshot_merge",
)

KILL_FRACTION = 0.4
RETRY_FRACTIONS = (0.15, 0.05)  # if a run beats the timer, aim earlier
ROLLING_KILL_EVERY_S = 12.0
ROLLING_MIN_KILLS = 10


def _is_descendant(pid: int) -> bool:
    """Walk the ppid chain: only this process's executors are targets —
    a concurrent Spark app on the host must never be collateral."""
    me = os.getpid()
    for _ in range(32):
        if pid == me:
            return True
        try:
            stat = Path(f"/proc/{pid}/stat").read_text()
        except OSError:
            return False
        pid = int(stat.rsplit(")", 1)[1].split()[1])  # field 4 = ppid
        if pid <= 1:
            return False
    return False


def executor_pids() -> set[int]:
    """PIDs of live CoarseGrainedExecutorBackend JVMs spawned by THIS
    process (never the driver, never another app's executors)."""
    pids = set()
    for p in Path("/proc").iterdir():
        if not p.name.isdigit():
            continue
        try:
            cmd = (p / "cmdline").read_bytes()
        except OSError:
            continue
        if b"CoarseGrainedExecutorBackend" in cmd and _is_descendant(
            int(p.name)
        ):
            pids.add(int(p.name))
    return pids


def wait_for_executors(n: int, timeout: float = 120.0) -> set[int]:
    t0 = time.time()
    while time.time() - t0 < timeout:
        pids = executor_pids()
        if len(pids) >= n:
            return pids
        time.sleep(0.5)
    raise TimeoutError(f"cluster never reached {n} executors")


class Killer(threading.Thread):
    def __init__(self, delay: float):
        super().__init__(daemon=True)
        self.delay = delay
        self.killed_pid: int | None = None
        self.killed_at: float | None = None
        self._cancel = threading.Event()

    def cancel(self) -> None:
        """Disarm: a killer whose window was missed must never fire into
        a later run's measurement (or starve the respawning cluster)."""
        self._cancel.set()

    def run(self) -> None:
        if self._cancel.wait(self.delay):
            return
        pids = executor_pids()
        # re-check after the /proc scan: cancel() during the scan must
        # win (a microsecond race between this check and the kill
        # remains; the generous post-cancel join below absorbs it)
        if self._cancel.is_set() or not pids:
            return
        pid = min(pids)  # deterministic victim
        try:
            os.kill(pid, signal.SIGKILL)
        except OSError:
            return
        self.killed_pid = pid
        self.killed_at = time.time()


class RollingKiller(threading.Thread):
    """Kill one executor every ``every_s`` seconds while ``active``."""

    def __init__(self, every_s: float):
        super().__init__(daemon=True)
        self.every_s = every_s
        self.active = True
        self.kills = 0

    def run(self) -> None:
        while self.active:
            time.sleep(self.every_s)
            pids = executor_pids()
            if len(pids) < 2:  # never starve the cluster entirely
                continue
            try:
                os.kill(min(pids), signal.SIGKILL)
                self.kills += 1
            except OSError:
                pass


def _build_session():
    os.environ["PYSPARK_PYTHON"] = sys.executable
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("executor-loss-chaos")
        .config(
            "spark.executorEnv.PYTHONPATH", f"{REPO}:{REPO / 'tests'}"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _oracle_matches(got, qd, sf_dir) -> bool:
    from test_oracle_parity import _duck, frames_match

    con = _duck(sf_dir)
    want = con.execute(qd.oracle).df()
    con.close()
    return frames_match(got, want)


def rolling_main(sf_dir: str) -> None:
    from dionysus_rb_spark.plans import all_queries

    spark = _build_session()
    killer = RollingKiller(ROLLING_KILL_EVERY_S)
    killer.start()
    failures: list[tuple[str, str]] = []
    n_run = 0
    t0 = time.time()
    for name, qd in sorted(all_queries().items()):
        if not qd.oracle:
            continue
        n_run += 1
        try:
            got = qd.fn(spark, sf_dir).toPandas()
            if not _oracle_matches(got, qd, sf_dir):
                failures.append((name, "mismatch"))
        except Exception as exc:  # noqa: BLE001 — survey, report at end
            failures.append((name, repr(exc)[:200]))
    killer.active = False
    elapsed = time.time() - t0
    spark.stop()
    print(
        f"rolling executor-loss sweep: {n_run} queries in {elapsed:.0f}s, "
        f"{killer.kills} executors killed; "
        f"failures: {failures if failures else 'NONE (all green)'}"
    )
    if killer.kills < ROLLING_MIN_KILLS:
        print(
            f"VACUOUS: only {killer.kills} kills (< {ROLLING_MIN_KILLS}) — "
            "sweep too fast or killer starved; not a valid pass"
        )
        sys.exit(1)
    sys.exit(1 if failures else 0)


def main() -> None:
    from dionysus_rb_spark.plans import all_queries

    args = [a for a in sys.argv[1:] if a != "--rolling"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    if "--rolling" in sys.argv[1:]:
        rolling_main(args[0] if args else "/root/testdata/sf0.001")
        return
    spark = _build_session()
    qs = all_queries()
    failures: list[tuple[str, str]] = []
    for name in PROBED:
        qd = qs[name]
        wait_for_executors(2)
        t0 = time.time()
        qd.fn(spark, sf_dir).toPandas()  # clean timing run (same cluster)
        clean_s = time.time() - t0
        landed = False
        crashed: str | None = None
        for frac in (KILL_FRACTION, *RETRY_FRACTIONS):
            wait_for_executors(2)
            killer = Killer(delay=max(0.2, clean_s * frac))
            t0 = time.time()
            killer.start()
            try:
                got = qd.fn(spark, sf_dir).toPandas()
            except Exception as exc:  # noqa: BLE001 — the find, not noise
                killer.cancel()
                if killer.killed_pid is None:
                    # died before the kill fired: an environment problem,
                    # not the executor-loss verdict — report it as such
                    crashed = f"pre-kill crash: {repr(exc)[:280]}"
                else:
                    # A crash after the kill landed IS the failure mode
                    # this harness exists to catch (localCheckpoint's
                    # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND surfaced here).
                    crashed = repr(exc)[:300]
                landed = True
                break
            t1 = time.time()
            killer.cancel()  # disarm a still-pending timer before retrying
            # generous join: the thread must be fully finished (not mid
            # /proc-scan, able to fire a stray kill) before the next
            # attempt's measurement starts
            killer.join(timeout=10.0)
            if killer.killed_pid is not None and killer.killed_at < t1:
                landed = True
                break
            print(f"{name}: kill missed at frac={frac} — retrying earlier")
        if crashed is not None:
            print(f"{name}: CRASHED after executor loss: {crashed}")
            failures.append((name, f"crash: {crashed}"))
            continue
        if not landed:
            failures.append((name, "kill never landed mid-run"))
            continue
        ok = _oracle_matches(got, qd, sf_dir)
        status = "EXACT" if ok else "MISMATCH"
        print(
            f"{name}: clean {clean_s:.1f}s, killed executor "
            f"{killer.killed_pid} at +{killer.killed_at - t0:.1f}s, "
            f"chaos run {t1 - t0:.1f}s -> {status}"
        )
        if not ok:
            failures.append((name, "result mismatch after executor loss"))
    spark.stop()
    print(
        f"executor-loss chaos: {len(PROBED)} queries; "
        f"failures: {failures if failures else 'NONE (all green)'}"
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
