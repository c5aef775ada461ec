"""Per-query bench profiler (optimization round instrument, guide §1).

Runs every bench-flagged catalog query through the same noop-sink
methodology as bench.py, but with the Spark event log enabled, then
parses the log to attribute per query:

  wall      noop-write wall seconds (pass 2 of 2 — warm)
  jobs      Spark jobs launched (driver roundtrips: AQE stages,
            persist materializations, CC convergence loops, collects)
  stages    completed stages
  tasks     completed tasks
  task_sec  sum of task executor run time (the actual compute)
  fetch_sec sum of shuffle fetch wait
  gc_sec    sum of JVM GC time inside tasks
  sh_MB     shuffle bytes written (MB)

wall >> task_sec/32 means the query is overhead-bound (scheduling,
planning, driver roundtrips), not compute-bound — the fix is fewer
jobs/stages, not faster expressions. Usage:

  python tools/validation/bench_profile.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from dionysus_rb_spark.plans import all_queries  # noqa: E402
from dionysus_rb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])
    evdir = tempfile.mkdtemp(prefix="sparkevents_")

    import dionysus_rb_spark.session as sess

    orig_get = sess.get_spark

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("bench-profile")
        .master(f"local[{cpus}]")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file:{evdir}")
        # the sandbox has no zstd binary and no python zstandard module,
        # so the parse below can only read plain-text event logs
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sess.apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("WARN")
    assert orig_get  # keep import referenced

    qdefs = {n: q for n, q in sorted(all_queries().items()) if q.bench}
    if only:
        qdefs = {n: q for n, q in qdefs.items() if n in only}

    walls: dict[str, list[float]] = {}
    for passno in range(2):
        for name, qd in qdefs.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobGroup(f"q:{name}:{passno}", name)
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.setdefault(name, []).append(time.perf_counter() - t0)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse event log; Spark 4 rolls logs into an eventlog_v2_<appId>/
    # directory of events_* part files, older layouts use a flat file
    path = os.path.join(evdir, app_id)
    v2dir = os.path.join(evdir, f"eventlog_v2_{app_id}")
    if os.path.isdir(v2dir):
        parts = sorted(
            p for p in os.listdir(v2dir) if p.startswith("events_")
        )
        paths = [os.path.join(v2dir, p) for p in parts]
    else:
        paths = [path]
    job_group: dict[int, str] = {}
    job_pass: dict[int, int] = {}
    stage_job: dict[int, int] = {}
    agg: dict[tuple[str, int], dict[str, float]] = {}

    def acc(name: str, p: int, **kw: float) -> None:
        d = agg.setdefault((name, p), {})
        for k, v in kw.items():
            d[k] = d.get(k, 0.0) + v

    def _open(p):
        if p.endswith(".zstd"):
            # no python zstandard module in the sandbox; shell out
            import io
            import subprocess

            proc = subprocess.Popen(
                ["zstd", "-dc", p], stdout=subprocess.PIPE
            )
            return io.TextIOWrapper(proc.stdout)
        return open(p)

    def _lines():
        for p in paths:
            with _open(p) as fh:
                yield from fh

    if True:
        for line in _lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                grp = (ev.get("Properties") or {}).get("spark.jobGroup.id", "")
                if grp.startswith("q:"):
                    _, qname, p = grp.split(":")
                    jid = ev["Job ID"]
                    job_group[jid] = qname
                    job_pass[jid] = int(p)
                    for s in ev.get("Stage IDs", []):
                        stage_job[s] = jid
                    acc(qname, int(p), jobs=1)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                jid = stage_job.get(si["Stage ID"])
                if jid in job_group:
                    acc(
                        job_group[jid],
                        job_pass[jid],
                        stages=1,
                        tasks=si.get("Number of Tasks", 0),
                    )
            elif e == "SparkListenerTaskEnd":
                jid = stage_job.get(ev["Stage ID"])
                if jid in job_group:
                    m = ev.get("Task Metrics") or {}
                    sw = m.get("Shuffle Write Metrics") or {}
                    sr = m.get("Shuffle Read Metrics") or {}
                    acc(
                        job_group[jid],
                        job_pass[jid],
                        task_sec=m.get("Executor Run Time", 0) / 1e3,
                        gc_sec=m.get("JVM GC Time", 0) / 1e3,
                        fetch_sec=sr.get("Fetch Wait Time", 0) / 1e3,
                        sh_mb=sw.get("Shuffle Bytes Written", 0) / 1e6,
                        deser_sec=m.get("Executor Deserialize Time", 0) / 1e3,
                    )

    hdr = (
        f"{'query':32s} {'wall':>6s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s}"
        f" {'task_s':>7s} {'deser_s':>7s} {'gc_s':>6s} {'fetch_s':>7s} {'sh_MB':>7s}"
    )
    print(hdr)
    tot = {"wall": 0.0}
    for name in qdefs:
        d = agg.get((name, 1), {})
        w = walls[name][1]
        tot["wall"] += w
        for k in ("jobs", "stages", "tasks", "task_sec", "deser_sec", "gc_sec", "fetch_sec", "sh_mb"):
            tot[k] = tot.get(k, 0.0) + d.get(k, 0)
        print(
            f"{name:32s} {w:6.2f} {int(d.get('jobs', 0)):5d} {int(d.get('stages', 0)):6d}"
            f" {int(d.get('tasks', 0)):6d} {d.get('task_sec', 0):7.2f}"
            f" {d.get('deser_sec', 0):7.2f} {d.get('gc_sec', 0):6.2f}"
            f" {d.get('fetch_sec', 0):7.2f} {d.get('sh_mb', 0):7.2f}"
        )
    print(
        f"{'TOTAL':32s} {tot['wall']:6.2f} {int(tot.get('jobs', 0)):5d}"
        f" {int(tot.get('stages', 0)):6d} {int(tot.get('tasks', 0)):6d}"
        f" {tot.get('task_sec', 0):7.2f} {tot.get('deser_sec', 0):7.2f}"
        f" {tot.get('gc_sec', 0):6.2f} {tot.get('fetch_sec', 0):7.2f}"
        f" {tot.get('sh_mb', 0):7.2f}"
    )
    print(f"event log: {paths[0]}")


if __name__ == "__main__":
    main()
