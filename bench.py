"""Benchmark harness: runs the headline (bench=True) catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via the noop sink (no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dionysus_rb_spark.plans import all_queries
from dionysus_rb_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    spark = get_spark("dionysus-rb-spark-bench")

    qdefs = {n: q for n, q in sorted(all_queries().items()) if q.bench}
    # warm the JVM + parquet footers once with the cheapest action
    next(iter(qdefs.values())).fn(spark, sf_dir).limit(1).count() if qdefs else None

    # best of 2: the first run pays codegen/JIT/page-cache warmup, which
    # varies ~3x run-to-run locally; the min is the stable signal
    timings: dict[str, float] = {}
    for name, qd in qdefs.items():
        best = None
        for _ in range(2):
            # drop any persisted intermediates so run 2 measures the
            # full pipeline, not run 1's cache
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
