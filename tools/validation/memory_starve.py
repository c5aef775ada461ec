"""Memory starvation: heavy queries must SPILL, not die, on small heaps.

Every executor-memory claim so far ran on a 128 GiB single JVM — a
regime where nothing ever spills. A 1000-executor cluster is the
opposite: each task gets a fixed slice of a modest heap, and an
operator is only 100 TB-ready if its per-task working set is bounded
(hash aggregates spill to disk, sorts go external, Arrow batches are
capped) rather than proportional to its input slice.

This harness runs the heavyweight catalog queries at sf0.1 (606k docs
— 10x the driver's comparison scale) on a ``local-cluster[2,2,700]``:
two executors with 700 MB heap and 2 cores each, ~100x less memory per
core than the bench session. Anything that materializes an unbounded
per-task structure (a whole-partition pandas frame, an uncapped
collect_list, a hash table that can't spill) OOMs or dies here;
everything else spills and must still match its DuckDB oracle exactly.

The probed set is the expensive tail of the bench plus the operators
with per-task materialization risk: the LSH->CC dedup spine, the
curation pipeline (persisted staged frame under memory pressure —
cache blocks evict and recompute), the TF-IDF/LM model builds (wide
aggregates), MinHash/SimHash banding (explode-heavy), aggregate
assembly (collect_list nesting), the interval join (range-bucketed
expansion), and semantic dedup (vector math through Arrow batches).

Usage: python tools/validation/memory_starve.py [sf_dir]
Exit 0 = every probed query completed on the starved cluster and
matched its oracle exactly.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

PROBED = (
    "dd_dedup_final",
    "samp_cluster_split",
    "pipe_full_curation",
    "dd_minhash_lsh",
    "dd_simhash_wide",
    "t_tfidf_keywords",
    "t_lm_quality",
    "p3_aggregate_assembly",
    "ev_interval_join",
    "emb_semantic_dedup",
)


def main() -> None:
    os.environ["PYSPARK_PYTHON"] = sys.executable
    from pyspark.sql import SparkSession

    from dionysus_rb_spark.plans import all_queries
    from executor_loss_chaos import _oracle_matches

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local-cluster[2,2,700]")
        .appName("memory-starve")
        .config("spark.executor.memory", "700m")
        .config("spark.executorEnv.PYTHONPATH", f"{REPO}:{REPO / 'tests'}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs = all_queries()
    failures: list[tuple[str, str]] = []
    for name in PROBED:
        qd = qs[name]
        t0 = time.time()
        try:
            got = qd.fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001 — the find, not noise
            print(f"{name}: DIED on the starved cluster: {repr(exc)[:300]}")
            failures.append((name, repr(exc)[:200]))
            continue
        ok = _oracle_matches(got, qd, sf_dir)
        print(
            f"{name}: {time.time() - t0:.1f}s on 2x700MB -> "
            f"{'EXACT' if ok else 'MISMATCH'}"
        )
        if not ok:
            failures.append((name, "mismatch"))
    spark.stop()
    print(
        f"memory starvation: {len(PROBED)} queries at {sf_dir}; "
        f"failures: {failures if failures else 'NONE (all green)'}"
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
