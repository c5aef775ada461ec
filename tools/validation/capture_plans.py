"""Capture `.explain('formatted')` for every bench-flagged catalog query
into plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (optimization-round
evidence; the round dir defaults to r14).

Usage: python tools/validation/capture_plans.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from dionysus_rb_spark.plans import all_queries  # noqa: E402
from dionysus_rb_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
    outdir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "plans", rnd
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-capture")
    qdefs = {n: q for n, q in sorted(all_queries().items()) if q.bench}
    if only:
        qdefs = {n: q for n, q in all_queries().items() if n in only}
    for name, qd in qdefs.items():
        spark.catalog.clearCache()
        df = qd.fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "->", f"plans/{rnd}/{name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
