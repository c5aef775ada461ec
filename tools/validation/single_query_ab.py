"""Interleaved single-query A/B across two checkouts (VERDICT r11
item 7 — the dd_dedup_final watch item: the r11 quiet pair read 1.28x
vs the r10-tree control on a PLAN-UNTOUCHED query with 1.23 intra-run
spread, i.e. almost certainly noise; this instrument settles it).

Each leg is a FRESH python subprocess whose sys.path points at one
tree; inside it the query runs ``passes`` times via the noop sink
(clearCache between passes, pass 1 excluded as warmup) and the leg
reports its min. Legs alternate A,B,A,B,... so host drift hits both
trees equally — the same discipline as the quiet-bench sandwich, but
per query, so a 2x drift over the ~20-minute bench window can't
masquerade as a tree difference on a 3-second query.

Usage: python tools/validation/single_query_ab.py <query> <treeA> <treeB>
           [--legs=4] [--passes=4] [--sf=/root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import subprocess
import sys

_LEG_BODY = r"""
import json, sys, time
tree, query, sf_dir, passes = sys.argv[1:5]
passes = int(passes)
sys.path.insert(0, tree)
from dionysus_rb_spark.plans import all_queries
from dionysus_rb_spark.session import get_spark
spark = get_spark("single-query-ab")
qd = all_queries()[query]
times = []
for _ in range(passes):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    times.append(time.perf_counter() - t0)
print("ABLEG " + json.dumps({"tree": tree, "times": times}))
spark.stop()
"""


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    query, tree_a, tree_b = args[:3]
    legs = next(
        (int(a.split("=", 1)[1]) for a in sys.argv[1:] if a.startswith("--legs=")),
        4,
    )
    passes = next(
        (int(a.split("=", 1)[1]) for a in sys.argv[1:] if a.startswith("--passes=")),
        4,
    )
    sf_dir = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--sf=")),
        "/root/testdata/sf0.1",
    )
    if passes < 2:
        raise SystemExit(
            "--passes must be >= 2: pass 1 is warmup and is excluded "
            "from every leg's min"
        )
    results: dict[str, list[list[float]]] = {tree_a: [], tree_b: []}
    for leg in range(legs):
        for tree in (tree_a, tree_b):
            proc = subprocess.run(
                [sys.executable, "-c", _LEG_BODY, tree, query, sf_dir, str(passes)],
                capture_output=True,
                text=True,
                cwd=tree,
            )
            line = next(
                (
                    ln
                    for ln in proc.stdout.splitlines()
                    if ln.startswith("ABLEG ")
                ),
                None,
            )
            if line is None:
                sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
                raise SystemExit(f"leg failed for {tree}")
            times = json.loads(line[len("ABLEG ") :])["times"]
            results[tree].append(times)
            warm = times[1:]
            print(
                f"leg {leg} {tree}: min={min(warm):.2f}s "
                f"warm={[round(t, 2) for t in warm]}"
            )

    def summary(tree: str):
        warm_mins = [min(t[1:]) for t in results[tree]]
        return min(warm_mins), warm_mins

    a_min, a_all = summary(tree_a)
    b_min, b_all = summary(tree_b)
    print(
        json.dumps(
            {
                "query": query,
                "sf": sf_dir,
                "legs": legs,
                "passes_per_leg": passes,
                "a": {"tree": tree_a, "min": round(a_min, 3), "leg_mins": [round(t, 3) for t in a_all]},
                "b": {"tree": tree_b, "min": round(b_min, 3), "leg_mins": [round(t, 3) for t in b_all]},
                "a_over_b": round(a_min / b_min, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
