"""Regenerate tests/plan_shuffle_budgets.json.

Runs every catalog query at the given scale factor and records the
number of shuffle exchanges (hash / range / single-partition /
round-robin — NOT BroadcastExchange) in its executed plan. The parity
suite asserts each query's live plan stays AT OR UNDER its recorded
budget: an optimization that removes a shuffle passes (regenerate to
ratchet the budget down); a change that adds one fails until it is
justified and re-recorded here.

Budgets are recorded at sf0.01 — the driver's comparison scale — which
is the ceiling: at smaller scale AQE can only turn shuffled joins into
broadcasts (fewer exchanges), never the reverse. That argument does NOT
extend upward: at sf0.1 AQE may legitimately replace a broadcast with a
shuffled join, so the scale-up ritual gets its OWN recording — passing
an sf_dir other than sf0.01 writes plan_shuffle_budgets_<scale>.json
and tests/test_oracle_parity.py loads the file matching the scale it
runs at (ADVICE r5).

Usage:
    python tools/regen_shuffle_budgets.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# RoundRobinPartitioning is deliberately excluded: it only appears from
# the explicit scan-parallelism repartition after tiny-file loads, which
# is scale-dependent by design (present at sf0.001, absent once files
# split naturally). Hash / range / single-partition exchanges are where
# an accidental shuffle would surface.
SHUFFLE_PATTERN = (
    r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)"
)


def budget_filename(scale: str) -> str:
    """The single scale -> budget-file mapping, shared with
    tests/test_oracle_parity.py (ADVICE r6: the regen tool used to map
    only sf0.01 to the default file while the test also mapped sf0.001
    there, so an sf0.001 recording was written but never loaded).
    sf0.001/sf0.01 share the default file: the sf0.01 recording is a
    valid ceiling at or below its scale (AQE only ever REMOVES
    exchanges going down — modulo the excluded RoundRobin)."""
    if scale in ("sf0.001", "sf0.01"):
        return "plan_shuffle_budgets.json"
    return f"plan_shuffle_budgets_{scale}.json"


def shuffle_count(df) -> int:
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(SHUFFLE_PATTERN, plan))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from dionysus_rb_spark.plans import all_queries
    from dionysus_rb_spark.session import get_spark

    spark = get_spark()
    budgets: dict[str, int] = {}
    for name, qd in sorted(all_queries().items()):
        df = qd.fn(spark, sf_dir)
        # collect() executes THIS DataFrame's query execution, so its
        # adaptive plan finalizes (df.count() would spawn a separate
        # execution and leave df's own plan static — the parity test
        # reads the finalized plan after toPandas(), so the budget must
        # be recorded from the same shape).
        df.collect()
        budgets[name] = shuffle_count(df)
        print(f"{name}: {budgets[name]}")

    scale = Path(sf_dir.rstrip("/")).name
    out = REPO / "tests" / budget_filename(scale)
    if scale == "sf0.001":
        print(
            "note: sf0.001 writes the DEFAULT budget file (shared with "
            "sf0.01); regenerate at sf0.01 for the driver-scale ceiling"
        )
    out.write_text(json.dumps(budgets, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out} ({len(budgets)} queries)")


if __name__ == "__main__":
    main()
