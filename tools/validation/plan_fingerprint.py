"""Catalog-wide plan fingerprints — the _PLAN_CHANGED derivation tool.

The catalog's certification overlay (plans/catalog.py _PLAN_CHANGED)
needs one judgement per round: which queries' expression trees changed
since their last green driver row. Hand-auditing helper fan-out misses
cases (the r8 corpus_sink miss, ADVICE r8 item 4), so this captures a
NORMALIZED optimized-logical-plan string per catalog query that two
checkouts can diff mechanically:

    python tools/validation/plan_fingerprint.py /tmp/fp_head.json
    (cd <other-tree> && python tools/validation/plan_fingerprint.py /tmp/fp_base.json)
    python tools/validation/plan_fingerprint.py --diff /tmp/fp_base.json /tmp/fp_head.json

Normalization strips everything that varies per process without the
tree changing: expression ids (#123), plan ids, scratch/temp paths,
cache-builder storage detail, object hashes. Construction runs with the
query memo disabled so every fn builds fresh. Queries whose
construction fails (e.g. an environment-dependent source) record the
exception repr — a diff on that is still a signal.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ["SPARK_GRAFT_QUERY_MEMO"] = "0"

_NORM = [
    (re.compile(r"#\d+[L]?"), "#N"),
    # lambda variable names carry a process-global counter (x_68 vs
    # x_64 for the same tree) — name them uniformly
    (re.compile(r"lambda ([a-z]+)_\d+"), r"lambda \1"),
    (re.compile(r"plan_id=\d+"), "plan_id=N"),
    (re.compile(r"@[0-9a-f]{6,}"), "@ADDR"),
    (re.compile(r"file:/[^\s,\)\]]+"), "file:PATH"),
    (re.compile(r"/tmp/[^\s,\)\]]+"), "PATH"),
    (re.compile(r"dionysus_ckpt_[^\s,/\)\]]+"), "CKPT"),
    (re.compile(r"[0-9a-f]{32}"), "HEX32"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics()"),
    (re.compile(r"StorageLevel\([^)]*\)"), "StorageLevel()"),
    (re.compile(r"cachedName=[^,\)\]]+"), "cachedName=X"),
]


def _normalize(plan: str) -> str:
    for rx, rep in _NORM:
        plan = rx.sub(rep, plan)
    return plan


def _capture(out_path: str) -> None:
    from dionysus_rb_spark.plans import all_queries
    from dionysus_rb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_FP_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plan-fingerprint")
    fps: dict[str, str] = {}
    for name, qd in sorted(all_queries().items()):
        spark.catalog.clearCache()
        try:
            df = qd.fn(spark, sf_dir)
            fps[name] = _normalize(
                df._jdf.queryExecution().optimizedPlan().toString()
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            fps[name] = f"CONSTRUCTION-ERROR {type(exc).__name__}: {exc}"
        print("fp", name, file=sys.stderr)
    with open(out_path, "w") as fh:
        json.dump(fps, fh, indent=0)
    spark.stop()


def _diff(base_path: str, head_path: str) -> None:
    base = json.load(open(base_path))
    head = json.load(open(head_path))
    changed = sorted(
        n for n in head if n in base and base[n] != head[n]
    )
    added = sorted(n for n in head if n not in base)
    removed = sorted(n for n in base if n not in head)
    print(json.dumps({"changed": changed, "added": added, "removed": removed}, indent=2))


if __name__ == "__main__":
    if sys.argv[1] == "--diff":
        _diff(sys.argv[2], sys.argv[3])
    else:
        _capture(sys.argv[1])
