"""Incremental delta-gate throughput at corpus scale (SCALING.md r9).

Splits the tiered corpus (corpus500k.build_corpus) into a 25% delta
(doc_id % 4 = 0) and a 75% index, runs
operators/minhash.delta_dedup_gate (threshold 0.5), and reports wall
time, delta docs/s, and the admit/reject census. The decision contract
is checkable against the corpus construction: a delta member of a
J >= 0.5 tier group is rejected iff it BANDS with a group-mate on the
index side (its 10-doc group has 7-8 index members), a tier-0.45
member must always be admitted (verify gate), and unique docs must
always be admitted (10,240-token vocab — no accidental near-dups).

Usage: python tools/validation/delta_gate_scale.py [n_docs]
           [--indexed-only]
``--indexed-only`` skips the inline gate and the exceptAll
cross-check (both already proven at this scale) and measures just the
production cadence — index build + repeated per-batch gates — plus the
subtree RSS high-water, to answer the capacity question separately
from the whole-corpus dedup's documented 48g floor.
Foreground runs only (background execution is CPU-throttled in this
sandbox — SCALING.md round-7 methodology note).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from dionysus_rb_spark.operators.minhash import delta_dedup_gate
from dionysus_rb_spark.session import get_spark
from tools.validation.corpus500k import (
    GROUP,
    N_DUP_GROUPS,
    N_TIERS,
    build_corpus,
)

N_MEMBERS = N_DUP_GROUPS * GROUP


def main() -> None:
    nums = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(float(nums[0])) if nums else 1_000_000
    # --mod=N shrinks the delivery (delta = doc_id % N == 0) without
    # touching the index side — the knob for the capacity question
    # "does gate memory track the delivery or the corpus?"
    mod = next(
        (int(a.split("=", 1)[1]) for a in sys.argv[1:] if a.startswith("--mod=")),
        4,
    )
    out = REPO / ".scratch" / f"deltagate{n_docs // 1000}k"
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark()
    build_corpus(spark, out, n_docs)
    docs = spark.read.parquet(str(out / "documents.parquet"))

    # the index side is FIXED (75% of the corpus); --mod only shrinks
    # the delivery, as a subset of the default delta
    delta = docs.filter(
        (F.col("doc_id") % 4 == 0) & (F.col("doc_id") % mod == 0)
    )
    index = docs.filter(F.col("doc_id") % 4 != 0)
    n_delta = delta.count()

    # the contract census is computed DISTRIBUTIVELY (groupBy over a
    # derived class column, collect 3 aggregate rows) — a full collect
    # of the decision frame would be driver-sized at 1e7 delta rows,
    # exactly the anti-pattern the plan-collect lint bans in plans/
    cls = (
        F.when(F.col("doc_id") >= N_MEMBERS, F.lit("unique"))
        .when(
            F.pmod((F.col("doc_id") / GROUP).cast("long"), F.lit(N_TIERS))
            == 0,
            F.lit("control"),
        )
        .otherwise(F.lit("member"))
    )

    def census(decisions):
        rows = (
            decisions.groupBy(cls.alias("cls"))
            .agg(
                F.count("*").alias("n"),
                F.sum((F.col("kept") == 0).cast("long")).alias("rejected"),
            )
            .collect()
        )
        # free the gate's pinned shingle/candidate relations: back-to-back
        # gates in this loop otherwise stack session-lifetime persisted
        # frames (ADVICE r9 item 2 — the reason GateDecision.release exists)
        decisions.release()
        return {r["cls"]: (r["n"], r["rejected"]) for r in rows}

    if "--indexed-only" in sys.argv:
        from dionysus_rb_spark.operators.minhash import (
            build_dedup_index,
            delta_dedup_gate_indexed,
        )
        from tools.validation.corpus500k import _RssHighWater

        rss = _RssHighWater()
        idx = str(out / "dedup_index")
        # reuse a previously built index when present: the build is the
        # one-time corpus-sized job (it gets corpus-sized memory — like
        # the whole-corpus dedup it needs ~48g at 1e7 on this host);
        # what must stay light is the per-DELIVERY gate, so a second
        # invocation at DEFAULT driver memory measures exactly that
        manifest_file = Path(idx) / "_dedup_index_manifest.json"
        reusable = False
        if manifest_file.exists():
            import json as _json

            # a pre-segment (r9-era) index has no epoch and no commit
            # markers — rebuild it rather than reuse
            reusable = "epoch" in _json.loads(manifest_file.read_text())
        if reusable:
            t_build = 0.0
            print(f"reusing existing index at {idx}")
        else:
            t0 = time.time()
            build_dedup_index(index, idx, "text", "doc_id", k=3)
            t_build = time.time() - t0
        per_batch = []
        got = None
        for _ in range(3):
            t0 = time.time()
            got = census(
                delta_dedup_gate_indexed(
                    delta, idx, "text", "doc_id", threshold=0.5
                )
            )
            per_batch.append(time.time() - t0)
        assert sum(n for n, _ in got.values()) == n_delta
        assert got.get("unique", (0, 0))[1] == 0
        assert got.get("control", (0, 0))[1] == 0
        print(
            f"indexed-only at {n_docs:,} docs: build {t_build:.1f}s, "
            f"per-batch {min(per_batch):.1f}s "
            f"({n_delta / min(per_batch):,.0f} delta docs/s), "
            f"member rejects {got.get('member', (0, 0))[1]:,} "
            f"(member class empty when the --mod stride aliases the "
            f"tier round-robin: stride/GROUP % N_TIERS == 0), subtree RSS "
            f"high-water {rss.stop_gb():.1f} GiB"
        )
        spark.stop()
        return

    t0 = time.time()
    inline = census(
        delta_dedup_gate(delta, index, "text", "doc_id", threshold=0.5)
    )
    dt = time.time() - t0
    n_seen = sum(n for n, _ in inline.values())
    n_rej = sum(r for _, r in inline.values())
    print(
        f"delta gate at {n_docs:,} docs ({n_delta:,} delta vs "
        f"{n_docs - n_delta:,} index): {dt:.1f}s "
        f"({n_delta / dt:,.0f} delta docs/s), "
        f"admitted {n_seen - n_rej:,}, rejected {n_rej:,}"
    )
    assert n_seen == n_delta
    assert inline.get("unique", (0, 0))[1] == 0, "unique docs must be admitted"
    assert inline.get("control", (0, 0))[1] == 0, "J=0.45 tier must be admitted"
    print(
        f"member census: {inline['member'][0]:,} delta members, "
        f"{inline['member'][1]:,} rejected as already-in-corpus "
        f"(banding recall at each tier per COVERAGE.md model), "
        f"0 unique/control false rejects"
    )

    # -- amortization A/B: build the persisted index once, then gate
    # repeated batches against the files (the production cadence) and
    # compare per-batch cost with the inline gate that re-signs the
    # corpus every time. Decision-identity is checked distributively
    # (exceptAll both ways == empty), never via a driver-side collect.
    from dionysus_rb_spark.operators.minhash import (
        build_dedup_index,
        delta_dedup_gate_indexed,
    )

    idx = str(out / "dedup_index")
    t0 = time.time()
    build_dedup_index(index, idx, "text", "doc_id", k=3)
    t_build = time.time() - t0
    per_batch = []
    for _ in range(3):
        t0 = time.time()
        indexed_census = census(
            delta_dedup_gate_indexed(delta, idx, "text", "doc_id", threshold=0.5)
        )
        per_batch.append(time.time() - t0)
    assert indexed_census == inline
    inline_df = delta_dedup_gate(delta, index, "text", "doc_id", threshold=0.5)
    indexed_df = delta_dedup_gate_indexed(
        delta, idx, "text", "doc_id", threshold=0.5
    )
    diff = indexed_df.exceptAll(inline_df).count() + inline_df.exceptAll(
        indexed_df
    ).count()
    assert diff == 0, "indexed gate must be decision-identical to inline"
    inline_df.release()
    indexed_df.release()
    print(
        f"indexed path: build once {t_build:.1f}s, then per-batch "
        f"{min(per_batch):.1f}s ({n_delta / min(per_batch):,.0f} delta "
        f"docs/s) vs {dt:.1f}s inline — decisions identical "
        f"(exceptAll both ways = 0)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
