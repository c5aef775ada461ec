"""Delivery-batching amortization curve (VERDICT r11 item 3).

The 30M scale entry names "batch more deliveries per gate" as the #1
production lever at extreme corpus:delivery ratios: gate latency is
dominated by the corpus-side index scan (the verify join's streaming
shingle-store pass), which is paid PER GATE, not per document — so the
per-document cost of gating should FALL roughly 1/size as the delivery
grows, until the delivery-side terms (its own signing + the keyed
join) start to matter. This harness measures that curve at a fixed
corpus: the tiered 10M corpus split 75% index / 25% delta
(corpus500k.build_corpus — the same artifact the ladder entries use),
gating deliveries of 62.5k / 125k / 250k / 500k / 1.25M docs (strides
of the delta: ``doc_id % mod == 0`` for mod in 160/80/40/20/8 — every
mod a multiple of 4 so the stride IS the mod, and none alias the tier
round-robin into the member-free classes) against the SAME persisted
index. (1.25M, not the verdict's nominal 1M: delta ids are multiples
of 4, so delta-strides quantize to 2.5M/j for integer j.)

Method: the index build is the one-time corpus-sized job (needs ~48g
at 1e7 on this host — run ``--build-only`` at SPARK_GRAFT_DRIVER_MEM=48g
first); the curve itself runs at the production default heap (8g),
which is the capacity claim under test — gate memory tracks the
delivery. Legs are interleaved ACROSS sizes (one full ladder per pass,
``--legs`` passes) so a load drift hits every size equally; per size
the min over passes is reported. Every leg's decision census is
asserted against the corpus construction (unique and J=0.45-control
docs are never rejected; totals match) and against the other legs of
the same size.

This is the streaming loop's ``accumulate_batches`` knob measured in
its batch form: an accumulated group of N micro-batches IS one big
delivery — the gate it runs (delta_dedup_gate_indexed over the staged
union) is byte-identical to the one timed here, so the curve reads
directly as "gate every N batches costs latency(N x batch) instead of
N x latency(batch)".

Usage:
  SPARK_GRAFT_DRIVER_MEM=48g python tools/validation/delivery_batching_curve.py --build-only
  python tools/validation/delivery_batching_curve.py [n_docs] [--legs=2] [--mods=160,80,40,20,8]

Foreground runs only (background execution is CPU-throttled in this
sandbox — SCALING.md round-7 methodology note).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from dionysus_rb_spark.operators.minhash import (  # noqa: E402
    build_dedup_index,
    delta_dedup_gate_indexed,
)
from dionysus_rb_spark.session import get_spark  # noqa: E402
from tools.validation.corpus500k import (  # noqa: E402
    GROUP,
    N_DUP_GROUPS,
    N_TIERS,
    _RssHighWater,
    build_corpus,
)

N_MEMBERS = N_DUP_GROUPS * GROUP


def main() -> None:
    nums = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(float(nums[0])) if nums else 10_000_000
    legs = next(
        (int(a.split("=", 1)[1]) for a in sys.argv[1:] if a.startswith("--legs=")),
        2,
    )
    mods = next(
        (
            [int(m) for m in a.split("=", 1)[1].split(",")]
            for a in sys.argv[1:]
            if a.startswith("--mods=")
        ),
        [160, 80, 40, 20, 8],
    )
    for mod in mods:
        # multiples of 4 keep the stride == mod (delta ids are multiples
        # of 4); a group-stride that aliases the tier round-robin empties
        # the member class and blinds the census (SCALING.md r11 note)
        assert mod % 4 == 0, f"mod {mod} must be a multiple of 4"
        if mod % GROUP == 0:
            assert (mod // GROUP) % N_TIERS != 0, f"mod {mod} aliases tiers"

    out = REPO / ".scratch" / f"deltagate{n_docs // 1000}k"
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark()
    build_corpus(spark, out, n_docs)
    docs = spark.read.parquet(str(out / "documents.parquet"))
    idx = str(out / "dedup_index")
    manifest_file = Path(idx) / "_dedup_index_manifest.json"
    reusable = (
        manifest_file.exists()
        and "epoch" in json.loads(manifest_file.read_text())
    )

    if "--build-only" in sys.argv:
        if reusable:
            print(f"index already present at {idx}")
        else:
            index = docs.filter(F.col("doc_id") % 4 != 0)
            t0 = time.time()
            build_dedup_index(index, idx, "text", "doc_id", k=3)
            print(f"index build at {n_docs:,} docs: {time.time() - t0:.1f}s")
        spark.stop()
        return

    if not reusable:
        raise SystemExit(
            f"no reusable index at {idx} — run --build-only at "
            "SPARK_GRAFT_DRIVER_MEM=48g first (the build is the "
            "corpus-sized job; the curve runs at the production heap)"
        )

    cls = (
        F.when(F.col("doc_id") >= N_MEMBERS, F.lit("unique"))
        .when(
            F.pmod((F.col("doc_id") / GROUP).cast("long"), F.lit(N_TIERS)) == 0,
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
        decisions.release()
        return {r["cls"]: (r["n"], r["rejected"]) for r in rows}

    deliveries = {}
    for mod in mods:
        d = docs.filter((F.col("doc_id") % 4 == 0) & (F.col("doc_id") % mod == 0))
        deliveries[mod] = (d, d.count())

    rss = _RssHighWater()
    times: dict[int, list[float]] = {m: [] for m in mods}
    censuses: dict[int, dict] = {}
    for leg in range(legs):
        for mod in mods:
            d, n = deliveries[mod]
            t0 = time.time()
            got = census(
                delta_dedup_gate_indexed(d, idx, "text", "doc_id", threshold=0.5)
            )
            times[mod].append(time.time() - t0)
            print(
                f"pass {leg} mod {mod} ({n:,} docs): "
                f"{times[mod][-1]:.1f}s",
                flush=True,
            )
            assert sum(v[0] for v in got.values()) == n, (mod, got, n)
            assert got.get("unique", (0, 0))[1] == 0, (mod, got)
            assert got.get("control", (0, 0))[1] == 0, (mod, got)
            if mod in censuses:
                assert censuses[mod] == got, (mod, censuses[mod], got)
            censuses[mod] = got

    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    print(
        f"delivery-batching curve at {n_docs:,}-doc corpus "
        f"({n_docs * 3 // 4:,}-doc index), heap {heap}, {legs} passes:"
    )
    base_mod = max(mods)  # smallest delivery anchors the amortization read
    base_n = deliveries[base_mod][1]
    base_t = min(times[base_mod])
    curve = {}
    for mod in mods:
        n = deliveries[mod][1]
        t = min(times[mod])
        per_kdoc = t / (n / 1000)
        # cost of gating the same docs as (n / base_n) SEPARATE
        # base-sized gates, vs one accumulated gate:
        amort = (n / base_n) * base_t / t
        curve[n] = {
            "secs": round(t, 1),
            "all": [round(x, 1) for x in times[mod]],
            "ms_per_kdoc": round(per_kdoc * 1000, 1),
            "amortization_x": round(amort, 2),
            "member_rejects": censuses[mod].get("member", (0, 0))[1],
        }
        print(
            f"  {n:>9,} docs: {t:6.1f}s  ({per_kdoc * 1000:7.1f} ms/kdoc, "
            f"{amort:5.2f}x cheaper than {n // base_n} separate "
            f"{base_n:,}-doc gates)  rejects={censuses[mod].get('member', (0, 0))[1]:,}"
        )
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "heap": heap,
                "legs": legs,
                "curve": curve,
                "rss_high_water_gb": round(rss.stop_gb(), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
