"""Exact recall census of the dedup spine at 10M docs (SCALING.md r8).

HISTORICAL ARTIFACT (r8): this census ran against the r8-era corpus
generator (32-word vocabulary, single-variant-word groups) and its
numbers — kept 9,982,031 = floor + 34 banding misses − 3 birthday
merges — document that corpus. The r9 generator (corpus500k.py) uses a
10,240-token vocabulary with exact tiered Jaccard, making both the +34
and the −3 structurally impossible; the live model-vs-census harness
is tools/validation/recall_model.py. To reproduce THIS file's numbers,
regenerate the corpus with the r8 corpus500k.py (git history).

The 10M corpus500k run kept 9,982,031 docs — 31 above the naive floor
(1e7 − 2,000×9 = 9,982,000). This harness decomposes that gap EXACTLY,
with an independent driver-side connected-components over the
pipeline's own verified pair set, and settles which mechanism each doc
belongs to:

1. *Band-bucket caps: exonerated.* The global bucket profile at 10M
   has ZERO buckets over max_bucket=1000 (widest: 372) — the cap never
   fired, so it cannot explain any miss. (First run of this harness
   falsified the cap-saturation hypothesis the r8 SCALING draft
   carried; this file is the correction's evidence.)
2. *34 n-independent LSH banding misses.* 34 dup-group members (in 30
   groups) share NO band bucket with any group-mate — their groups sit
   at the Jaccard≈0.5 verify boundary where the banding hit rate
   1−(1−J^r)^b is ~0.23 per pair, and 16-perm/4-band signatures simply
   never collide for them. Group text is a function of (group id,
   member index) only — identical bytes at every corpus size — so the
   SAME 34 miss at 500k, 1M and 10M: the 1M run's kept 982,034 is this
   +34, not the "exact ceiling" r7's prose claimed.
3. *Accidental near-dups claw back −3 at 10M.* The generator draws
   doc words from a 32-word vocabulary, so at 10M docs genuinely
   distinct docs start colliding above Jaccard 0.5 (birthday effect —
   a property of the synthetic corpus, not the engine); each such
   verified edge merges two otherwise-kept docs. Net: 9,982,000 + 34
   − 3 = 9,982,031, reproduced here bit-exactly by union-find over the
   collected pair set.

Expects .scratch/corpus10000k/documents.parquet (corpus500k.py 1e7).
Foreground runs only (background execution is CPU-throttled in this
sandbox). Run with SPARK_GRAFT_DRIVER_MEM=48g like the 1e7
corpus500k run itself — the persisted shingle stage OOMs the 24g
shared heap in the verify join. Runtime ~15 min: the pair pipeline
plus a global bucket-width profile over ~160M band rows.

Usage: python tools/validation/recall10m.py [expected_kept]
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from dionysus_rb_spark.operators import minhash
from dionysus_rb_spark.session import get_spark
from tools.validation.corpus500k import GROUP, N_DUP_GROUPS

MAX_BUCKET = 1000
THRESHOLD = 0.5
N_MEMBERS = N_DUP_GROUPS * GROUP  # doc_id < 20_000 are group members


def main() -> None:
    expected_kept = int(sys.argv[1]) if len(sys.argv) > 1 else 9_982_031
    corpus = REPO / ".scratch" / "corpus10000k" / "documents.parquet"
    if not corpus.exists():
        raise SystemExit(f"missing {corpus}: run corpus500k.py 10000000 first")
    spark = get_spark()
    docs = spark.read.parquet(str(corpus))
    n = docs.count()

    # -- 1. cap exoneration: global bucket-width profile
    t0 = time.time()
    sh = minhash.doc_shingles(docs, "text", "doc_id", k=3)
    signed = minhash.minhash_signature(sh)
    bands_n, rows = minhash.BANDS, minhash.ROWS_PER_BAND
    bands_sql = "array(%s)" % ", ".join(
        "concat_ws(',', '%d', %s)"
        % (
            b,
            ", ".join(
                f"cast(signature[{i}] as string)"
                for i in range(b * rows, (b + 1) * rows)
            ),
        )
        for b in range(bands_n)
    )
    band_rows = signed.select(
        "doc_id", F.explode(F.expr(bands_sql)).alias("band_key")
    )
    sizes = band_rows.groupBy("band_key").agg(F.count("*").alias("width"))
    prof = sizes.agg(
        F.count("*").alias("buckets"),
        F.sum((F.col("width") > MAX_BUCKET).cast("long")).alias("capped"),
        F.max("width").alias("max_width"),
    ).collect()[0]
    print(
        f"bucket profile at {n:,} docs: {prof['buckets']:,} buckets, "
        f"{prof['capped']:,} over the cap ({MAX_BUCKET}), widest "
        f"{prof['max_width']:,} ({time.time() - t0:.0f}s)"
    )
    assert prof["capped"] == 0  # the cap NEVER fires on this corpus

    # -- 2+3. the pipeline's own verified pair set, reconciled exactly
    t0 = time.time()
    pairs = minhash.minhash_lsh_dedup(
        docs, "text", "doc_id", k=3, threshold=THRESHOLD
    ).select("doc_a", "doc_b")
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    in_group = [
        (a, b)
        for a, b in edges
        if a < N_MEMBERS and b < N_MEMBERS and a // GROUP == b // GROUP
    ]
    in_group_set = set(in_group)
    accidental = [e for e in edges if e not in in_group_set]
    print(
        f"verified pairs: {len(edges):,} total, {len(in_group):,} "
        f"in-group, {len(accidental):,} accidental "
        f"({time.time() - t0:.0f}s):"
    )
    for a, b in sorted(accidental):
        print(f"  accidental near-dup: {a} ~ {b}")

    # independent union-find (not the engine's large-star/small-star)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    merged = 0
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            merged += 1  # each union removes exactly one survivor
    kept = n - merged
    floor = n - N_DUP_GROUPS * (GROUP - 1)

    # banding-miss census: members with no in-group edge at all, plus
    # extra components inside split groups
    comp_by_group: dict[int, set[int]] = defaultdict(set)
    for m in range(N_MEMBERS):
        comp_by_group[m // GROUP].add(find(m))
    extra_member_survivors = sum(
        len(c) - 1 for c in comp_by_group.values()
    )
    print(
        f"kept (independent union-find) = {kept:,} "
        f"= floor {floor:,} + {extra_member_survivors} banding-missed "
        f"member survivors − {floor + extra_member_survivors - kept} "
        f"accidental merges"
    )
    assert kept == expected_kept, (kept, expected_kept)
    split = {g: c for g, c in comp_by_group.items() if len(c) > 1}
    print(f"banding misses live in {len(split)} groups: {sorted(split)}")
    spark.stop()


if __name__ == "__main__":
    main()
