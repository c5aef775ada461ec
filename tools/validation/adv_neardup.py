"""Adversarial 95%-near-dup corpus validation (SCALING.md).

Regenerates the corpus used since round 3: the 5,000 lowest-doc_id
sf0.1 documents, each expanded into 20 near-identical variants
(variant v appends one vocabulary word chosen by v — high-Jaccard
neighbors of the base), for 100k docs that are ~95% near-duplicates.
This is the shape where duplicate-cluster membership is CORPUS-sized:
the case a forced broadcast of the cluster table would have OOMed and
AQE must route through a shuffled hash join.

Runs the two certified queries end-to-end on that corpus and prints
timings + survivor counts:

- dd_dedup_final  — expect ~5k survivors (20:1 collapse)
- samp_cluster_split — expect all 100k docs labeled

Generation is fully distributed (Spark expressions, no driver loops);
the corpus lands in .scratch/adv_neardup/ (gitignored data; this
script is the tracked, re-runnable record).

Usage: python tools/validation/adv_neardup.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from dionysus_rb_spark.plans import all_queries
from dionysus_rb_spark.session import get_spark

VOCAB = (
    "scan column window order sort part agg value line key join merge "
    "query group a vector hash slow stream filter fast the spark batch "
    "table small data big customer row push"
).split()

N_BASES = 5_000
N_VARIANTS = 20


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = REPO / ".scratch" / "adv_neardup"
    out.mkdir(parents=True, exist_ok=True)

    spark = get_spark(cpus=16)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bases = docs.orderBy("doc_id").limit(N_BASES)
    variants = F.explode(
        F.sequence(F.lit(0), F.lit(N_VARIANTS - 1))
    ).alias("v")
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    corpus = (
        bases.select("doc_id", "text", "lang", "source", variants)
        .select(
            (F.col("doc_id") * N_VARIANTS + F.col("v")).alias("doc_id"),
            # variant v appends one v-chosen word: ~1-shingle difference,
            # comfortably above the Jaccard verification threshold
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.element_at(vocab_arr, F.col("v") % len(VOCAB) + 1),
            ).alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    t0 = time.time()
    corpus.coalesce(8).write.mode("overwrite").parquet(
        str(out / "documents.parquet")
    )
    n = spark.read.parquet(str(out / "documents.parquet")).count()
    print(f"generated {n} docs in {time.time() - t0:.1f}s -> {out}")
    assert n == N_BASES * N_VARIANTS

    qs = all_queries()
    t0 = time.time()
    kept = qs["dd_dedup_final"].fn(spark, str(out)).count()
    t_dedup = time.time() - t0
    print(f"dd_dedup_final: {t_dedup:.1f}s, {kept} survivors "
          f"(collapse {n / kept:.1f}:1)")

    t0 = time.time()
    labeled = qs["samp_cluster_split"].fn(spark, str(out)).count()
    t_split = time.time() - t0
    print(f"samp_cluster_split: {t_split:.1f}s, {labeled} docs labeled")
    assert labeled == n


if __name__ == "__main__":
    main()
