"""Half-million-doc end-to-end dedup + curation runs (SCALING.md).

A 500k-doc corpus with a REALISTIC shape (unlike the adversarial
95%-dup corpus validated separately): ~4% true near-dups in 10-variant
groups, the remainder salted-unique so candidate-pair volume behaves
like a web corpus. Generation is fully distributed — text is built
from Spark expressions (hash-indexed vocabulary words), no driver
loops — and lands in .scratch/corpus500k/ (gitignored data; this
script is the tracked, re-runnable record).

Runs and times:
- dd_dedup_final    — full MinHash-LSH -> Jaccard verify ->
                      large-star/small-star CC -> keep-one join
- pipe_full_curation — staged scoring gates -> language rebalance ->
                      exact dedup -> hierarchical sequence packing

Usage: python tools/validation/corpus500k.py [n_docs] [--curation]

n_docs defaults to 500k (which also runs curation); larger sizes run
the dedup spine only unless --curation is passed, and report the
process-subtree RSS high-water alongside wall time and docs/s. Run
FOREGROUND: background-launched runs are CPU-throttled in this sandbox
and read ~2.5x slow (measured r7).
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

N_DOCS = 500_000
N_DUP_GROUPS = 2_000
GROUP = 10  # docs per near-dup group -> 20k docs (4%) are near-dups


def build_corpus(spark, out: Path, n_docs: int = N_DOCS) -> None:
    """Write the realistic 500k-shape corpus (distributed generation,
    no driver loops) to ``out/documents.parquet``. Shared with
    simhash_width.py so the width study runs on the identical corpus."""
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    nv = len(VOCAB)
    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    in_group = F.col("doc_id") < N_DUP_GROUPS * GROUP
    # near-dup docs draw their words from the GROUP seed (identical
    # base text within a group); unique docs draw from their own id
    # and carry a salt token so no two are accidentally identical.
    seed = F.when(in_group, (F.col("doc_id") / GROUP).cast("long")).otherwise(
        F.col("doc_id")
    )
    n_words = (F.pmod(F.xxhash64(seed, F.lit(1)), F.lit(93)) + 8).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab_arr, (F.pmod(F.xxhash64(seed, i), F.lit(nv)) + 1).cast("int")
        ),
    )
    base_text = F.array_join(words, " ")
    text = F.when(
        in_group,
        # variant tail: one word chosen by the member index — a
        # near-identical high-Jaccard neighbor of the group base
        F.concat(
            base_text,
            F.lit(" "),
            F.element_at(
                vocab_arr, (F.pmod(F.col("doc_id"), F.lit(GROUP)) + 1).cast("int")
            ),
        ),
    ).otherwise(F.concat(base_text, F.lit(" u"), F.col("doc_id").cast("string")))
    corpus = ids.select(
        "doc_id",
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in ["fr", "es", "en", "de", "zh"]]),
            (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(2)), F.lit(5)) + 1).cast(
                "int"
            ),
        ).alias("lang"),
        F.concat(
            F.lit("src"),
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit(3)), F.lit(20)).cast(
                "string"
            ),
        ).alias("source"),
    ).withColumn("n_chars", F.length("text"))

    t0 = time.time()
    corpus.write.mode("overwrite").parquet(str(out / "documents.parquet"))
    n = spark.read.parquet(str(out / "documents.parquet")).count()
    print(f"generated {n} docs in {time.time() - t0:.1f}s -> {out}")
    assert n == n_docs


class _RssHighWater:
    """Max resident-set high-water of this process's whole subtree
    (python driver + the launched JVM + pyspark workers), sampled every
    2 s in a daemon thread — the memory number a cluster capacity plan
    needs from a local run."""

    def __init__(self) -> None:
        import threading

        self.max_bytes = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _descendants(self) -> list[int]:
        import os

        pids, out = {os.getpid()}, [os.getpid()]
        try:
            for entry in os.listdir("/proc"):
                if not entry.isdigit():
                    continue
                try:
                    with open(f"/proc/{entry}/status") as f:
                        status = f.read()
                    ppid = int(status.split("PPid:\t", 1)[1].split("\n", 1)[0])
                except (OSError, IndexError, ValueError):
                    continue
                if ppid in pids:
                    pids.add(int(entry))
                    out.append(int(entry))
        except OSError:
            pass
        return out

    def _run(self) -> None:
        while not self._stop.wait(2.0):
            total = 0
            for pid in self._descendants():
                try:
                    with open(f"/proc/{pid}/statm") as f:
                        total += int(f.read().split()[1]) * 4096
                except (OSError, IndexError, ValueError):
                    continue
            self.max_bytes = max(self.max_bytes, total)

    def stop_gb(self) -> float:
        self._stop.set()
        self._t.join(timeout=5)
        return self.max_bytes / 2**30


def main() -> None:
    n_docs = int(float(sys.argv[1])) if len(sys.argv) > 1 else N_DOCS
    run_curation = "--curation" in sys.argv or n_docs == N_DOCS
    out = REPO / ".scratch" / f"corpus{n_docs // 1000}k"
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark()  # local[$SPARK_GRAFT_CPUS], default 32
    build_corpus(spark, out, n_docs)
    n = n_docs

    qs = all_queries()
    rss = _RssHighWater()
    t0 = time.time()
    kept = qs["dd_dedup_final"].fn(spark, str(out)).count()
    t_dedup = time.time() - t0
    print(
        f"dd_dedup_final: {t_dedup:.1f}s ({n / t_dedup:,.0f} docs/s), "
        f"kept {kept}, subtree RSS high-water {rss.stop_gb():.1f} GiB"
    )
    # each 10-variant group collapses to 1: ceiling on the kept count.
    # NOT an exactness claim — 34 members (30 groups) sit at the
    # J≈0.5 banding boundary and never band with their group at ANY
    # corpus size, and at 10M the 32-word vocab starts producing
    # accidental true near-dups between "unique" docs (measured: kept
    # = floor + 34 − 3 at 1e7; recall10m.py is the exact census)
    assert kept <= n - N_DUP_GROUPS * (GROUP - 1) + 1000

    if run_curation:
        t0 = time.time()
        packed = qs["pipe_full_curation"].fn(spark, str(out)).count()
        t_cur = time.time() - t0
        print(
            f"pipe_full_curation: {t_cur:.1f}s ({n / t_cur:,.0f} docs/s), "
            f"{packed} rows"
        )


if __name__ == "__main__":
    main()
