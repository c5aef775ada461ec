"""Key-skew adversarial validation (round 7, VERDICT r6 item 4).

Every prior 500k validation corpus was uniform-ish; the 100 TB risks
that stay unexercised by those are *key-skew* shaped: one domain
holding half the corpus, one near-duplicate cluster with 10^4 member
variants, one user emitting half the event stream. The reference
solved its version of this by offloading oversized observer batches
(`observers_inline_maximum_size`, lib/dionysus/producer/config.rb:95-97);
our plans lean on AQE + explicit structural guards (WindowGroupLimit
caps, max_bucket drops, salted partials, time-bucketed range joins) —
this harness proves those guards where they actually bind.

Corpus (500k docs, distributed generation — no driver loops):
  - docs [0, 20k):   2,000 near-dup groups x 10 variants (corpus500k's
                     realistic shape, the control group)
  - docs [20k, 30k): ONE mega near-dup group — 10,000 distinct variants
                     of a single ~60-word base text (each adds a unique
                     tail token, so exact dedup can NOT collapse them)
  - docs [30k, 500k): salted-unique
  - source:          even doc_ids all land in "srcHEAD" (50% of the
                     corpus in one domain); odd ids spread over 19 tails

Events (2M rows): user 0 owns 50% of all events; signups are rare for
the heavy user (~1 in 2000) so the interval-join output stays
result-sized, the way real funnels are.

Measured (timings + guard behavior -> SCALING.md):
  1. samp_domain_cap    — WindowGroupLimit must take the head domain's
                          top-10 map-side (shuffle moves cap rows, not
                          250k); result verified against DuckDB.
  2. dd_dedup_final     — the mega cluster's band buckets blow past
                          max_bucket and are DROPPED: the run must stay
                          at the uniform corpus's speed, the 2,000
                          control groups must still collapse exactly,
                          and the recall loss must be CONFINED to the
                          mega cluster (quantified).
  3. cap-vs-quadratic   — minhash_lsh_dedup on a 3,000-variant slice
                          with max_bucket=None (the quadratic bucket
                          expansion the cap exists to prevent) vs
                          max_bucket=1000, same slice.
  4. g5 salted agg      — salted_collect_list/salted_count_distinct on
                          the skewed stream vs the naive single-phase
                          groupBy, digests asserted equal.
  5. ev_interval_join   — time-bucketed range join under key skew;
                          n_events verified for the heavy user's
                          windows against a direct filter count.

Usage: python tools/validation/skew_stress.py
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
from tools.validation.corpus500k import VOCAB

N_DOCS = 500_000
N_GROUPS, GROUP = 2_000, 10  # control near-dup groups (docs [0, 20k))
MEGA_LO, MEGA_N = 20_000, 10_000  # the mega cluster (docs [20k, 30k))
N_EVENTS = 2_000_000
HEAVY_USER = 0


def build_skew_docs(spark, out: Path) -> None:
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    nv = len(VOCAB)
    ids = spark.range(N_DOCS).withColumnRenamed("id", "doc_id")
    in_group = F.col("doc_id") < N_GROUPS * GROUP
    in_mega = (F.col("doc_id") >= MEGA_LO) & (F.col("doc_id") < MEGA_LO + MEGA_N)
    seed = (
        F.when(in_group, (F.col("doc_id") / GROUP).cast("long"))
        .when(in_mega, F.lit(-1).cast("long"))
        .otherwise(F.col("doc_id"))
    )
    # mega base is LONG (~60 words) so one extra tail token keeps
    # shingle-Jaccard far above the 0.5 verify threshold — every mega
    # pair is a TRUE near-dup the cap is knowingly sacrificing
    n_words = F.when(in_mega, F.lit(60)).otherwise(
        (F.pmod(F.xxhash64(seed, F.lit(1)), F.lit(93)) + 8).cast("int")
    )
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab_arr, (F.pmod(F.xxhash64(seed, i), F.lit(nv)) + 1).cast("int")
        ),
    )
    base_text = F.array_join(words, " ")
    text = (
        F.when(
            in_mega,
            # unique tail token per variant: distinct texts, so ONLY the
            # near-dup path (not exact dedup) can ever collapse these
            F.concat(base_text, F.lit(" mv"), F.col("doc_id").cast("string")),
        )
        .when(
            in_group,
            F.concat(
                base_text,
                F.lit(" "),
                F.element_at(
                    vocab_arr, (F.pmod(F.col("doc_id"), F.lit(GROUP)) + 1).cast("int")
                ),
            ),
        )
        .otherwise(F.concat(base_text, F.lit(" u"), F.col("doc_id").cast("string")))
    )
    corpus = ids.select(
        "doc_id",
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in ["fr", "es", "en", "de", "zh"]]),
            (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(2)), F.lit(5)) + 1).cast("int"),
        ).alias("lang"),
        # HEAD-HEAVY domain: every even doc_id -> one source (50%)
        F.when(F.col("doc_id") % 2 == 0, F.lit("srcHEAD"))
        .otherwise(
            F.concat(
                F.lit("src"),
                F.pmod(F.xxhash64(F.col("doc_id"), F.lit(3)), F.lit(19)).cast("string"),
            )
        )
        .alias("source"),
    ).withColumn("n_chars", F.length("text"))
    corpus.write.mode("overwrite").parquet(str(out / "documents.parquet"))


def build_skew_events(spark, out: Path, n_events: int = N_EVENTS) -> None:
    ids = spark.range(n_events).withColumnRenamed("id", "event_id")
    heavy = F.col("event_id") % 2 == 0  # 50% of the stream is user 0
    user = F.when(heavy, F.lit(HEAVY_USER)).otherwise(
        F.pmod(F.xxhash64("event_id", F.lit(11)), F.lit(100_000)) + 1
    )
    # 30 days of traffic; ts derived from a hash so heavy/light
    # interleave rather than cluster by id range
    secs = F.pmod(F.xxhash64("event_id", F.lit(12)), F.lit(30 * 24 * 3600))
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + secs)
    types = F.array(*[F.lit(t) for t in ["view", "click", "purchase", "error"]])
    etype = F.when(
        heavy,
        # heavy user signs up ~1/2000 events -> ~500 windows; the rest
        # of their million rows are window CONTENTS, not window starts
        F.when(
            F.pmod(F.xxhash64("event_id", F.lit(13)), F.lit(2000)) == 0,
            F.lit("signup"),
        ).otherwise(
            F.element_at(
                types, (F.pmod(F.xxhash64("event_id", F.lit(14)), F.lit(4)) + 1).cast("int")
            )
        ),
    ).otherwise(
        F.element_at(
            F.concat(types, F.array(F.lit("signup"))),
            (F.pmod(F.xxhash64("event_id", F.lit(15)), F.lit(5)) + 1).cast("int"),
        )
    )
    ev = ids.select(
        "event_id",
        ts.alias("ts"),
        user.cast("long").alias("user_id"),
        etype.alias("event_type"),
        (F.pmod(F.xxhash64("event_id", F.lit(16)), F.lit(10_000)) / 100.0).alias(
            "value"
        ),
        F.lit("{}").alias("props"),
    )
    ev.write.mode("overwrite").parquet(str(out / "events.parquet"))


def main() -> None:
    out = REPO / ".scratch" / "skewcorpus"
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark()
    qs = all_queries()

    t0 = time.time()
    build_skew_docs(spark, out)
    build_skew_events(spark, out)
    print(f"generated {N_DOCS} docs + {N_EVENTS} events in {time.time()-t0:.1f}s")

    # --- 1. samp_domain_cap on the head-heavy domain -----------------
    t0 = time.time()
    capped = qs["samp_domain_cap"].fn(spark, str(out)).collect()
    t_cap = time.time() - t0
    per_src: dict[str, int] = {}
    for r in capped:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    assert max(per_src.values()) <= 10 and per_src["srcHEAD"] == 10
    import duckdb

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part-file glob
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{out}/documents.parquet/*.parquet'"
    )
    want = {
        (r[0], r[1], r[2])
        for r in con.execute(qs["samp_domain_cap"].oracle).fetchall()
    }
    got = {(r["doc_id"], r["source"], r["quality"]) for r in capped}
    assert got == want, (len(got), len(want))
    print(
        f"samp_domain_cap: {t_cap:.1f}s — head domain (250k docs) capped to "
        f"{per_src['srcHEAD']}, {len(per_src)} domains, oracle-exact"
    )

    # --- 2. dd_dedup_final with the mega cluster ----------------------
    t0 = time.time()
    kept = qs["dd_dedup_final"].fn(spark, str(out)).cache()
    n_kept = kept.count()
    t_dedup = time.time() - t0
    mega_kept = kept.filter(
        (F.col("doc_id") >= MEGA_LO) & (F.col("doc_id") < MEGA_LO + MEGA_N)
    ).count()
    ctrl_kept = kept.filter(F.col("doc_id") < N_GROUPS * GROUP).count()
    uniq_kept = kept.filter(F.col("doc_id") >= MEGA_LO + MEGA_N).count()
    kept.unpersist()
    print(
        f"dd_dedup_final: {t_dedup:.1f}s ({N_DOCS/t_dedup:,.0f} docs/s), "
        f"kept {n_kept} — control groups {ctrl_kept}/{N_GROUPS} "
        f"(expect {N_GROUPS}), mega survivors {mega_kept}/{MEGA_N}, "
        f"uniques {uniq_kept}/{N_DOCS - MEGA_LO - MEGA_N}"
    )
    # guards: control groups collapse to the SAME residue the uniform
    # corpus500k run records (482,034 kept there = 2,000 reps + 34
    # short-base variants whose pairwise Jaccard dips under the 0.5
    # verify threshold — identical group seeds, so identical residue);
    # any DIVERGENCE from that residue would mean the mega cluster or
    # the head domain perturbed unrelated groups. No unique doc lost.
    assert N_GROUPS <= ctrl_kept <= N_GROUPS + 50, ctrl_kept
    assert uniq_kept == N_DOCS - MEGA_LO - MEGA_N

    # --- 3. the cap vs the quadratic it prevents ----------------------
    from dionysus_rb_spark.operators.minhash import minhash_lsh_dedup

    docs = spark.read.parquet(str(out / "documents.parquet"))
    slice3k = docs.filter(
        (F.col("doc_id") >= MEGA_LO) & (F.col("doc_id") < MEGA_LO + 3000)
    )
    t0 = time.time()
    n_capped = minhash_lsh_dedup(slice3k, "text", "doc_id", k=3, threshold=0.5).count()
    t_with_cap = time.time() - t0
    t0 = time.time()
    n_uncapped = minhash_lsh_dedup(
        slice3k, "text", "doc_id", k=3, threshold=0.5, max_bucket=None
    ).count()
    t_no_cap = time.time() - t0
    true_pairs = 3000 * 2999 // 2
    recall = n_uncapped / true_pairs
    print(
        f"cap-vs-quadratic (3k-variant slice): max_bucket=1000 -> "
        f"{n_capped} pairs in {t_with_cap:.1f}s; max_bucket=None -> "
        f"{n_uncapped}/{true_pairs} pairs (recall {recall:.4f}) in "
        f"{t_no_cap:.1f}s ({t_no_cap/max(t_with_cap, 1e-9):.0f}x)"
    )
    # every mega pair is a TRUE near-dup (J ~= 58/60), but MinHash-LSH
    # candidate generation is probabilistic (unlike SimHash banding's
    # pigeonhole guarantee): with NUM_PERM=16/BANDS=4, a J=0.967 pair
    # misses all 4 bands with p = (1 - J^4)^4 ~= 2.6e-4 — the measured
    # miss count (~1.4k of 4.5M) matches that model. Assert the
    # probabilistic contract, not impossible exactness.
    assert recall >= 0.999, recall

    # --- 4. salted aggregation on the skewed stream -------------------
    from dionysus_rb_spark.operators.skew import (
        salted_collect_list,
        salted_count_distinct,
    )

    ev = qs["g5_salted_skew_agg"].fn  # the catalog plan, on skewed events
    t0 = time.time()
    salted_rows = {r["event_type"]: r for r in ev(spark, str(out)).collect()}
    t_salted = time.time() - t0
    events = spark.read.parquet(str(out / "events.parquet"))
    t0 = time.time()
    naive_rows = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_distinct_users"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("event_id")),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("ids_digest"),
        )
        .collect()
    }
    t_naive = time.time() - t0
    assert set(salted_rows) == set(naive_rows)
    for k in salted_rows:
        assert salted_rows[k]["ids_digest"] == naive_rows[k]["ids_digest"], k
        assert (
            salted_rows[k]["n_distinct_users"] == naive_rows[k]["n_distinct_users"]
        ), k
    print(
        f"g5 salted agg (2M rows, 5 keys): salted {t_salted:.1f}s vs "
        f"naive single-phase {t_naive:.1f}s — digests identical"
    )

    # crossover probe at 10x: salting's price is two shuffles; its
    # payoff is bounded per-task fan-in. Measure both on 20M rows
    # (heavy key = 10M) to see where the single collect task starts
    # to dominate the naive plan.
    big = REPO / ".scratch" / "skewcorpus_big"
    big.mkdir(parents=True, exist_ok=True)
    build_skew_events(spark, big, n_events=10 * N_EVENTS)
    events_big = spark.read.parquet(str(big / "events.parquet"))
    t0 = time.time()
    s_big = salted_collect_list(
        events_big, ["event_type"], F.col("event_id"), num_salts=16
    ).select(
        "event_type",
        F.md5(
            F.array_join(F.transform("collected", lambda x: x.cast("string")), ",")
        ).alias("ids_digest"),
    ).collect()
    t_salted_big = time.time() - t0
    t0 = time.time()
    n_big = (
        events_big.groupBy("event_type")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("event_id")),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("ids_digest")
        )
        .collect()
    )
    t_naive_big = time.time() - t0
    assert {(r["event_type"], r["ids_digest"]) for r in s_big} == {
        (r["event_type"], r["ids_digest"]) for r in n_big
    }
    print(
        f"g5 crossover probe (20M rows, 5 keys): salted {t_salted_big:.1f}s "
        f"vs naive {t_naive_big:.1f}s — digests identical"
    )
    _ = salted_count_distinct  # exercised via the catalog plan above

    # --- 5. interval join under key skew -------------------------------
    t0 = time.time()
    ij = qs["ev_interval_join"].fn(spark, str(out)).cache()
    n_windows = ij.count()
    t_ij = time.time() - t0
    from dionysus_rb_spark.tables import load_table

    evt = load_table(spark, str(out), "events")
    heavy_windows = (
        evt.filter(
            (F.col("user_id") == HEAVY_USER) & (F.col("event_type") == "signup")
        )
        .select(F.col("event_id").alias("win_id"), F.col("ts").alias("w0"))
        .collect()
    )
    got_counts = {
        r["win_id"]: r["n_events"]
        for r in ij.join(
            spark.createDataFrame([(w["win_id"],) for w in heavy_windows], "win_id LONG"),
            "win_id",
        ).collect()
    }
    ij.unpersist()
    # spot-verify 5 heavy-user windows by direct filter
    for w in heavy_windows[:5]:
        direct = evt.filter(
            (F.col("user_id") == HEAVY_USER)
            & (F.col("ts") >= F.lit(w["w0"]))
            & (F.col("ts") < F.lit(w["w0"]) + F.expr("INTERVAL 2 HOURS"))
        ).count()
        assert got_counts[w["win_id"]] == direct, (w["win_id"], got_counts[w["win_id"]], direct)
    heavy_mean = sum(got_counts.values()) / max(len(got_counts), 1)
    print(
        f"ev_interval_join: {t_ij:.1f}s — {n_windows} windows, heavy user "
        f"{len(heavy_windows)} windows averaging {heavy_mean:,.0f} contained "
        f"events each, 5 spot-verified exactly"
    )


if __name__ == "__main__":
    main()
