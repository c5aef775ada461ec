"""Equivalence pins for the optimization-round expression rewrites.

Round 13 rewrote several per-row text expressions (shingles, bigrams,
repetition top-token count, simhash voting, per-row term frequencies)
from index-per-element / nested-aggregate shapes into zip_with /
single-pass folds. The rewrites must be VALUE-identical — the oracle
parity suite checks them end-to-end against DuckDB, and these tests pin
each operator's new internals against a brute-force Python reference on
adversarial inputs (empty, single-token, all-repeats, ties, unicode)
so a future edit cannot drift the semantics without a red test.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

ADVERSARIAL_TEXTS = [
    "",                                     # zero tokens
    "    ",                                 # whitespace only
    "one",                                  # single token (< k)
    "a b",                                  # exactly 2 tokens
    "a b c",                                # exactly k=3 tokens
    "x x x x x x",                          # all-repeats
    "the the a a a zz zz",                  # tie-shaped counts
    "Hello, WORLD!  hello world 123 one2three",
    "CJK 文字 only あ",         # tokens that vanish under ascii tokenizer
    "a-b c.d e_f",                          # punctuation splits
    "k K İstanbul",                    # lowercases INTO ascii
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w1 w2 w1",
]


def _py_tokenize(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _frame(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL_TEXTS)], ["doc_id", "text"]
    )


def test_shingles_matches_reference(spark):
    from dionysus_rb_spark.functions.hashing import shingles, tokenize

    for k in (1, 2, 3, 5):
        rows = (
            _frame(spark)
            .select("doc_id", shingles(tokenize(F.col("text")), k).alias("s"))
            .collect()
        )
        for r in rows:
            toks = _py_tokenize(ADVERSARIAL_TEXTS[r["doc_id"]])
            if len(toks) >= k:
                expect = [
                    " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
                ]
            elif toks:
                expect = [" ".join(toks)]
            else:
                expect = []
            # array_distinct keeps first-occurrence order
            seen: list[str] = []
            for g in expect:
                if g not in seen:
                    seen.append(g)
            assert list(r["s"]) == seen, (k, r["doc_id"], r["s"], seen)


def test_bigrams_matches_reference(spark):
    from dionysus_rb_spark.functions.hashing import tokenize
    from dionysus_rb_spark.operators.textops import bigrams

    rows = (
        _frame(spark)
        .select("doc_id", bigrams(tokenize(F.col("text"))).alias("b"))
        .collect()
    )
    for r in rows:
        toks = _py_tokenize(ADVERSARIAL_TEXTS[r["doc_id"]])
        expect = (
            [f"{a} {b}" for a, b in zip(toks, toks[1:])] if len(toks) >= 2 else []
        )
        assert list(r["b"]) == expect, (r["doc_id"], r["b"], expect)


def test_repetition_top_count_matches_reference(spark):
    from dionysus_rb_spark.operators.textops import repetition_stats

    stats = repetition_stats(F.col("text"))
    rows = (
        _frame(spark)
        .select(
            "doc_id",
            stats["dup_token_frac"].alias("dup"),
            stats["top_token_frac"].alias("top"),
        )
        .collect()
    )
    for r in rows:
        toks = _py_tokenize(ADVERSARIAL_TEXTS[r["doc_id"]])
        n = max(len(toks), 1)
        top = max((toks.count(t) for t in set(toks)), default=0)
        assert r["top"] == pytest.approx(round(top / n, 6), abs=0), r
        assert r["dup"] == pytest.approx(
            round(1 - len(set(toks)) / n, 6), abs=0
        ), r


def test_token_tf_matches_groupby_counts(spark):
    from dionysus_rb_spark.functions.hashing import tokenize
    from dionysus_rb_spark.operators.textops import token_tf

    df = _frame(spark)
    per_row = (
        df.select(
            "doc_id", F.explode(token_tf(tokenize(F.col("text")))).alias("e")
        )
        .select("doc_id", "e.token", "e.tf")
    )
    reference = (
        df.select("doc_id", F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    assert per_row.exceptAll(reference).count() == 0
    assert reference.exceptAll(per_row).count() == 0


def test_simhash_matches_bit_vote_reference(spark):
    from dionysus_rb_spark.operators.simhash import WIDE_BITS, simhash

    for bits in (32, WIDE_BITS):
        rows = simhash(_frame(spark), "text", "doc_id", bits=bits).collect()
        got = {r["doc_id"]: r["simhash"] for r in rows}
        ndigits = (bits + 3) // 4
        for i, text in enumerate(ADVERSARIAL_TEXTS):
            toks = _py_tokenize(text)
            if not toks:
                assert i not in got  # zero-token docs emit no fingerprint
                continue
            distinct: list[str] = []
            for t in toks:
                if t not in distinct:
                    distinct.append(t)
            hashes = [
                int(hashlib.md5(t.encode()).hexdigest()[:ndigits], 16)
                for t in distinct
            ]
            fp = 0
            for b in range(bits):
                votes = sum(1 if h & (1 << b) else -1 for h in hashes)
                if votes > 0:
                    fp |= 1 << b
            assert got[i] == fp, (bits, i, got[i], fp)


def test_minhash_signature_matches_reference(spark):
    """Value pin for minhash_signature against a brute-force Python
    minhash (md5-prefix h32, (h*a+b) % P per permutation) on the
    adversarial texts, plus the empty/NULL hash-array edge (signs to
    NULLs). Added in optimization r13 round 2 while A/B-ing alternative
    signature folds (both rejected — see the minhash_signature comment);
    any future rewrite must keep this pin green."""
    from dionysus_rb_spark.functions.hashing import MERSENNE_PRIME
    from dionysus_rb_spark.operators.minhash import (
        doc_shingles,
        minhash_signature,
        perm_params,
    )

    rows = minhash_signature(
        doc_shingles(_frame(spark), "text", "doc_id", k=3)
    ).collect()
    got = {r["doc_id"]: r["signature"] for r in rows}
    params = perm_params()
    for i, text in enumerate(ADVERSARIAL_TEXTS):
        toks = _py_tokenize(text)
        if not toks:
            assert i not in got  # zero-token docs never reach signing
            continue
        if len(toks) >= 3:
            sh = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        else:
            sh = {" ".join(toks)}
        hashes = [
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh
        ]
        expect = [
            min((h * a + b) % MERSENNE_PRIME for h in hashes)
            for a, b in params
        ]
        assert got[i] == expect, (i, got[i], expect)

    # direct-caller edge: empty and NULL hash arrays sign to NULLs,
    # exactly as array_min(transform(...)) did before the rewrite
    edge = spark.createDataFrame(
        [(1, []), (2, None)],
        "doc_id long, shingle_hashes array<long>",
    )
    for r in minhash_signature(edge).collect():
        assert r["signature"] == [None] * len(params), r


def test_lm_quality_tf_fold_matches_occurrence_fold(spark):
    # Round 14 (VERDICT r13 item 1): a t_lm_quality variant joining the
    # LM model against per-doc DISTINCT bigrams with tf weights needs a
    # tf-expanded final fold — expand each (logp, tf) back to tf copies,
    # sort, fold. The variant was measured 1.3x WORSE at sf0.1 (token_tf's
    # per-row sort of the bigram strings outweighs the join rows it
    # saves at this duplicate rate) and is NOT shipped, but the fold's
    # bit-identity (exact float equality vs the per-occurrence
    # collect+sort+fold the oracle computes) is the hard part of the
    # idea, so it stays pinned here for whenever a higher-duplicate
    # corpus makes the variant worth re-measuring.
    from dionysus_rb_spark.functions.hashing import tokenize
    from dionysus_rb_spark.operators.textops import bigrams, token_tf

    texts = ADVERSARIAL_TEXTS + [
        "a b a b a b a b a b",               # one bigram pair repeated
        "x y x y z x y z z x y",             # mixed repeats
        " ".join(["q r"] * 50),              # 99 occurrences, 1 distinct
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    toks = df.select("doc_id", tokenize(F.col("text")).alias("t"))
    # synthetic per-bigram logp: deterministic, collision-prone enough
    # to produce equal doubles across distinct bigrams (tie coverage)
    logp = (-(F.abs(F.xxhash64(F.col("bg"))) % 7) / 3.0) - 0.1

    occ = (
        toks.select("doc_id", F.explode(bigrams(F.col("t"))).alias("bg"))
        .withColumn("logp", logp)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.aggregate(
                F.array_sort(F.collect_list("logp")),
                F.lit(0.0),
                lambda a, b: a + b,
            ).alias("fold"),
        )
    )
    tf = (
        toks.select(
            "doc_id", F.explode(token_tf(bigrams(F.col("t")))).alias("tt")
        )
        .select("doc_id", F.col("tt.token").alias("bg"), F.col("tt.tf").alias("tf"))
        .withColumn("logp", logp)
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n"),
            F.aggregate(
                F.array_sort(
                    F.flatten(
                        F.transform(
                            F.collect_list(
                                F.struct(
                                    F.col("logp"),
                                    F.col("tf").cast("int").alias("tf"),
                                )
                            ),
                            lambda p: F.array_repeat(p.logp, p.tf),
                        )
                    )
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            ).alias("fold"),
        )
    )
    got_occ = {r["doc_id"]: (r["n"], r["fold"]) for r in occ.collect()}
    got_tf = {r["doc_id"]: (r["n"], r["fold"]) for r in tf.collect()}
    assert got_occ == got_tf  # exact: counts AND float folds bit-equal
