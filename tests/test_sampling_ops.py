"""Property checks for the corpus-mix operators: the value-bucketed
token-budget prefix-sum equals the sequential model, and mixture/epoch
replication realizes exactly the deterministic copy counts."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dionysus_rb_spark.operators.textops import mix_epochs, token_budget_cap


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1_000_000),  # quality in millionths -> [0, 1]
            st.integers(0, 300),  # n_tokens
        ),
        min_size=1,
        max_size=60,
    ),
    budget=st.integers(1, 4000),
    buckets=st.sampled_from([1, 7, 1000]),
)
def test_token_budget_matches_sequential_model(spark, rows, budget, buckets):
    data = [(i, q / 1_000_000.0, n) for i, (q, n) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "doc_id LONG, quality DOUBLE, n_tokens LONG"
    ).repartition(4)
    got = {
        r["doc_id"]: r["prior_tokens"]
        for r in token_budget_cap(
            df, "quality", "n_tokens", "doc_id", budget=budget, buckets=buckets
        ).collect()
    }
    expected, acc = {}, 0
    for doc_id, q, n in sorted(data, key=lambda t: (-t[1], t[0])):
        if acc < budget:
            expected[doc_id] = acc
        acc += n
    assert got == expected


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    n_rows=st.integers(1, 60),
    w_en=st.sampled_from([0.0, 0.25, 0.5, 1.0, 2.5, 3.0]),
    w_default=st.sampled_from([0.5, 1.0]),
)
def test_mix_epochs_realizes_hash_copy_counts(spark, n_rows, w_en, w_default):
    from dionysus_rb_spark.functions.hashing import h32

    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(n_rows)],
        "doc_id LONG, lang STRING",
    )
    out = mix_epochs(df, "doc_id", "lang", {"en": w_en}, default_weight=w_default)
    counts = {
        (r["doc_id"], r["lang"]): r["n"]
        for r in out.groupBy("doc_id", "lang").agg(F.count("*").alias("n")).collect()
    }
    hashes = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", (h32(F.col("doc_id").cast("string")) % 100).alias("h")
        ).collect()
    }
    import math

    for i in range(n_rows):
        lang = "en" if i % 2 == 0 else "de"
        w = w_en if lang == "en" else w_default
        expected = math.floor(w) + (
            1 if hashes[i] < int((w - math.floor(w)) * 100) else 0
        )
        got = counts.get((i, lang), 0)
        assert got == expected, (i, lang, w, hashes[i], got, expected)
        if got:
            # epochs are dense 0..n-1
            epochs = sorted(
                r["epoch"]
                for r in out.filter(F.col("doc_id") == i).collect()
            )
            assert epochs == list(range(expected))


def test_pq_training_reduces_reconstruction_error(spark):
    """One Lloyd iteration per sub-space must not worsen — and in
    practice strictly improves — mean reconstruction error vs the seed
    codebook."""
    import pyspark.sql.functions as F

    from dionysus_rb_spark.operators import pq
    from dionysus_rb_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    seed = pq.seed_codebook(emb, n_codes=8)
    trained = pq.train_codebook(emb, n_codes=8, n_sub=8, iters=1, dim=64)
    mse_seed = (
        pq.pq_encode(emb, seed).agg(F.avg("recon_mse")).first()[0]
    )
    mse_trained = (
        pq.pq_encode(emb, trained).agg(F.avg("recon_mse")).first()[0]
    )
    assert mse_trained < mse_seed
