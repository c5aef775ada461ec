"""Recall floors for the ANN paths, so a plan change can never silently
trade recall for speed (VERDICT r1 item 8).

Ground truth is the exact brute-force top-10. Floors are calibrated to
what each index family structurally delivers on the testdata
embeddings (64-dim, near-isotropic — PQ's worst case):

- IVF (nprobe=2 of 8 cells) reaches ~0.9 here; the floor is 0.8 — the
  "real ANN" quality bar.
- PQ-ADC with the default 8x8 codebook is a 32x-compression trade and
  lands ~0.3 on isotropic vectors (no subspace structure to exploit);
  its floor is 0.2, a pure regression tripwire for the encode/ADC
  plumbing, not a quality claim (production tunes n_codes/n_sub up).
"""

from __future__ import annotations

from collections import defaultdict

from conftest import SF_DIR

from dionysus_rb_spark.operators import pq, similarity
from dionysus_rb_spark.tables import ensure_min_parallelism, load_table

QUERY_IDS = [0, 1, 2, 3, 4]


def _exact(spark):
    emb = ensure_min_parallelism(load_table(spark, SF_DIR, "embeddings"))
    got = similarity.brute_force_topk(emb, QUERY_IDS, k=10)
    return emb, {(r["query_id"], r["cand_id"]) for r in got.collect()}


def test_ivf_recall_floor(spark):
    emb, exact = _exact(spark)
    ivf = similarity.ivf_topk(emb, QUERY_IDS, k=10, n_centroids=8, nprobe=2)
    hits = {(r["query_id"], r["cand_id"]) for r in ivf.collect()}
    recall = len(exact & hits) / len(exact)
    assert recall >= 0.8, f"IVF recall@10 regressed: {recall:.2f} < 0.8"


def test_pq_adc_recall_floor(spark):
    emb, exact = _exact(spark)
    codebook = pq.train_codebook(emb, n_codes=8, n_sub=8, iters=1, dim=64)
    adc = pq.pq_adc_topk(emb, codebook, QUERY_IDS, k=11, n_sub=8)
    per: dict[int, list[int]] = defaultdict(list)
    rows = [r for r in adc.collect() if r["cand_id"] != r["query_id"]]
    for r in sorted(rows, key=lambda r: (r["query_id"], r["adist"], r["cand_id"])):
        if len(per[r["query_id"]]) < 10:
            per[r["query_id"]].append(r["cand_id"])
    hits = {(q, c) for q, cs in per.items() for c in cs}
    recall = len(exact & hits) / len(exact)
    assert recall >= 0.2, f"PQ-ADC recall@10 regressed: {recall:.2f} < 0.2"


def test_kmeans_fast_mean_mode_matches_sorted_fold(spark):
    """mean_mode="fast" (plain F.avg centroid means) must produce the
    SAME cluster assignments as the bit-reproducible sorted-fold default
    on data whose clusters are separated by far more than a last-ulp
    cosine difference — the only thing "fast" gives up is float addition
    order. Well-separated data: four orthogonal-ish direction bundles."""
    import pytest

    from dionysus_rb_spark.operators.clustering import kmeans_assign

    rows = []
    for vid in range(40):
        base = [0.0] * 8
        base[vid % 4] = 1.0
        base[(vid % 4) + 4] = 0.1 + 0.01 * (vid // 4)  # jitter within bundle
        rows.append((vid, [float(x) for x in base]))
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    ref = {
        (r["vec_id"], r["cluster_id"])
        for r in kmeans_assign(emb, k=4, iters=2).collect()
    }
    fast = {
        (r["vec_id"], r["cluster_id"])
        for r in kmeans_assign(emb, k=4, iters=2, mean_mode="fast").collect()
    }
    assert fast == ref
    with pytest.raises(ValueError, match="mean_mode"):
        kmeans_assign(emb, k=4, iters=1, mean_mode="typo")
