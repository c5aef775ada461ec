"""PQ Arrow-path validation at 40x the bench corpus (SCALING.md).

200k synthetic 64-dim vectors with a 16x256 codebook — 4,096
table entries per query, firmly past ADC_LITERAL_MAX_ENTRIES, so both
encode and ADC scoring take the Arrow mapInPandas path with the
distance tables riding the task closure as numpy arrays. The literal
plan at this shape spends ~tens of seconds of SERIAL driver time in
plan analysis before reading a row; the Arrow path's cost is all
data-parallel scan work.

Also times kmeans_assign (k=8, 2 Lloyd rounds) on the same corpus.

Generation is fully distributed (hash-derived floats, no driver
loops). Prints timings; asserts encode covers the corpus and top-k
returns k rows per query.

Usage: python tools/validation/adc_scale.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from dionysus_rb_spark.operators import pq
from dionysus_rb_spark.operators.clustering import kmeans_assign
from dionysus_rb_spark.session import get_spark

N_VEC = 200_000
DIM = 64
N_SUB = 16
N_CODES = 256
K = 10
QUERY_IDS = [1, 5001, 10001, 15001, 20001]


def main() -> None:
    spark = get_spark(cpus=16)
    # hash-derived floats in [-0.5, 0.5): deterministic, no driver data
    emb = spark.range(N_VEC).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(10000)) / 10000.0 - 0.5
            ).cast("float"),
        ).alias("embedding"),
    )
    emb = emb.localCheckpoint(eager=True)  # time operators, not generation

    codebook = pq.seed_codebook(emb, n_codes=N_CODES)
    assert N_SUB * N_CODES > pq.ADC_LITERAL_MAX_ENTRIES  # Arrow path

    t0 = time.time()
    enc = pq.pq_encode(emb, codebook, n_sub=N_SUB)
    n_enc = enc.count()
    t_enc = time.time() - t0
    print(f"pq_encode (Arrow): {t_enc:.1f}s ({n_enc / t_enc:,.0f} vec/s)")
    assert n_enc == N_VEC

    t0 = time.time()
    top = pq.pq_adc_topk(emb, codebook, QUERY_IDS, k=K, n_sub=N_SUB)
    rows = top.count()
    t_adc = time.time() - t0
    print(f"pq_adc_topk (Arrow, {len(QUERY_IDS)} queries): {t_adc:.1f}s")
    assert rows == len(QUERY_IDS) * K

    t0 = time.time()
    assigned = kmeans_assign(emb, k=8, iters=2)
    n_assigned = assigned.count()
    t_km = time.time() - t0
    print(f"kmeans_assign (k=8, iters=2): {t_km:.1f}s")
    assert n_assigned == N_VEC


if __name__ == "__main__":
    main()
