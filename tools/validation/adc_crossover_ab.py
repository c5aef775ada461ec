"""ADC literal-vs-Arrow crossover A/B (optimization r14, VERDICT r13
item 6): ADC_LITERAL_MAX_ENTRIES = 256 was set from the round-4
scoring-stage isolation (literal won at 64 entries, lost from 512 up);
this harness measures the two paths AT the boundary shapes on a
200k-vector synthetic corpus so the crossover is set where measurement
says, not interpolated.

For each n_codes in the sweep (n_sub = 8 fixed), pq_adc_topk runs with
``literal_max_entries`` forced high (literal path) and forced 0 (Arrow
mapInPandas path), interleaved, 3 passes each, min-of-warm reported.
Both paths return bit-identical rows (asserted on the first pass).

Usage: python tools/validation/adc_crossover_ab.py [n_codes ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from dionysus_rb_spark.operators import pq
from dionysus_rb_spark.session import get_spark

N_VEC = 200_000
DIM = 64
N_SUB = 8
K = 10
QUERY_IDS = [1, 5001, 10001, 15001, 20001]


def main() -> None:
    sweep = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
    spark = get_spark("adc-crossover")
    emb = spark.range(N_VEC).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(10000)) / 10000.0 - 0.5
            ).cast("float"),
        ).alias("embedding"),
    )
    emb = emb.localCheckpoint(eager=True)  # time the operator, not generation

    for n_codes in sweep:
        codebook = pq.seed_codebook(emb, n_codes=n_codes)
        entries = N_SUB * n_codes

        def run(path_literal: bool) -> "DataFrame":
            return pq.pq_adc_topk(
                emb,
                codebook,
                QUERY_IDS,
                k=K,
                n_sub=N_SUB,
                literal_max_entries=(1 << 30) if path_literal else 0,
            )

        # identity check once per shape
        lit_rows = sorted(map(tuple, run(True).collect()))
        arw_rows = sorted(map(tuple, run(False).collect()))
        assert lit_rows == arw_rows, f"paths diverge at {entries} entries"

        times: dict[str, list[float]] = {"literal": [], "arrow": []}
        for _ in range(3):
            for name, flag in (("literal", True), ("arrow", False)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                run(flag).write.format("noop").mode("overwrite").save()
                times[name].append(time.perf_counter() - t0)
        lit = min(times["literal"][1:])
        arw = min(times["arrow"][1:])
        print(
            f"entries {entries:5d} (8x{n_codes:3d}): literal {lit:6.2f}s "
            f"arrow {arw:6.2f}s -> {'LITERAL' if lit < arw else 'ARROW'} "
            f"({lit / arw:.2f}x)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
