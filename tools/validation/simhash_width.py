"""SimHash fingerprint-width study at corpus scale (SCALING.md).

Re-runnable record of the round-5/6 width claims: on a 500k-doc corpus,
32-bit fingerprints (8-bit bands, 256 values) saturate their band
buckets — corpus_size / 256 >> max_bucket — so most band rows are
dropped by the cap and banding stops finding pairs, while the 60-bit
corpus-regime fingerprint (bits=WIDE_BITS: 15-bit bands, 32k values)
keeps buckets under the cap and completes end-to-end. dd_simhash_wide
certifies the wide shape against the DuckDB oracle at driver scale;
this harness measures WHY that shape is the production knob.

Prints, per width:
  - band rows total / band rows in over-cap buckets (the drop fraction)
  - distinct band values occupied
  - for the wide shape: verified hamming<=3 pair count + wall time

Usage: python tools/validation/simhash_width.py [n_docs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from dionysus_rb_spark.operators.simhash import (
    BITS,
    WIDE_BITS,
    simhash,
    simhash_pairs,
)
from dionysus_rb_spark.session import get_spark

from corpus500k import build_corpus  # noqa: E402  (same directory)

MAX_BUCKET = 1000
BANDS = 4


def band_stats(fps, bits: int) -> dict:
    width = bits // BANDS
    mask = (1 << width) - 1
    bands_sql = "array(%s)" % ", ".join(
        f"concat('{b}:', cast(shiftright(simhash, {b * width}) & {mask} as string))"
        for b in range(BANDS)
    )
    rows = fps.select(F.explode(F.expr(bands_sql)).alias("band_key"))
    per_bucket = rows.groupBy("band_key").agg(F.count("*").alias("n"))
    agg = per_bucket.agg(
        F.sum("n").alias("total_rows"),
        F.sum(F.when(F.col("n") > MAX_BUCKET, F.col("n")).otherwise(0)).alias(
            "capped_rows"
        ),
        F.count("*").alias("distinct_band_values"),
    ).collect()[0]
    return {
        "total_rows": agg["total_rows"],
        "capped_rows": agg["capped_rows"],
        "capped_frac": agg["capped_rows"] / agg["total_rows"],
        "distinct_band_values": agg["distinct_band_values"],
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out = REPO / ".scratch" / "simhash_width"
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark()
    build_corpus(spark, out, n_docs)
    docs = spark.read.parquet(str(out / "documents.parquet"))

    for bits in (BITS, WIDE_BITS):
        fps = simhash(docs, "text", "doc_id", bits=bits).persist()
        t0 = time.time()
        stats = band_stats(fps, bits)
        print(
            f"bits={bits}: band rows {stats['total_rows']:,}, "
            f"in over-cap buckets {stats['capped_rows']:,} "
            f"({stats['capped_frac']:.1%} dropped by max_bucket={MAX_BUCKET}), "
            f"{stats['distinct_band_values']:,} distinct band values "
            f"of {BANDS * 2 ** (bits // BANDS):,} possible "
            f"[{time.time() - t0:.1f}s]"
        )
        if bits == WIDE_BITS:
            t0 = time.time()
            n_pairs = simhash_pairs(
                fps, max_hamming=3, bands=BANDS, max_bucket=MAX_BUCKET, bits=bits
            ).count()
            print(
                f"bits={bits}: {n_pairs:,} verified hamming<=3 pairs "
                f"in {time.time() - t0:.1f}s "
                f"({n_docs / (time.time() - t0):,.0f} docs/s)"
            )
        fps.unpersist()


if __name__ == "__main__":
    main()
