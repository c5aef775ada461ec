"""SimHash near-duplicate fingerprinting.

32-bit SimHash over token h32 hashes: for each bit position, sum +1/-1
votes across a doc's distinct tokens; the sign vector is the
fingerprint. Near-duplicates = fingerprints within a Hamming radius.

At 100 TB the candidate join never compares all pairs: fingerprints are
bucketed by block (the standard Charikar rotation trick — here: the
high half-word) so only same-block docs meet in the shuffle, and the
Hamming check is a cheap xor+bit_count on the bucket-joined pairs.

Fully deterministic (h32), so the DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h32, h32_sql, tokenize, tokenize_sql

BITS = 32


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # F.shiftleft's Python wrapper needs an int numBits; inside a lambda the
    # bit index is a Column, so call the SQL builtin directly.
    def shl(value, i):
        return F.call_function("shiftleft", value, i)

    toks = F.array_distinct(tokenize(F.col(text_col)))
    hashes = F.transform(toks, h32)
    # vote for bit i: +1 if set, -1 if not; fingerprint bit = vote > 0
    fp = F.aggregate(
        F.sequence(F.lit(0), F.lit(BITS - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda a, h: a + F.when(h.bitwiseAND(shl(F.lit(1), i)) > 0, 1).otherwise(-1),
            )
            > 0,
            shl(F.lit(1).cast("long"), i),
        ).otherwise(0),
    )
    return df.select(F.col(id_col).alias("doc_id"), fp.alias("simhash"))


def simhash_pairs(fps: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Candidate pairs by high-half block, verified by Hamming distance."""
    blocked = fps.withColumn("block", F.shiftright("simhash", BITS // 2))
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = a.join(
        b,
        (F.col("a.block") == F.col("b.block")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.bit_count(
            F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
        ).cast("long").alias("hamming"),
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def simhash_sql(max_hamming: int = 3) -> str:
    """DuckDB mirror of simhash + blocked pair generation."""
    toks = f"list_distinct({tokenize_sql('text')})"
    return f"""
    WITH hashed AS (
      SELECT doc_id, list_transform({toks}, t -> {h32_sql('t')}) AS hs
      FROM documents
    ),
    fp AS (
      SELECT doc_id,
             list_reduce(
               list_transform(range({BITS}), i ->
                 CASE WHEN list_reduce(list_transform(hs, h ->
                        CASE WHEN (h & (CAST(1 AS BIGINT) << i)) > 0
                             THEN 1 ELSE -1 END), (a,b) -> a+b) > 0
                      THEN (CAST(1 AS BIGINT) << i) ELSE 0 END),
               (a,b) -> a+b) AS simhash
      FROM hashed
    ),
    blocked AS (SELECT doc_id, simhash, simhash >> {BITS // 2} AS block FROM fp)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM blocked a JOIN blocked b
      ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """
