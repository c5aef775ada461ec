"""Portable hashing primitives — identical results in Spark and DuckDB.

The dedup/similarity operators need hash functions whose exact integer
outputs can be reproduced by the DuckDB oracle. Engine-native hashes
(xxhash64, DuckDB's hash()) differ across engines, so we define
``h32(s) = int(md5(s)[:8], 16)`` — the first 8 hex chars of the md5
digest as an unsigned 32-bit int. md5 is bit-identical everywhere;
the hex->int fold is expressible in both engines.

All arithmetic stays within int64 (max intermediate ~2^61) so no
overflow divergence is possible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_PRIME = (1 << 31) - 1  # 2147483647, the classic minhash modulus


def h32(col: Column) -> Column:
    """First 8 hex chars of md5 as a long in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_prefix_sql(expr: str, ndigits: int = 8) -> str:
    """DuckDB mirror of ``conv(substring(md5(x), 1, ndigits), 16, 10)``
    (hex digits folded to int — DuckDB can't cast '0x..' strings).
    ``ndigits`` must stay <= 15 so the fold fits a signed int64
    (16^15 = 2^60); the 60-bit SimHash fingerprint uses exactly 15."""
    if ndigits > 15:
        raise ValueError(f"ndigits ({ndigits}) > 15 overflows int64")
    return (
        f"list_reduce(list_transform(split(substr(md5({expr}),1,{ndigits}),''),"
        " x -> CAST(strpos('0123456789abcdef', x) - 1 AS BIGINT)),"
        " (a,b) -> a*16+b)"
    )


def h32_sql(expr: str) -> str:
    """DuckDB equivalent of :func:`h32`."""
    return md5_prefix_sql(expr, 8)


def tokenize(col: Column) -> Column:
    """Lowercased alphanumeric tokens; empty strings removed."""
    return F.array_remove(F.split(F.lower(col), "[^a-z0-9]+"), "")


def tokenize_sql(expr: str) -> str:
    return (
        "list_filter(string_split_regex(lower(" + expr + "), '[^a-z0-9]+'),"
        " x -> x <> '')"
    )


def shingles(tokens: Column, k: int = 3) -> Column:
    """Word k-shingles as strings ("a b c"), distinct. Short docs
    (< k tokens) contribute their full token string as one shingle."""
    joined = F.array_join(tokens, " ")
    n = F.size(tokens)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.array_join(F.slice(tokens, i + 1, k), " "),
    )
    return F.array_distinct(F.when(n >= k, grams).otherwise(F.array(joined)))


def shingles_sql(tokens_expr: str, k: int = 3) -> str:
    return f"""
    list_distinct(
      CASE WHEN len({tokens_expr}) >= {k}
           THEN list_transform(range(len({tokens_expr}) - {k} + 1),
                i -> array_to_string(list_slice({tokens_expr}, i + 1, i + {k}), ' '))
           ELSE [array_to_string({tokens_expr}, ' ')] END)
    """
