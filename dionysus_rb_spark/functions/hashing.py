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
    (< k tokens) contribute their full token string as one shingle;
    ZERO-token docs contribute NO shingles. The empty case is explicit
    because the two engines disagree one level down — Spark
    ``array_join([], ' ')`` is ``''`` while DuckDB
    ``array_to_string([], ' ')`` is NULL (silently stripped by
    ``list_distinct``) — and because a ``['']`` shingle set is a
    correctness hazard at corpus scale: the ASCII tokenizer maps EVERY
    non-Latin document (CJK, emoji-only, whitespace-only, empty) to
    zero tokens, so a shared empty shingle would collapse all of them
    into one jaccard-1.0 "near-dup" cluster and dedup would drop
    millions of unrelated documents. No shingles => no candidates =>
    such docs pass through dedup untouched (found by the round-7
    adversarial content fuzz)."""
    joined = F.array_join(tokens, " ")
    n = F.size(tokens)
    # Grams build by zip_with-ing the token array against its own
    # k-1 shifted copies (concat per step), then slicing off the
    # null-padded tail. zip_with evaluates each array argument ONCE per
    # row; the previous transform(sequence(0, n-k), i -> slice(tokens,
    # i+1, k)) re-evaluated the full ``tokens`` expression tree per
    # gram index whenever the caller passed an expression (tokenize of
    # the text column) rather than a column attribute — measured 6.4x
    # slower at sf0.1 with identical output (optimization r13, guide
    # §1.2 per-task work).
    cur = tokens
    for j in range(1, k):
        cur = F.zip_with(
            cur,
            F.slice(tokens, j + 1, F.lit(1 << 30)),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    grams = F.slice(cur, 1, F.greatest(n - k + 1, F.lit(0)))
    return F.array_distinct(
        F.when(n >= k, grams)
        .when(n > 0, F.array(joined))
        .otherwise(F.array().cast("array<string>"))
    )


def shingles_sql(tokens_expr: str, k: int = 3) -> str:
    """DuckDB mirror of :func:`shingles` — the zero-token branch is an
    explicit typed empty list (DuckDB's ``array_to_string([], ' ')``
    yields NULL, which ``list_distinct`` strips; relying on that
    accident would leave the semantics undocumented)."""
    return f"""
    list_distinct(
      CASE WHEN len({tokens_expr}) >= {k}
           THEN list_transform(range(len({tokens_expr}) - {k} + 1),
                i -> array_to_string(list_slice({tokens_expr}, i + 1, i + {k}), ' '))
           WHEN len({tokens_expr}) > 0
           THEN [array_to_string({tokens_expr}, ' ')]
           ELSE CAST([] AS VARCHAR[]) END)
    """
