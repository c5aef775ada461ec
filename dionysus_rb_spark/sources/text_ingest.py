"""Raw JSONL ingestion with canonical schemas and dead-letter capture.

Training corpora arrive as JSON-lines long before they are parquet —
crawler output, API dumps, vendor deliveries — and at 100 TB the two
ingestion failure modes are silent: a malformed line silently dropped
(DROPMALFORMED) skews the corpus, and an inferred schema silently
drifts with whichever file the driver sampled. This reader does
neither: the canonical table schema (tables.CANONICAL_SCHEMAS) is
declared at the scan, and malformed records are CAPTURED into a
corrupt-record column and split into a dead-letter frame — the batch
analogue of the consumer's F4 message-filter + T9 DLQ path
(lib/dionysus/consumer — message filters divert, never drop;
README.md:804-852 retry/DLQ), so every input line is accounted for:
parsed, or dead-lettered with its raw text.

Compression is transparent (Spark's codec inference: .gz etc.), and
the reader composes with the corpus sink: read_jsonl -> curation ->
write_corpus_shards is the parquet-landing path for raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import CANONICAL_SCHEMAS

__all__ = ["read_jsonl", "read_csv", "split_corrupt", "release_split"]

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    schema: str | None = None,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read JSON-lines under the canonical schema for ``table`` (or an
    explicit DDL ``schema``), in PERMISSIVE mode with the raw text of
    every unparseable line captured in ``corrupt_col``.

    Semantics per line: valid JSON matching the schema parses normally;
    a missing field is NULL (missing is not empty); a type-mismatched
    field or syntactically broken line yields NULLs for the data
    columns and the raw line in ``corrupt_col`` — nothing is dropped.
    """
    if (table is None) == (schema is None):
        raise ValueError("pass exactly one of table= or schema=")
    ddl = schema if schema is not None else CANONICAL_SCHEMAS[table]
    return (
        spark.read.schema(f"{ddl}, {corrupt_col} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    schema: str | None = None,
    header: bool = True,
    sep: str = ",",
    quote: str = '"',
    escape: str = "\\",
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read CSV/TSV under the canonical schema for ``table`` (or an
    explicit DDL ``schema``), in PERMISSIVE mode with every anomalous
    line captured in ``corrupt_col``. Same accounting contract as
    :func:`read_jsonl`: parsed, or dead-lettered — never dropped.

    CSV is positional, so its anomaly surface differs from JSON's
    (probed on Spark 4.1, pinned in tests/test_text_ingest.py):

    - under-length row (fewer fields than the schema): present fields
      parse, the missing ones are NULL, AND the raw line is captured —
      unlike JSON, where a missing *named* field is legal and clean,
      a missing *positional* field is structurally anomalous;
    - over-length row: the schema-width prefix parses, raw captured;
    - type mismatch: that field is NULL, the rest parse, raw captured.

    In all three cases the parse is best-effort but the row routes to
    the dead-letter frame via :func:`split_corrupt` (the corrupt column
    is non-NULL), so ``clean`` holds only rows whose every field
    round-tripped. Columns bind to the schema by POSITION; with
    ``header=True`` the first line is skipped, not validated (Spark's
    ``enforceSchema`` default). Compression is codec-inferred (.gz).
    """
    if (table is None) == (schema is None):
        raise ValueError("pass exactly one of table= or schema=")
    ddl = schema if schema is not None else CANONICAL_SCHEMAS[table]
    return (
        spark.read.schema(f"{ddl}, {corrupt_col} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("quote", quote)
        .option("escape", escape)
        .csv(path)
    )


_SPLIT_CACHE_ATTR = "_dionysus_split_cache"


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL, *, mode: str = "land"
) -> tuple[DataFrame, DataFrame]:
    """Split an ingested frame into (clean, dead_letter).

    ``clean`` drops the corrupt column; ``dead_letter`` carries the raw
    line plus its source file — enough to replay after a fix, exactly
    what the reference's DLQ stores (event + raw value).

    The split cannot run against the live text relation: Spark refuses
    to evaluate a query that references ONLY the corrupt column (the
    parser prunes columns, so the corrupt flag would be computed from
    nothing), and both halves read the parse result anyway, so it must
    be materialized once. HOW it is materialized is the 100 TB question
    (ADVICE r7: a cache of the entire raw input, pinned for the
    session's lifetime, is the wrong footprint at corpus scale):

    - ``mode="land"`` (default): one managed parquet roundtrip via
      :func:`~..operators.lineage.truncate_lineage` — the parse runs
      exactly once, the split reads the landed copy with zero executor
      memory pinned, repeated ingests accumulate nothing in memory, and
      the landing directory is reclaimed at interpreter exit (or lives
      under the session's checkpoint dir on a cluster). Eager: the
      parse job runs inside this call.
    - ``mode="cache"``: the small-frame fast path (MEMORY_AND_DISK,
      lazy). Ownership contract: BOTH returned frames depend on one
      cached relation, which stays pinned until the session ends or the
      caller releases it with :func:`release_split` after consuming
      clean/dead.
    """
    # input_file_name() must be captured BEFORE materializing: over the
    # cached/landed relation it evaluates to '' (no file underneath)
    df = df.withColumn("_src_file", F.input_file_name())
    cached = None
    if mode == "land":
        from ..operators.lineage import truncate_lineage

        df = truncate_lineage(df)
    elif mode == "cache":
        df = cached = df.cache()
    else:
        raise ValueError(f"mode must be 'land' or 'cache', got {mode!r}")
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col, "_src_file")
    dead = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw"),
        F.col("_src_file").alias("source_file"),
    )
    if cached is not None:
        setattr(clean, _SPLIT_CACHE_ATTR, cached)
        setattr(dead, _SPLIT_CACHE_ATTR, cached)
    return clean, dead


def release_split(frame: DataFrame) -> bool:
    """Unpersist the cached relation backing a ``split_corrupt(mode=
    "cache")`` result. Pass either returned frame once both are fully
    consumed (an un-consumed sibling recomputes from source afterwards
    — correct, just slower). Returns False for frames that carry no
    cache (e.g. the default ``mode="land"`` results, which have nothing
    to release)."""
    cached = getattr(frame, _SPLIT_CACHE_ATTR, None)
    if cached is None:
        return False
    cached.unpersist()
    return True
