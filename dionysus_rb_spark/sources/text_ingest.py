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

__all__ = ["read_jsonl", "read_csv", "split_corrupt"]

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


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """Split an ingested frame into (clean, dead_letter).

    ``clean`` drops the corrupt column; ``dead_letter`` carries the raw
    line plus its source file — enough to replay after a fix, exactly
    what the reference's DLQ stores (event + raw value).

    The frame is cached first: Spark refuses to evaluate a query that
    references ONLY the corrupt column against the live JSON relation
    (the parser prunes columns, so the corrupt flag would be computed
    from nothing), and the split reads the frame twice anyway — the
    cache is both the documented requirement and the right plan.
    """
    # input_file_name() must be captured BEFORE the cache: over the
    # cached InMemoryRelation it evaluates to '' (no file underneath)
    df = df.withColumn("_src_file", F.input_file_name()).cache()
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col, "_src_file")
    dead = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw"),
        F.col("_src_file").alias("source_file"),
    )
    return clean, dead
