"""Driver contract for the spark-graft builder (PySpark target).

Backed by the query catalog in ``dionysus_rb_spark.plans`` — one entry
per implemented operator from SURVEY §2 (plus the training-data-pipeline
operators), each paired with a DuckDB oracle when SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dionysus_rb_spark.plans import all_queries

FLAGSHIP = "f1_guarded_merge_snapshot"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the consumer persist path (A1 dedup -> F1/F3-guarded
    MERGE snapshot) on sf0.001."""
    return all_queries()[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle for name, qd in all_queries().items() if qd.oracle is not None
    }
