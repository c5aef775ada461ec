"""Registry of (name -> spark query, duckdb oracle) pairs.

Every operator claimed done in SURVEY §2 gets one entry here: a Spark
callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the
equivalent ANSI SQL DuckDB runs on the same parquet views. Column names
are aliased identically on both sides — the driver sorts columns by name
before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: SparkQuery
    oracle: str | None
    refs: str  # SURVEY §2 operator ids this query certifies, e.g. "A1,O3"
    bench: bool = False  # include in bench.py headline set
    doc: str = field(default="", repr=False)


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, refs: str = "", bench: bool = False):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, refs, bench, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    return dict(_REGISTRY)
