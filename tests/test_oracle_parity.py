"""Emulates the driver's correctness gate: every catalog query with an
oracle runs on Spark and DuckDB over the same parquet tables; results
must match (row count, column names, order-insensitive values)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from dionysus_rb_spark.plans import all_queries
from dionysus_rb_spark.tables import TABLES

from conftest import SF_DIR


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.floor("us").astype("datetime64[us]")
        elif s.dtype == object:
            import numpy as np

            df[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
            )
    key = df.columns.tolist()
    return df.sort_values(key, na_position="first").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        # EXACT equality, deliberately: the driver's gate hashes rendered
        # values, so a last-ulp difference that a tolerance would forgive
        # still fails certification. Every query is written to be
        # bit-reproducible (sequential folds in index order, rounding at
        # the end) — verified: all 103 oracles bit-identical at sf0.001
        # (round 4). A failure here means the fold-order discipline broke.
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    return a == b


ORACLE_QUERIES = [
    (name, qd) for name, qd in sorted(all_queries().items()) if qd.oracle
]


@pytest.mark.parametrize("name,qd", ORACLE_QUERIES, ids=[n for n, _ in ORACLE_QUERIES])
def test_oracle_parity(spark, name, qd):
    got = qd.fn(spark, SF_DIR).toPandas()
    con = _duck(SF_DIR)
    want = con.execute(qd.oracle).df()
    con.close()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"

    g = _normalize(got)
    w = _normalize(want)
    mismatches = []
    for col in g.columns:
        gv, wv = g[col].tolist(), w[col].tolist()
        for i, (x, y) in enumerate(zip(gv, wv)):
            if not _values_equal(x, y):
                mismatches.append((col, i, x, y))
                if len(mismatches) > 5:
                    break
        if len(mismatches) > 5:
            break
    assert not mismatches, f"{name}: value mismatches {mismatches}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
