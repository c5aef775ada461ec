"""Schema-drift contract: canonical read schemas vs producer drift.

At 100 TB a table directory accumulates files from many producer
versions. ``spark.read.parquet`` without a schema infers from ONE
footer — the column set depends on which file the driver happened to
sample — and ``mergeSchema=true`` hard-fails on int-width drift
(CANNOT_MERGE_SCHEMAS, measured round 7). ``tables.load_table``
therefore declares the canonical schema at scan time, which pins four
semantics this module tests:

  1. a file missing a canonical column contributes NULLs for its rows;
  2. extra producer-side columns are pruned at the scan;
  3. physically narrower ints (int32 files under a bigint canon)
     widen losslessly;
  4. the well-formed read plan is IDENTICAL to the inferred one
     (same expression tree modulo exprIds) — enforcement changes
     nothing on clean directories, so certified plans stay certified.

DuckDB's equivalent knob is ``union_by_name=true``; the cross-engine
check runs one real catalog query over the drifted directory against
that oracle shape.
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dionysus_rb_spark.tables import CANONICAL_SCHEMAS, TABLES, load_table

SRC_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def drift_dir(tmp_path_factory) -> str:
    out: Path = tmp_path_factory.mktemp("schema_drift")
    for f in Path(SRC_DIR).glob("*.parquet"):
        shutil.copy(f, out / f.name)
    # rebuild documents as a DIRECTORY of drifted producer files
    (out / "documents.parquet").unlink()
    d = out / "documents.parquet"
    d.mkdir()
    # producer v1: canonical shape
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([90001, 90002], pa.int64()),
                "text": ["alpha beta gamma", "delta epsilon zeta"],
                "lang": ["en", "fr"],
                "source": ["s1", "s2"],
                "n_chars": pa.array([16, 18], pa.int64()),
            }
        ),
        d / "part-v1.parquet",
    )
    # producer v2: dropped `source`, added `quality` (schema evolution)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([90003], pa.int64()),
                "text": ["eta theta iota"],
                "lang": ["de"],
                "n_chars": pa.array([14], pa.int64()),
                "quality": [0.9],
            }
        ),
        d / "part-v2.parquet",
    )
    # producer v3: int32 ids/lengths (narrower physical encoding)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([90004], pa.int32()),
                "text": ["kappa lambda mu"],
                "lang": ["es"],
                "source": pa.array(["s3"]),
                "n_chars": pa.array([15], pa.int32()),
            }
        ),
        d / "part-v3.parquet",
    )
    return str(out)


def test_clean_read_plan_identical_to_inferred(spark):
    """Enforcement must be a no-op on well-formed directories: the
    optimized plan equals the inference plan modulo exprIds (certified
    plans stay certified)."""
    strip = re.compile(r"#\d+")
    for t in TABLES:
        if t not in CANONICAL_SCHEMAS:
            continue  # events: encoding-dependent, stays on inference
        enforced = load_table(spark, SRC_DIR, t)
        inferred = spark.read.parquet(f"{SRC_DIR}/{t}.parquet")
        pe = strip.sub("#x", enforced._jdf.queryExecution().optimizedPlan().toString())
        pi = strip.sub("#x", inferred._jdf.queryExecution().optimizedPlan().toString())
        assert pe == pi, f"{t}: enforced read changed the scan plan"
        assert enforced.schema == inferred.schema, f"{t}: schema drifted"


def test_drifted_directory_reads_canonically(spark, drift_dir):
    docs = load_table(spark, drift_dir, "documents")
    assert docs.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,lang:string,source:string,"
        "n_chars:bigint>"
    ), "drifted directory must read with the canonical schema"
    rows = {r["doc_id"]: r for r in docs.collect()}
    assert set(rows) == {90001, 90002, 90003, 90004}
    # missing column -> NULL for that producer's rows only
    assert rows[90003]["source"] is None
    assert rows[90001]["source"] == "s1" and rows[90004]["source"] == "s3"
    # extra column pruned: not in the schema at all (asserted above);
    # int32 rows widened losslessly
    assert rows[90004]["n_chars"] == 15 and isinstance(rows[90004]["doc_id"], int)


def test_drifted_directory_cross_engine(spark, drift_dir):
    """One real catalog query over the drifted directory, against the
    DuckDB union_by_name read — the engines must agree on the drifted
    rows, not just the clean ones."""
    from dionysus_rb_spark.plans import all_queries

    got = (
        all_queries()["dd_exact_dedup"]
        .fn(spark, drift_dir)
        .toPandas()
        .sort_values("doc_id")
    )
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH documents AS (
          SELECT doc_id, text, lang, source, n_chars
          FROM read_parquet('{drift_dir}/documents.parquet/*.parquet',
                            union_by_name=true)
        ),
        fp AS (
          SELECT doc_id,
                 CASE WHEN text IS NULL OR NOT regexp_matches(lower(text), '[a-z0-9]')
                      THEN NULL
                      ELSE md5(array_to_string(
                           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                       x -> x <> ''), ' ')) END AS f
          FROM documents
        )
        SELECT doc_id FROM fp
        WHERE f IS NULL
           OR doc_id = (SELECT min(doc_id) FROM fp g WHERE g.f = fp.f)
        ORDER BY doc_id
        """
    ).df()
    con.close()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
