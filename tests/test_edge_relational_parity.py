"""Adversarial-RELATIONAL parity: NULL FKs, orphans, dirty dimensions.

Third corpus of the round-7 adversarial program (after content and
events): the TPC-H-ish tables feeding the serializer/join surface get
NULL foreign keys, orphan children (FK -> nowhere), NULL child ids,
NULL dates/prices/quantities, NaN and ±huge monetary values, and
unicode/empty/quote-laden names. Unlike the first two corpora, the
initial probe ran 104/104 CLEAN — the relational surface is built on
equi-joins, outer joins, and aggregates whose NULL semantics are
SQL-standard and identical across engines (NULL never equi-joins,
count(col) skips NULLs, string_agg/array_join skip NULL elements the
same way). This module pins that audit result so a future refactor
that introduces an engine-specific NULL behavior (an ordering without
a stated NULL position, a cast that saturates, a join rewritten on a
nullable key) fails here instead of in production.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dionysus_rb_spark.plans import all_queries

from test_oracle_parity import _duck, _normalize, _values_equal

SRC_DIR = "/root/testdata/sf0.001"

# every oracle-backed query whose oracle reads a relational table
EDGE_QUERIES = [
    "d4_aggregate_dismantle", "f11_deleted_resource_guard",
    "j2_dependency_parent_fanout", "j3_observer_fanout",
    "j4_to_many_reconciliation", "j5_to_one_resolution",
    "j6_resource_refetch", "j7_observer_overflow",
    "p3_aggregate_assembly", "p4_serializer_dispatch",
    "sql_shared_dialect",
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory) -> str:
    out: Path = tmp_path_factory.mktemp("edge_relational")
    for f in Path(SRC_DIR).glob("*.parquet"):
        shutil.copy(f, out / f.name)
    nan = float("nan")

    cust = pq.read_table(out / "customer.parquet").to_pandas()
    edge_cust = pd.DataFrame(
        {
            "c_custkey": [90001, 90002, 90003, 90004],
            "c_name": [None, 'Zoë "quoted" O\'Brien\nline2', "", "日本語カスタマー"],
            "c_nationkey": [None, 3, 5, 7],
            "c_acctbal": [nan, -0.0, None, 1e308],
            "c_mktsegment": ["MACHINERY", None, "", "AUTOMOBILE"],
        }
    )
    cust2 = pd.concat(
        [cust, edge_cust.astype({"c_custkey": "int64"})], ignore_index=True
    )
    cust2["c_nationkey"] = cust2["c_nationkey"].astype("Int32")
    pq.write_table(
        pa.Table.from_pandas(cust2, preserve_index=False), out / "customer.parquet"
    )

    orders = pq.read_table(out / "orders.parquet").to_pandas()
    edge_orders = pd.DataFrame(
        {
            "o_orderkey": [91001, 91002, 91003, 91004],
            "o_custkey": pd.array([None, 90001, 13, 14], dtype="Int64"),
            "o_orderstatus": ["Z", None, "", "F"],
            "o_totalprice": [None, nan, -5.0, 0.0],
            "o_orderdate": [
                None,
                np.datetime64("1995-01-15"),
                np.datetime64("1969-06-01"),
                np.datetime64("1995-01-20"),
            ],
            "o_orderpriority": [None, "", "1-URGENT", "5-LOW"],
        }
    )
    orders2 = pd.concat([orders, edge_orders], ignore_index=True)
    orders2["o_custkey"] = orders2["o_custkey"].astype("Int64")
    orders2["o_orderdate"] = pd.to_datetime(orders2["o_orderdate"]).astype(
        "datetime64[us]"
    )
    pq.write_table(
        pa.Table.from_pandas(orders2, preserve_index=False), out / "orders.parquet"
    )

    li = pq.read_table(out / "lineitem.parquet").to_pandas()
    edge_li = pd.DataFrame(
        {
            "l_orderkey": pd.array(
                [91002, 91002, None, 99999999, 91004], dtype="Int64"
            ),
            "l_partkey": pd.array([1, None, 2, 3, 4], dtype="Int64"),
            "l_suppkey": pd.array([0, 1, None, 2, 3], dtype="Int64"),
            "l_linenumber": pd.array([1, None, 1, 1, 1], dtype="Int32"),
            "l_quantity": [None, 5.0, 1.0, 2.0, nan],
            "l_extendedprice": [nan, 100.0, None, 50.0, -1.0],
            "l_discount": [0.05, None, 0.0, 0.1, 0.0],
            "l_tax": [0.0, 0.01, None, 0.02, 0.0],
            "l_returnflag": [None, "A", "", "N", "R"],
            "l_linestatus": ["O", None, "F", "", "O"],
            "l_shipdate": pd.to_datetime(
                [None, "1995-02-01", "1995-02-02", "1995-02-03", "1969-01-01"]
            ),
        }
    )
    li2 = pd.concat([li, edge_li], ignore_index=True)
    for c in ("l_orderkey", "l_partkey", "l_suppkey"):
        li2[c] = li2[c].astype("Int64")
    li2["l_linenumber"] = li2["l_linenumber"].astype("Int32")
    li2["l_shipdate"] = pd.to_datetime(li2["l_shipdate"]).astype("datetime64[us]")
    pq.write_table(
        pa.Table.from_pandas(li2, preserve_index=False), out / "lineitem.parquet"
    )
    return str(out)


def test_edge_relational_parity(spark, edge_dir):
    qs = all_queries()
    failures: dict[str, str] = {}
    results: dict[str, pd.DataFrame] = {}
    for name in EDGE_QUERIES:
        qd = qs[name]
        assert qd.oracle, f"{name} lost its oracle"
        try:
            got = qd.fn(spark, edge_dir).toPandas()
            results[name] = got
            con = _duck(edge_dir)
            want = con.execute(qd.oracle).df()
            con.close()
            if sorted(got.columns) != sorted(want.columns):
                failures[name] = (
                    f"columns {sorted(got.columns)} != {sorted(want.columns)}"
                )
                continue
            if len(got) != len(want):
                failures[name] = f"rows {len(got)} != {len(want)}"
                continue
            g, w = _normalize(got), _normalize(want)
            for col in g.columns:
                bad = [
                    (col, i, x, y)
                    for i, (x, y) in enumerate(
                        zip(g[col].tolist(), w[col].tolist())
                    )
                    if not _values_equal(x, y)
                ][:3]
                if bad:
                    failures[name] = f"value mismatches {bad}"
                    break
        except Exception as e:  # noqa: BLE001 - report per-query
            failures[name] = f"error: {type(e).__name__}: {e}"[:400]
    assert not failures, (
        f"{len(failures)}/{len(EDGE_QUERIES)} relational queries diverge:\n"
        + "\n".join(f"  {k}: {v}" for k, v in sorted(failures.items()))
    )

    # power guards: the dirty rows actually flowed through
    p3 = results["p3_aggregate_assembly"]
    assert 91002 in set(p3["o_orderkey"]), "edge parent must assemble"
    row = p3[p3["o_orderkey"] == 91002].iloc[0]
    # the NULL-linenumber child contributes to neither engine's csv
    assert str(row["line_ids_csv"]) == "1"
    assert 91001 in set(p3["o_orderkey"]), "NULL-custkey parent must survive"
