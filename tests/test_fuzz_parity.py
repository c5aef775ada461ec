"""Differential fuzz parity: every catalog query vs its DuckDB oracle
on SEEDED SYNTHETIC data the queries have never seen.

The driver's gate (and test_oracle_parity) runs on one fixed dataset,
so a query could in principle be right on that data's distribution and
wrong off it. This suite regenerates all ten tables with a different
seed — same schemas and value domains as TESTDATA.md, but different
draws, plus deliberately adversarial structure the driver data lacks
(exact duplicate documents, heavier near-dup clusters) — and replays
the full oracle comparison. The bit-reproducibility discipline
(sorted folds, rounding at the end, portable hashing) must hold on ANY
data, not just the shipped files; this is the test that says so.

Set SPARK_GRAFT_FUZZ_SEED to fuzz a different draw (default 1337).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from dionysus_rb_spark.plans import all_queries

from test_oracle_parity import _duck, _normalize, _values_equal

SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "1337"))
# Row-count multiplier (default 1 = sf0.001-like). At 10x the
# low-diversity fuzz corpus saturates 32-bit SimHash band buckets, so
# the max_bucket drop actually fires and the oracle must model it —
# the divergence class the sf0.1 sweep caught in round 5.
SCALE = int(os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1"))

# Same 31-word vocabulary as the driver documents corpus: the text
# operators' token/stopword behavior is vocabulary-independent, but
# staying in-domain keeps lang-id/quality score distributions
# comparable while the DRAWS (doc lengths, word mixes, dup structure)
# are entirely different.
VOCAB = (
    "scan column window order sort part agg value line key join merge "
    "query group a vector hash slow stream filter fast the spark batch "
    "table small data big customer row push"
).split()

N_DOCS = 500 * SCALE
N_EVENTS = 1000 * SCALE
N_ORDERS = 1500 * SCALE
N_LINEITEM = 6000 * SCALE
N_CUSTOMER = 150 * SCALE
N_SUPPLIER = 10 * SCALE
N_PART = 200 * SCALE
N_EMB = 500 * SCALE
EMB_DIM = 64


def _gen_tables(rng: np.random.Generator) -> dict[str, pd.DataFrame]:
    t: dict[str, pd.DataFrame] = {}

    t["region"] = pd.DataFrame(
        {
            "r_regionkey": np.arange(5, dtype=np.int32),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
        }
    )
    t["nation"] = pd.DataFrame(
        {
            "n_nationkey": np.arange(25, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": (np.arange(25) % 5).astype(np.int32),
        }
    )
    t["customer"] = pd.DataFrame(
        {
            "c_custkey": np.arange(N_CUSTOMER, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(N_CUSTOMER)],
            "c_nationkey": rng.integers(0, 25, N_CUSTOMER).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-999, 9999, N_CUSTOMER), 2),
            "c_mktsegment": rng.choice(
                ["MACHINERY", "FURNITURE", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"],
                N_CUSTOMER,
            ),
        }
    )
    t["supplier"] = pd.DataFrame(
        {
            "s_suppkey": np.arange(N_SUPPLIER, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPPLIER)],
            "s_nationkey": rng.integers(0, 25, N_SUPPLIER).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(0, 9999, N_SUPPLIER), 2),
        }
    )
    t["part"] = pd.DataFrame(
        {
            "p_partkey": np.arange(N_PART, dtype=np.int64),
            "p_name": [
                f"{a} widget"
                for a in rng.choice(
                    ["cold", "small", "dark", "fast", "slow", "pale"], N_PART
                )
            ],
            "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, N_PART)],
            "p_type": rng.choice(
                ["LARGE", "STANDARD", "ECONOMY", "MEDIUM", "SMALL", "PROMO"],
                N_PART,
            ),
            "p_size": rng.integers(1, 51, N_PART).astype(np.int32),
            "p_retailprice": np.round(rng.uniform(900, 2000, N_PART), 2),
        }
    )

    # Orders/lineitem dates must span the windows the queries filter on
    # (1995-01 genesis/batch windows through 2001) — same domain as the
    # driver data, different draws.
    day0 = np.datetime64("1995-01-01")
    o_dates = day0 + rng.integers(0, 2404, N_ORDERS).astype("timedelta64[D]")
    t["orders"] = pd.DataFrame(
        {
            "o_orderkey": np.arange(N_ORDERS, dtype=np.int64),
            "o_custkey": rng.integers(0, N_CUSTOMER, N_ORDERS).astype(np.int64),
            "o_orderstatus": rng.choice(["F", "O", "P"], N_ORDERS, p=[0.5, 0.4, 0.1]),
            "o_totalprice": np.round(rng.uniform(1000, 400000, N_ORDERS), 2),
            "o_orderdate": o_dates.astype("datetime64[us]"),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
                N_ORDERS,
            ),
        }
    )
    l_orderkey = rng.integers(0, N_ORDERS, N_LINEITEM).astype(np.int64)
    # linenumber: 1..k within each order, deterministic from sort
    li = pd.DataFrame({"l_orderkey": l_orderkey})
    li = li.sort_values("l_orderkey", kind="stable").reset_index(drop=True)
    li["l_linenumber"] = (li.groupby("l_orderkey").cumcount() + 1).astype(np.int32)
    n = len(li)
    l_dates = day0 + rng.integers(0, 2500, n).astype("timedelta64[D]")
    li["l_partkey"] = rng.integers(0, N_PART, n).astype(np.int64)
    li["l_suppkey"] = rng.integers(0, N_SUPPLIER, n).astype(np.int64)
    li["l_quantity"] = rng.integers(1, 51, n).astype(np.float64)
    li["l_extendedprice"] = np.round(rng.uniform(900, 105000, n), 2)
    li["l_discount"] = np.round(rng.integers(0, 11, n) / 100.0, 2)
    li["l_tax"] = np.round(rng.integers(0, 9, n) / 100.0, 2)
    li["l_returnflag"] = rng.choice(["N", "A", "R"], n, p=[0.5, 0.25, 0.25])
    li["l_linestatus"] = rng.choice(["O", "F"], n)
    li["l_shipdate"] = l_dates.astype("datetime64[us]")
    t["lineitem"] = li[
        [
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ]
    ]

    ts0 = np.datetime64("2024-01-01T00:00:00.000000")
    ev_ts = ts0 + np.sort(rng.integers(0, 30 * 86400 * 10**6, N_EVENTS)).astype(
        "timedelta64[us]"
    )
    t["events"] = pd.DataFrame(
        {
            "event_id": np.arange(N_EVENTS, dtype=np.int64),
            "ts": ev_ts.astype("datetime64[us]"),
            "user_id": rng.integers(0, 15, N_EVENTS).astype(np.int64),
            "event_type": rng.choice(
                ["signup", "click", "error", "view", "purchase"], N_EVENTS
            ),
            "value": np.round(rng.uniform(0, 400, N_EVENTS), 2),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVENTS)],
        }
    )

    # Documents: fresh word-mix draws, PLUS adversarial dup structure
    # the driver data lacks — ~10% near-duplicates (a base doc with
    # 0-3 word substitutions) and ~4% EXACT duplicates.
    texts: list[str] = []
    for i in range(N_DOCS):
        if i > 20 and rng.random() < 0.04:
            texts.append(texts[int(rng.integers(0, i))])  # exact dup
            continue
        if i > 20 and rng.random() < 0.10:
            base = texts[int(rng.integers(0, i))].split()
            for _ in range(int(rng.integers(0, 4))):
                base[int(rng.integers(0, len(base)))] = str(
                    rng.choice(VOCAB)
                )
            texts.append(" ".join(base))
            continue
        n_words = int(rng.integers(8, 100))
        texts.append(" ".join(rng.choice(VOCAB, n_words)))
    t["documents"] = pd.DataFrame(
        {
            "doc_id": np.arange(N_DOCS, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(["fr", "es", "en", "de", "zh"], N_DOCS),
            "source": [f"src{i}" for i in rng.integers(0, 20, N_DOCS)],
            "n_chars": np.array([len(s) for s in texts], dtype=np.int64),
        }
    )

    # Embeddings: ~10 loose label clusters + a few near-identical
    # vectors (semantic-dup bait).
    labels = rng.integers(0, 10, N_EMB).astype(np.int32)
    centers = rng.normal(0, 0.08, (10, EMB_DIM))
    vecs = centers[labels] + rng.normal(0, 0.07, (N_EMB, EMB_DIM))
    for _ in range(N_EMB // 20):
        a, b = rng.integers(0, N_EMB, 2)
        vecs[b] = vecs[a] + rng.normal(0, 1e-3, EMB_DIM)
    t["embeddings"] = pd.DataFrame(
        {
            "vec_id": np.arange(N_EMB, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in vecs],
            "label": labels,
        }
    )
    return t


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp(f"fuzz_sf_seed{SEED}_x{SCALE}")
    rng = np.random.default_rng(SEED)
    for name, df in _gen_tables(rng).items():
        if name == "embeddings":
            tbl = pa.table(
                {
                    "vec_id": pa.array(df["vec_id"], pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in df["embedding"]],
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array(df["label"], pa.int32()),
                }
            )
        else:
            tbl = pa.Table.from_pandas(df, preserve_index=False)
        pq.write_table(tbl, out / f"{name}.parquet")
    return str(out)


def test_fuzz_parity_all_queries(spark, fuzz_dir):
    failures: dict[str, str] = {}
    empty: list[str] = []
    ran = 0
    for name, qd in sorted(all_queries().items()):
        if not qd.oracle:
            continue
        ran += 1
        try:
            got = qd.fn(spark, fuzz_dir).toPandas()
            if len(got) == 0:
                empty.append(name)
            con = _duck(fuzz_dir)
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
                    for i, (x, y) in enumerate(zip(g[col].tolist(), w[col].tolist()))
                    if not _values_equal(x, y)
                ][:3]
                if bad:
                    failures[name] = f"value mismatches {bad}"
                    break
        except Exception as e:  # noqa: BLE001 - report per-query
            failures[name] = f"error: {type(e).__name__}: {e}"[:500]
    assert not failures, (
        f"fuzz seed {SEED}: {len(failures)}/{ran} queries diverge:\n"
        + json.dumps(failures, indent=1)
    )
    # Power guard: an agreement on empty results proves nothing. Every
    # query returns rows at the default seed; allow a little variance
    # on other seeds, but a broad emptiness means the generator drifted
    # off the distributions the queries filter on.
    assert len(empty) <= 3, (
        f"fuzz seed {SEED}: {len(empty)} queries returned 0 rows "
        f"({empty}) — the comparison is vacuous for them; fix the "
        "generator's value domains"
    )
