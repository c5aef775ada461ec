"""The two ADC scoring paths (plan-literal distance tables vs the
closure-shipped numpy table + mapInPandas gather) must be bit-identical:
same distances, same ranks, same tie-breaks. The gate exists purely for
plan-compile scale (a 64x256 codebook is ~16k literals PER QUERY in the
literal plan), so flipping it must never change a result."""

from __future__ import annotations

import pytest

from dionysus_rb_spark.operators import pq
from dionysus_rb_spark.tables import ensure_min_parallelism, load_table

from conftest import SF_DIR

QUERY_IDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark):
    return ensure_min_parallelism(load_table(spark, SF_DIR, "embeddings"))


def _rows(df):
    return sorted(
        (r["query_id"], r["cand_id"], r["adist"], r["rank"])
        for r in df.collect()
    )


def test_adc_broadcast_path_matches_literal_path(spark, emb):
    codebook = pq.seed_codebook(emb, n_codes=8)
    lit = pq.pq_adc_topk(
        emb, codebook, QUERY_IDS, k=10, literal_max_entries=10**9
    )
    bc = pq.pq_adc_topk(emb, codebook, QUERY_IDS, k=10, literal_max_entries=0)
    lit_rows, bc_rows = _rows(lit), _rows(bc)
    assert lit_rows == bc_rows
    assert len(lit_rows) == 10 * len(QUERY_IDS)


def test_adc_broadcast_path_matches_oracle(spark, emb):
    """Same DuckDB oracle the driver runs for emb_pq_adc_topk, against
    the FORCED broadcast path (the default/literal path is covered by
    test_oracle_parity)."""
    import duckdb

    codebook = pq.seed_codebook(emb, n_codes=8)
    got = _rows(
        pq.pq_adc_topk(emb, codebook, QUERY_IDS, k=10, literal_max_entries=0)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = sorted(
        (q, c, a, r)
        for q, c, a, r in con.execute(pq.pq_adc_topk_sql(QUERY_IDS, k=10)).fetchall()
    )
    con.close()
    assert [(q, c, r) for q, c, a, r in got] == [
        (q, c, r) for q, c, a, r in want
    ]
    for (_, _, ga, _), (_, _, wa, _) in zip(got, want):
        assert abs(ga - wa) < 1e-12


def test_adc_default_gate_picks_literal_for_demo_codebook(spark, emb):
    """8x8 = 64 entries per query sits far under the default gate; the
    plan must contain no Python evaluation (pure codegen projection)."""
    codebook = pq.seed_codebook(emb, n_codes=8)
    plan = pq.pq_adc_topk(
        emb, codebook, QUERY_IDS, k=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan


def test_adc_forced_broadcast_uses_arrow_path(spark, emb):
    codebook = pq.seed_codebook(emb, n_codes=8)
    plan = pq.pq_adc_topk(
        emb, codebook, QUERY_IDS, k=10, literal_max_entries=0
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_encode_arrow_path_matches_literal_path(spark, emb):
    """pq_encode has the same gate: the Arrow path (codebook in the
    task closure, numpy argmin) must reproduce the literal path's
    codes, tie-breaks, and rounded MSE exactly."""
    codebook = pq.seed_codebook(emb, n_codes=8)
    lit = sorted(
        (r["vec_id"], r["codes_csv"], r["recon_mse"])
        for r in pq.pq_encode(
            emb, codebook, literal_max_entries=10**9
        ).collect()
    )
    arr = sorted(
        (r["vec_id"], r["codes_csv"], r["recon_mse"])
        for r in pq.pq_encode(emb, codebook, literal_max_entries=0).collect()
    )
    assert lit == arr
    assert len(lit) == emb.count()


def test_encode_default_gate_picks_literal_for_demo_codebook(spark, emb):
    codebook = pq.seed_codebook(emb, n_codes=8)
    plan = (
        pq.pq_encode(emb, codebook)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan


def test_default_gate_switches_to_arrow_past_threshold(spark, emb):
    """A 64-code codebook (8*64 = 512 entries/query > the 256 gate) must
    ride the Arrow path by DEFAULT — and still equal the literal plan."""
    codebook = pq.seed_codebook(emb, n_codes=64)
    df = pq.pq_adc_topk(emb, codebook, QUERY_IDS, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    lit = pq.pq_adc_topk(
        emb, codebook, QUERY_IDS, k=10, literal_max_entries=10**9
    )
    assert _rows(df) == _rows(lit)


def test_admission_filter_evaluates_at_scan_not_in_centroid_join(spark):
    """VERDICT r7 item 7: the finite-vector admission predicate is real
    per-row work (an aggregate over the embedding array), so it must run
    ONCE per vector at the parquet scan — pushed into the scan's
    DataFilters, below any Generate/join — never inside the exploded
    (vector x centroid) inner loop where it would be re-evaluated
    n_centroids times. Pins the placement for the ADC and IVF paths."""
    from dionysus_rb_spark.plans.catalog import all_queries

    qs = all_queries()
    for name in ("emb_pq_adc_topk", "ann_ivf_topk", "ann_ivfpq_topk"):
        df = qs[name].fn(spark, SF_DIR)
        df.collect()  # finalize the AQE plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        for ln in plan.splitlines():
            if "FileScan parquet" in ln and "embedding#" in ln:
                # (the printed list is truncated, so match "non-empty
                # DataFilters over the embedding column" rather than the
                # full aggregate text)
                assert "DataFilters: [(" in ln and "transform(embedding#" in ln, (
                    f"{name}: embeddings scan carries no pushed admission "
                    f"filter — predicate moved above the scan:\n{ln[:300]}"
                )
        # ...and no Filter above a Generate re-checks admission: every
        # plan line that both filters and aggregates over the embedding
        # must be a scan-adjacent Filter, which Spark prints with the
        # FileScan as its direct child. Cheap structural proxy: the
        # explode expressions (Generate lines) must not contain the
        # isnan-admission aggregate pattern.
        for ln in plan.splitlines():
            if "Generate explode" in ln:
                assert "isnan" not in ln.lower(), (
                    f"{name}: admission check found inside the exploded "
                    f"centroid loop:\n{ln[:300]}"
                )
