"""Connected-components unit checks: chains that need multiple
star iterations, disjoint components, and convergence — plus a
property test against a driver-side union-find reference (guards the
scalar fixpoint check: an early stop would leave some vertex above
its true min label)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dionysus_rb_spark.operators.graph import connected_components


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min vertex id per component, matching connected_components' label
    comp: dict[int, int] = {}
    for v in parent:
        r = find(v)
        comp[v] = min(comp.get(r, v), v)
    return {v: comp[find(v)] for v in parent}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
    got = {
        r["vertex"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)


def test_connected_components_long_chain_pointer_jumping(spark):
    # A 120-vertex path has diameter 119: plain neighbor propagation
    # would need ~119 rounds and silently return split clusters at
    # max_iter=20; pointer jumping needs ~log2(119) ≈ 7. Shuffled vertex
    # ids so the min sits mid-chain, not at an end.
    import random

    ids = list(range(120))
    random.Random(7).shuffle(ids)
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(119)], "doc_a LONG, doc_b LONG"
    )
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(edges, max_iter=12).collect()
    }
    assert got == {v: 0 for v in ids}


def test_connected_components_duplicate_edges(spark):
    # dedup_edges=False is the default: repeated edges must not change
    # any label (min is duplicate-tolerant), with or without the dedup.
    raw = [(1, 2), (2, 1), (1, 2), (2, 3), (2, 3), (5, 4)]
    df = spark.createDataFrame(raw, "doc_a LONG, doc_b LONG")
    want = {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
    for dedup in (False, True):
        got = {
            r["vertex"]: r["component"]
            for r in connected_components(df, dedup_edges=dedup).collect()
        }
        assert got == want


def test_connected_components_random_graph_vs_union_find(spark):
    # One seeded 500-vertex / ~300-edge graph: many components of mixed
    # shapes (isolated pairs, trees, cycles) in a single CC run — the
    # cheap high-coverage complement to the small hypothesis cases.
    import random

    rng = random.Random(1)
    edges = [
        (rng.randrange(500), rng.randrange(500)) for _ in range(300)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
    got = {
        r["vertex"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)


def test_connected_components_warns_when_iteration_capped(spark, caplog):
    import logging

    ids = list(range(64))
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(63)], "doc_a LONG, doc_b LONG"
    )
    with caplog.at_level(logging.WARNING, logger="dionysus_rb_spark.operators.graph"):
        connected_components(edges, max_iter=1).collect()
    assert any("not converged" in r.message for r in caplog.records)


def test_connected_components_chain_and_islands(spark):
    # component {1..5} as a chain (diameter 4), pair {10,11}, triangle {20,21,22}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a LONG, doc_b LONG",
    )
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_connected_components_interval_independent(spark):
    # Round 14: iterations are chunked checkpoint_interval at a time
    # (one truncation + one chunk-top observation per chunk). Labels
    # must be interval-independent — same fixpoint, chunk-granular
    # detection only changes WHEN it is noticed. Covers a multi-chunk
    # chain, duplicate edges, negatives, and the empty edge set (the
    # n=0 short-circuit).
    import random

    rng = random.Random(3)
    graphs = {
        "chain": [(i, i + 1) for i in range(60)],
        "mixed": [(5, 3), (3, 5), (-2, 7), (7, -2), (1, 2), (2, 3), (100, 50)],
        "random": [
            (rng.randrange(200), rng.randrange(200)) for _ in range(120)
        ],
        "empty": [],
    }
    for name, edges in graphs.items():
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(
            edges or [(0, 0)], "doc_a LONG, doc_b LONG"
        )
        if not edges:
            df = df.where("doc_a != doc_a")
        want = None
        for interval in (1, 2, 4):
            got = {
                r["vertex"]: r["component"]
                for r in connected_components(
                    df, checkpoint_interval=interval
                ).collect()
            }
            if want is None:
                want = got
            assert got == want, (name, interval)
        if edges:
            assert want == _union_find(edges), name
