"""Connected-components unit checks: chains that need multiple
propagation rounds, disjoint components, and convergence."""

from __future__ import annotations

from dionysus_rb_spark.operators.graph import connected_components


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
