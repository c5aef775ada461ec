"""Property check: the hierarchical distributed prefix-sum
(textops.pack_offsets) equals the sequential cumulative sum in id
order, for arbitrary sizes, sparse/duplicate-free ids, and shard sizes
that do or don't divide the id range."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from dionysus_rb_spark.operators.textops import pack_offsets


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    sizes=st.lists(st.integers(0, 500), min_size=1, max_size=40),
    id_stride=st.sampled_from([1, 3, 17]),  # sparse ids: shards uneven/empty
    shard_size=st.sampled_from([1, 4, 1000]),
)
def test_pack_offsets_matches_sequential_cumsum(spark, sizes, id_stride, shard_size):
    rows = [(i * id_stride, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id LONG, n LONG").repartition(4)
    got = {
        r["doc_id"]: r["global_offset"]
        for r in pack_offsets(df, "doc_id", "n", shard_size=shard_size).collect()
    }
    expected, acc = {}, 0
    for doc_id, n in rows:
        expected[doc_id] = acc
        acc += n
    assert got == expected


def test_pack_offsets_total_matches_sum(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n")
    )
    out = pack_offsets(df, "doc_id", "n", shard_size=9)
    last = out.orderBy(F.desc("doc_id")).first()
    total = df.agg(F.sum("n")).first()[0]
    assert last["global_offset"] + last["n"] == total
