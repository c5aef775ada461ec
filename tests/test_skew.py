"""Salted two-phase aggregation must equal the direct aggregation on a
skewed key distribution (one heavy hitter holding half the rows)."""

from __future__ import annotations

import pyspark.sql.functions as F

from dionysus_rb_spark.operators.skew import salted_collect_list, salted_count_distinct


def _skewed(spark):
    # key 1 carries 500 rows, keys 2..11 carry 10 each
    rows = [(1, i) for i in range(500)] + [
        (k, k * 1000 + i) for k in range(2, 12) for i in range(10)
    ]
    return spark.createDataFrame(rows, "k LONG, v LONG").repartition(8)


def test_salted_collect_list_matches_direct(spark):
    df = _skewed(spark)
    direct = {
        r["k"]: sorted(r["vs"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    salted = {
        r["k"]: list(r["collected"])
        for r in salted_collect_list(df, ["k"], F.col("v"), num_salts=4).collect()
    }
    assert salted == direct


def test_salted_count_distinct_matches_direct(spark):
    df = _skewed(spark).unionAll(_skewed(spark))  # duplicates everywhere
    direct = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {
        r["k"]: r["n_distinct"]
        for r in salted_count_distinct(df, ["k"], F.col("v"), num_salts=4).collect()
    }
    assert salted == direct
