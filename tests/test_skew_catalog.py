"""Salted aggregation/join equivalence on skewed data + SQL catalog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
)
from k_means_using_mapreduce_spark.sources.catalog import register_tables


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows on one hot key
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("cold"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.union(cold).cache()


def test_salted_aggregate_equals_direct(skewed):
    direct = {
        r["k"]: (r["n"], r["sum_v"])
        for r in skewed.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["sum_v"])
        for r in salted_aggregate(skewed, ["k"], sums=["v"], buckets=16).collect()
    }
    assert salted.keys() == direct.keys()
    for k in direct:
        assert salted[k][0] == direct[k][0]
        assert salted[k][1] == pytest.approx(direct[k][1])


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(50)],
        "k string, label string",
    )
    plain = skewed.join(dim, "k").groupBy("label").count()
    salted = salted_broadcast_left(skewed, dim, "k", buckets=8).groupBy("label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_register_tables_sql(spark, sf_small):
    names = register_tables(spark, sf_small)
    assert "lineitem" in names and len(names) == 10
    out = spark.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag"
    ).collect()
    assert sum(r["n"] for r in out) == spark.table("lineitem").count()
    joined = spark.sql(
        """SELECT r_name, count(*) AS n FROM region
           JOIN nation ON n_regionkey = r_regionkey GROUP BY r_name"""
    )
    assert joined.count() == 5


def test_salted_aggregate_requires_an_aggregate(skewed):
    import pytest

    with pytest.raises(ValueError, match="counts=True or at least one"):
        salted_aggregate(skewed, ["k"], sums=(), counts=False)
